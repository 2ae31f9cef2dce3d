"""RMHMC statistical moment tests (round-1 VERDICT gap: contract tests only).

Two pillars, matching the reference's HMC statistical suite pattern
(``tests/samplers/test_hmc.py``, moment matching against analytic targets):

1. identity metric ⇒ RMHMC must be distributionally equivalent to plain HMC —
   same target moments on a correlated Gaussian;
2. a curved (position-dependent or preconditioning) metric must leave the
   invariant distribution UNCHANGED while improving mixing on an anisotropic
   target — the whole point of Riemannian HMC.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchebm_tpu.core import GaussianEnergy
from torchebm_tpu.samplers import HamiltonianMonteCarlo, RiemannianManifoldHMC

pytestmark = pytest.mark.slow


def _identity_metric(x):
    d = x.shape[-1]
    return jnp.broadcast_to(jnp.eye(d), (x.shape[0], d, d))


def test_identity_metric_matches_hmc_moments(key):
    """Correlated Gaussian: RMHMC(identity) and HMC agree with the target
    and with each other within Monte-Carlo error."""
    mean = jnp.array([1.0, -2.0])
    cov = jnp.array([[1.0, 0.6], [0.6, 1.0]])
    e = GaussianEnergy.create(mean, cov)
    kw = dict(dim=2, n_samples=1024, n_steps=400)

    rm = RiemannianManifoldHMC(e, metric_fn=_identity_metric, step_size=0.25, n_leapfrog_steps=6)
    hm = HamiltonianMonteCarlo(e, step_size=0.25, n_leapfrog_steps=6)
    s_rm = rm.sample(key, **kw)
    s_hm = hm.sample(jax.random.fold_in(key, 1), **kw)

    for s in (s_rm, s_hm):
        np.testing.assert_allclose(np.asarray(jnp.mean(s, 0)), np.asarray(mean), atol=0.12)
        np.testing.assert_allclose(np.asarray(jnp.cov(s.T)), np.asarray(cov), atol=0.15)
    np.testing.assert_allclose(
        np.asarray(jnp.mean(s_rm, 0)), np.asarray(jnp.mean(s_hm, 0)), atol=0.12
    )


def test_constant_preconditioning_metric_moments():
    """Anisotropic Gaussian (var ratio 100): metric = Σ⁻¹ preconditions the
    dynamics; the chain must still sample exactly N(μ, Σ)."""
    key = jax.random.PRNGKey(7)
    mean = jnp.array([0.5, -0.5])
    cov = jnp.diag(jnp.array([1.0, 0.01]))
    e = GaussianEnergy.create(mean, cov)
    cov_inv = jnp.diag(jnp.array([1.0, 100.0]))

    def metric(x):
        return jnp.broadcast_to(cov_inv, (x.shape[0], 2, 2))

    rm = RiemannianManifoldHMC(e, metric_fn=metric, step_size=0.5, n_leapfrog_steps=6)
    s = rm.sample(key, dim=2, n_samples=1024, n_steps=500)
    np.testing.assert_allclose(np.asarray(jnp.mean(s, 0)), np.asarray(mean), atol=0.08)
    np.testing.assert_allclose(
        np.asarray(jnp.var(s, 0)), np.asarray(jnp.diag(cov)), rtol=0.25
    )


def test_preconditioning_beats_identity_on_anisotropic():
    """With the SAME step size, the Σ⁻¹ metric explores the stiff target far
    better than the identity metric (whose proposals are rejected or barely
    move along the tight coordinate) — RMHMC's raison d'être, quantified."""
    key = jax.random.PRNGKey(3)
    cov = jnp.diag(jnp.array([1.0, 0.0025]))  # 20:1 scale ratio
    e = GaussianEnergy.create(jnp.zeros(2), cov)
    cov_inv = jnp.diag(jnp.array([1.0, 400.0]))

    def precond(x):
        return jnp.broadcast_to(cov_inv, (x.shape[0], 2, 2))

    # start far in the wide coordinate: mixing = how fast x0-variance is found
    x0 = jnp.zeros((256, 2))
    kw = dict(x=x0, n_steps=150)
    step = 0.35  # tuned for the wide coordinate; way too big for the tight one
    s_pre = RiemannianManifoldHMC(
        e, metric_fn=precond, step_size=step, n_leapfrog_steps=5
    ).sample(key, **kw)
    s_id = RiemannianManifoldHMC(
        e, metric_fn=_identity_metric, step_size=step, n_leapfrog_steps=5
    ).sample(key, **kw)

    var_pre = float(jnp.var(s_pre[:, 0]))
    var_id = float(jnp.var(s_id[:, 0]))
    # preconditioned chain reaches the target variance 1.0 in the wide dim
    assert abs(var_pre - 1.0) < 0.35, var_pre
    # identity-metric chain with the same step either under-explores the wide
    # dim or stalls; it must be measurably worse
    assert abs(var_pre - 1.0) < abs(var_id - 1.0), (var_pre, var_id)


def test_position_dependent_metric_preserves_target(key):
    """A genuinely position-dependent metric G(x) = (1 + |x|²)·I: the
    generalized leapfrog + Metropolis correction must keep N(0, I) invariant
    (moments within MC error), not just 'run without NaNs'."""
    e = GaussianEnergy.standard(2)

    def metric(x):
        scale = 1.0 + jnp.sum(x**2, axis=-1, keepdims=True)[..., None]
        return scale * jnp.broadcast_to(jnp.eye(2), (x.shape[0], 2, 2))

    rm = RiemannianManifoldHMC(e, metric_fn=metric, step_size=0.15, n_leapfrog_steps=5)
    s, diag = rm.sample(
        key, dim=2, n_samples=512, n_steps=600, return_diagnostics=True
    )
    assert float(diag["acceptance_rate"][-1]) > 0.5
    np.testing.assert_allclose(np.asarray(jnp.mean(s, 0)), np.zeros(2), atol=0.15)
    np.testing.assert_allclose(np.asarray(jnp.var(s, 0)), np.ones(2), rtol=0.3)

r"""FlowSampler.log_prob tests (build addition — the reference only ships
``prior_logp``).

With the closed-form optimal velocity field for Gaussian endpoints (see
``test_flow_analytic_matrix.py``), the flow's marginal at :math:`t_1` is
exactly :math:`N(\mu, s^2 I)`, so ``log_prob`` must reproduce its closed-form
log-density. A trapezoid quadrature over a 2D grid also pins normalization.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchebm_tpu.interpolants import get_interpolant
from torchebm_tpu.samplers import FlowSampler

MU = jnp.array([1.5, -0.5])
S = 0.7


def optimal_velocity(interpolant_name):
    interp = get_interpolant(interpolant_name)

    def field(x, t):
        a, da = interp.compute_alpha_t(t)
        sg, dsg = interp.compute_sigma_t(t)
        a, da, sg, dsg = [jnp.reshape(v, (-1, 1)) for v in (a, da, sg, dsg)]
        v = a * a * S * S + sg * sg
        xc = x - a * MU
        return da * (MU + (a * S * S / v) * xc) + dsg * (sg / v) * xc

    return field


def target_logp(x):
    return -jnp.log(2 * jnp.pi * S * S) - jnp.sum((x - MU) ** 2, -1) / (2 * S * S)


@pytest.mark.parametrize("interpolant", ["linear", "cosine", "vp"])
def test_exact_divergence_matches_closed_form(interpolant, key):
    fs = FlowSampler(model=optimal_velocity(interpolant), interpolant=interpolant,
                     integrator="rk4")
    x = MU + S * jax.random.normal(key, (128, 2))
    lp = fs.log_prob(x, n_steps=100)
    # VP has alpha(0) ~ 6.6e-3 != 0: its time-0 marginal is not exactly N(0, I),
    # so the flow's density differs from the target by O(alpha(0)) — an
    # interpolant property (generation pays the same prior mismatch), not a
    # log_prob discretization error (the residual is n_steps-independent).
    atol = 5e-2 if interpolant == "vp" else 2e-3
    np.testing.assert_allclose(np.asarray(lp), np.asarray(target_logp(x)), atol=atol)


def test_hutchinson_matches_exact_on_nonlinear_field(key):
    base = optimal_velocity("linear")

    def field(x, t):  # nonlinear perturbation: Hutchinson is now stochastic
        return base(x, t) + 0.1 * jnp.tanh(x)

    fs = FlowSampler(model=field, integrator="rk4")
    x = jax.random.normal(key, (64, 2))
    lp_exact = fs.log_prob(x, n_steps=50)
    lp_h = fs.log_prob(x, key=key, hutchinson=True, n_probes=64, n_steps=50)
    assert float(jnp.mean(jnp.abs(lp_exact - lp_h))) < 0.05


@pytest.mark.slow
def test_density_normalizes(key):
    """Trapezoid quadrature of exp(log_prob) over a wide 2D grid ≈ 1."""
    fs = FlowSampler(model=optimal_velocity("linear"), integrator="rk4")
    n, half = 61, 3.5  # grid covers ±5 sigma around the mean
    gx = jnp.linspace(MU[0] - half, MU[0] + half, n)
    gy = jnp.linspace(MU[1] - half, MU[1] + half, n)
    pts = jnp.stack(jnp.meshgrid(gx, gy, indexing="ij"), -1).reshape(-1, 2)
    lp = fs.log_prob(pts, n_steps=50)
    cell = float((gx[1] - gx[0]) * (gy[1] - gy[0]))
    mass = float(jnp.sum(jnp.exp(lp)) * cell)
    assert abs(mass - 1.0) < 0.02, mass


def test_event_shape_support(key):
    """Non-flat event shapes work through both divergence paths."""

    def field(x, t):  # contraction toward 0: div = -d exactly
        return -x

    fs = FlowSampler(model=field, integrator="rk4")
    x = jax.random.normal(key, (8, 1, 2, 2))
    lp_exact = fs.log_prob(x, n_steps=20, hutchinson=False)
    lp_h = fs.log_prob(x, key=key, n_steps=20, hutchinson=True, n_probes=4)
    assert lp_exact.shape == (8,)
    # linear field: Rademacher Hutchinson is exact
    np.testing.assert_allclose(np.asarray(lp_exact), np.asarray(lp_h), atol=1e-4)


def test_validation():
    fs_sde = FlowSampler(model=lambda x, t: x, mode="sde", integrator="euler")
    with pytest.raises(ValueError, match="ode"):
        fs_sde.log_prob(jnp.zeros((2, 2)))
    fs_rev = FlowSampler(model=lambda x, t: x, reverse=True, integrator="rk4")
    with pytest.raises(ValueError, match="reverse"):
        fs_rev.log_prob(jnp.zeros((2, 2)))
    fs = FlowSampler(model=lambda x, t: x, integrator="rk4")
    with pytest.raises(ValueError, match="key"):
        fs.log_prob(jnp.zeros((2, 16)))  # d>8 defaults to hutchinson, needs key


def test_reproducible_and_jittable(key):
    fs = FlowSampler(model=optimal_velocity("linear"), integrator="rk4")
    x = jax.random.normal(key, (4, 2))
    a = fs.log_prob(x, key=key, hutchinson=True)
    b = fs.log_prob(x, key=key, hutchinson=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = jax.jit(lambda xx: fs.log_prob(xx, n_steps=20))(x)
    assert c.shape == (4,)

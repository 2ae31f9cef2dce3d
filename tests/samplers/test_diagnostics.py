"""R̂ / ESS diagnostics tests (build addition, BASELINE.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchebm_tpu.samplers import (
    effective_sample_size,
    potential_scale_reduction,
    summarize_chains,
)


def _ar1_chains(key, n_chains, n, rho, dim=2):
    noise = jax.random.normal(key, (n_chains, n, dim))
    scale = jnp.sqrt(1 - rho**2)

    def body(x, eps):
        x = rho * x + scale * eps
        return x, x

    _, traj = jax.lax.scan(body, noise[:, 0], jnp.moveaxis(noise, 1, 0))
    return jnp.moveaxis(traj, 0, 1)


def test_rhat_iid_near_one(key):
    traj = jax.random.normal(key, (8, 400, 3))
    r = potential_scale_reduction(traj)
    assert bool(jnp.all(r < 1.02))


def test_rhat_detects_divergence(key):
    traj = jax.random.normal(key, (8, 400, 2))
    traj = traj.at[0].add(5.0)
    r = potential_scale_reduction(traj)
    assert bool(jnp.all(r > 1.3))


def test_rhat_split_detects_trend(key):
    # all chains share the same trend: unsplit B is ~0 but split catches it
    trend = jnp.linspace(0.0, 5.0, 400)[None, :, None]
    traj = jax.random.normal(key, (4, 400, 1)) * 0.1 + trend
    r_split = potential_scale_reduction(traj, split=True)
    assert float(r_split[0]) > 1.5


def test_ess_iid_near_total(key):
    traj = jax.random.normal(key, (8, 500, 2))
    ess = effective_sample_size(traj)
    total = 8 * 500
    assert bool(jnp.all(ess > 0.8 * total)) and bool(jnp.all(ess < 1.25 * total))


@pytest.mark.parametrize("rho", [0.5, 0.9])
def test_ess_ar1_scaling(key, rho):
    traj = _ar1_chains(key, 8, 1000, rho)
    ess = effective_sample_size(traj)
    expected = 8 * 1000 * (1 - rho) / (1 + rho)
    ratio = ess / expected
    assert bool(jnp.all(ratio > 0.5)) and bool(jnp.all(ratio < 1.6)), (ess, expected)


def test_ess_2d_input(key):
    traj = jax.random.normal(key, (4, 200))
    assert effective_sample_size(traj).shape == (1,)
    assert potential_scale_reduction(traj).shape == (1,)


def test_summarize_chains(key):
    traj = jax.random.normal(key, (4, 300, 2)) + jnp.array([1.0, -1.0])
    s = summarize_chains(traj)
    np.testing.assert_allclose(s["mean"], jnp.array([1.0, -1.0]), atol=0.15)
    assert s["n_chains"] == 4 and s["n_draws"] == 300
    assert s["r_hat"].shape == (2,) and s["ess"].shape == (2,)


def test_diagnostics_jittable(key):
    traj = jax.random.normal(key, (4, 200, 2))
    f = jax.jit(lambda t: (potential_scale_reduction(t), effective_sample_size(t)))
    r, e = f(traj)
    np.testing.assert_allclose(r, potential_scale_reduction(traj), rtol=1e-5)
    np.testing.assert_allclose(e, effective_sample_size(traj), rtol=1e-5)


def test_end_to_end_sampler_ess(key):
    """Langevin on a standard normal: ESS/R̂ computed from an actual trajectory."""
    from torchebm_tpu.core import GaussianEnergy
    from torchebm_tpu.samplers import LangevinDynamics

    sampler = LangevinDynamics(GaussianEnergy.standard(2), step_size=0.1)
    traj = sampler.sample(key, dim=2, n_samples=8, n_steps=500, return_trajectory=True)
    stats = summarize_chains(traj[:, 100:])  # drop burn-in
    assert bool(jnp.all(stats["r_hat"] < 1.1))
    assert bool(jnp.all(stats["ess"] > 50))

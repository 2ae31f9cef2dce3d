"""NUTS→HMC handoff (``tune_trajectory_length``) — VERDICT r3 #3.

The recipe "use NUTS to find the trajectory length, then switch to HMC at
``n_leapfrog ≈ 2^mean_tree_depth``" must exist as API, produce a sensible
trajectory length on a known-geometry target, and hand back an HMC
configuration that actually explores it.
"""

import jax
import jax.numpy as jnp
import pytest

from torchebm_tpu.core import GaussianEnergy
from torchebm_tpu.samplers import (
    HamiltonianMonteCarlo,
    TrajectoryTuning,
    summarize_chains,
    tune_trajectory_length,
)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def corr_gaussian():
    cov = jnp.array([[1.0, 0.8], [0.8, 1.0]])
    return GaussianEnergy.create(mean=jnp.zeros(2), cov=cov)


def test_returns_sensible_tuning(key, corr_gaussian):
    t = tune_trajectory_length(
        key, corr_gaussian, dim=2, n_samples=64, n_warmup=150, n_pilot=60,
        max_tree_depth=6,
    )
    assert isinstance(t, TrajectoryTuning)
    assert 2 <= t.n_leapfrog <= 2**6
    assert float(t.step_size) > 0
    assert t.x.shape == (64, 2)
    assert 0.0 <= t.mean_tree_depth <= 6.0
    assert t.mass is None
    # consistency: L is the rounded power of the measured depth
    assert t.n_leapfrog == max(2, int(round(2.0**t.mean_tree_depth)))


def test_handoff_hmc_explores_target(key, corr_gaussian):
    t = tune_trajectory_length(
        key, corr_gaussian, dim=2, n_samples=64, n_warmup=150, n_pilot=60,
        max_tree_depth=6,
    )
    hmc = HamiltonianMonteCarlo(
        corr_gaussian, step_size=t.step_size, n_leapfrog_steps=t.n_leapfrog
    )
    traj, diag = hmc.sample(
        jax.random.fold_in(key, 1), x=t.x, n_steps=300,
        return_trajectory=True, return_diagnostics=True,
    )
    # warmup landed the step size near the target acceptance rate
    assert 0.5 < float(diag["acceptance_rate"][-1]) <= 1.0
    # the tuned sampler decorrelates: min-ESS well above the failure floor
    ess = summarize_chains(traj)["ess"]
    assert float(jnp.min(ess)) > 64 * 0.5
    # and the sampled moments match the target
    flat = traj.reshape(-1, 2)
    cov = jnp.cov(flat.T)
    assert abs(float(cov[0, 1]) - 0.8) < 0.15


def test_adapt_mass_returns_diagonal_mass(key, corr_gaussian):
    t = tune_trajectory_length(
        key, corr_gaussian, dim=2, n_samples=64, n_warmup=150, n_pilot=40,
        max_tree_depth=5, adapt_mass=True,
    )
    assert t.mass is not None and t.mass.shape == (2,)
    assert bool(jnp.all(t.mass > 0))
    # mass must be usable directly in the handoff sampler
    hmc = HamiltonianMonteCarlo(
        corr_gaussian, step_size=t.step_size, n_leapfrog_steps=t.n_leapfrog,
        mass=t.mass,
    )
    out = hmc.sample(jax.random.fold_in(key, 2), x=t.x, n_steps=20)
    assert out.shape == (64, 2) and bool(jnp.all(jnp.isfinite(out)))

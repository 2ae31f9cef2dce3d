"""R̂ / ESS diagnostics tests (build addition, BASELINE.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchebm_tpu.samplers import (
    effective_sample_size,
    potential_scale_reduction,
    summarize_chains,
    tail_effective_sample_size,
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


# ---------------------------------------------------------------------------
# rank-normalized statistics (Vehtari et al. 2021) — VERDICT r1 item 8
# ---------------------------------------------------------------------------


def test_rank_rhat_iid_near_one(key):
    traj = jax.random.normal(key, (8, 400, 3))
    r = potential_scale_reduction(traj, rank_normalized=True)
    assert bool(jnp.all(r < 1.02))


def test_rank_rhat_detects_divergence(key):
    traj = jax.random.normal(key, (8, 400, 2))
    traj = traj.at[0].add(5.0)
    r = potential_scale_reduction(traj, rank_normalized=True)
    # rank normalization bounds one deviant chain's leverage, so the statistic
    # is smaller than the raw ~1.9 — but still far beyond the 1.01 threshold
    assert bool(jnp.all(r > 1.15))


def test_folded_rhat_catches_scale_mismatch(key):
    """Chains agree in mean but one has 5x the spread: the mean-based R̂ barely
    moves, the folded rank-R̂ must flag it (the paper's motivating case)."""
    traj = jax.random.normal(key, (8, 500, 1))
    traj = traj.at[0].multiply(5.0)
    r_plain = potential_scale_reduction(traj)
    r_rank = potential_scale_reduction(traj, rank_normalized=True)
    assert float(r_plain[0]) < 1.05  # location-based statistic is blind to this
    assert float(r_rank[0]) > 1.08, float(r_rank[0])


def test_rank_rhat_robust_to_heavy_tails(key):
    """Cauchy-marginal chains: raw R̂ is erratic (infinite variance), the
    rank-normalized statistic stays calibrated near 1 for stationary chains."""
    z = jax.random.normal(key, (8, 500, 1))
    cauchy = jnp.tan(jnp.pi * (jax.lax.erf(z / jnp.sqrt(2.0)) / 2.0))
    r_rank = potential_scale_reduction(cauchy, rank_normalized=True)
    assert bool(jnp.all(r_rank < 1.05)), r_rank


def test_bulk_ess_matches_raw_on_gaussian_ar1(key):
    """Rank normalization is monotone, so for Gaussian AR(1) the bulk-ESS
    should land near the raw Geyer estimate and the analytic value."""
    rho = 0.9
    traj = _ar1_chains(key, 8, 1000, rho)
    bulk = effective_sample_size(traj, rank_normalized=True)
    expected = 8 * 1000 * (1 - rho) / (1 + rho)
    ratio = bulk / expected
    assert bool(jnp.all(ratio > 0.5)) and bool(jnp.all(ratio < 1.6)), (bulk, expected)


def test_bulk_ess_stable_under_heavy_tails(key):
    """Push AR(1) Gaussians through a Cauchy transform: the underlying mixing
    is unchanged, and bulk-ESS (rank-based) must stay close to the Gaussian
    value rather than blow up/collapse with the infinite-variance values."""
    rho = 0.5
    g = _ar1_chains(key, 8, 1000, rho, dim=1)
    u = jax.lax.erf(g / jnp.sqrt(2.0)) / 2.0  # (-0.5, 0.5)
    cauchy = jnp.tan(jnp.pi * u)
    bulk_g = effective_sample_size(g, rank_normalized=True)
    bulk_c = effective_sample_size(cauchy, rank_normalized=True)
    ratio = bulk_c / bulk_g
    assert bool(jnp.all(ratio > 0.7)) and bool(jnp.all(ratio < 1.4)), ratio


def test_tail_ess_iid(key):
    """For iid draws tail-ESS is the same order as the draw count."""
    traj = jax.random.normal(key, (8, 500, 2))
    tail = tail_effective_sample_size(traj)
    total = 8 * 500
    assert bool(jnp.all(tail > 0.3 * total)) and bool(jnp.all(tail < 1.5 * total))


def test_tail_ess_detects_sticky_tails(key):
    """Chains that mix fast in the bulk but whose upper-tail excursions are a
    long-lived rare regime: tail-ESS must come out far below bulk-ESS."""
    k1, k2 = jax.random.split(key)
    # rare (~5%), sticky regime from a thresholded slow AR(1)
    regime = (_ar1_chains(k2, 8, 800, 0.99, dim=1) > 1.65).astype(jnp.float32)
    traj = jax.random.normal(k1, (8, 800, 1)) + 6.0 * regime
    bulk = effective_sample_size(traj, rank_normalized=True)
    tail = tail_effective_sample_size(traj)
    assert bool(jnp.all(tail < 0.6 * bulk)), (tail, bulk)


def test_summarize_chains_rank_normalized(key):
    traj = jax.random.normal(key, (4, 300, 2))
    s = summarize_chains(traj, rank_normalized=True)
    for k in ("r_hat_rank", "ess_bulk", "ess_tail"):
        assert k in s and s[k].shape == (2,)


def test_rank_diagnostics_jittable(key):
    traj = jax.random.normal(key, (4, 200, 2))
    f = jax.jit(
        lambda t: (
            potential_scale_reduction(t, rank_normalized=True),
            effective_sample_size(t, rank_normalized=True),
            tail_effective_sample_size(t),
        )
    )
    r, e, t_ = f(traj)
    np.testing.assert_allclose(
        r, potential_scale_reduction(traj, rank_normalized=True), rtol=1e-5
    )
    np.testing.assert_allclose(
        e, effective_sample_size(traj, rank_normalized=True), rtol=1e-4
    )
    np.testing.assert_allclose(t_, tail_effective_sample_size(traj), rtol=1e-4)


def test_end_to_end_sampler_ess(key):
    """Langevin on a standard normal: ESS/R̂ computed from an actual trajectory."""
    from torchebm_tpu.core import GaussianEnergy
    from torchebm_tpu.samplers import LangevinDynamics

    sampler = LangevinDynamics(GaussianEnergy.standard(2), step_size=0.1)
    traj = sampler.sample(key, dim=2, n_samples=8, n_steps=500, return_trajectory=True)
    stats = summarize_chains(traj[:, 100:])  # drop burn-in
    assert bool(jnp.all(stats["r_hat"] < 1.1))
    assert bool(jnp.all(stats["ess"] > 50))

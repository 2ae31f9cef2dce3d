"""NUTS tests (build addition — no reference analogue).

Statistical pattern follows the HMC suite; NUTS-specific behavior is pinned
via tree-depth responses to the step size and divergence handling.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchebm_tpu.core import DoubleWellEnergy, GaussianEnergy
from torchebm_tpu.samplers import NoUTurnSampler, summarize_chains


@pytest.mark.slow
def test_correlated_gaussian_moments(key):
    cov = jnp.array([[1.0, 0.8], [0.8, 1.0]])
    nuts = NoUTurnSampler(GaussianEnergy.create(jnp.array([1.0, -1.0]), cov), step_size=0.3)
    out = nuts.sample(key, dim=2, n_samples=800, n_steps=400)
    np.testing.assert_allclose(jnp.mean(out, 0), jnp.array([1.0, -1.0]), atol=0.1)
    np.testing.assert_allclose(jnp.cov(out.T), cov, atol=0.15)


def test_tree_depth_adapts_to_step_size(key):
    """Smaller steps need more doublings to reach the U-turn."""
    e = GaussianEnergy.standard(2)
    depths = []
    for eps in (1.0, 0.1):
        _, diag = NoUTurnSampler(e, step_size=eps).sample(
            key, dim=2, n_samples=64, n_steps=50, return_diagnostics=True
        )
        depths.append(float(jnp.mean(diag["tree_depth"])))
    assert depths[1] > depths[0] + 1.0, depths


def test_warmup_then_sample(key):
    cov = jnp.diag(jnp.array([1.0, 9.0]))
    nuts = NoUTurnSampler(GaussianEnergy.create(jnp.zeros(2), cov), step_size=0.5)
    x, eps = nuts.warmup(key, dim=2, n_warmup=200, n_samples=128)
    assert 0.05 < eps < 5.0
    tuned = nuts.replace(step_size=eps)
    out, diag = tuned.sample(
        jax.random.fold_in(key, 1), x=x, n_steps=300, return_diagnostics=True
    )
    acc = float(jnp.mean(diag["acceptance_rate"]))
    assert 0.6 < acc <= 1.0, acc
    np.testing.assert_allclose(jnp.var(out, 0), jnp.array([1.0, 9.0]), rtol=0.25)


def test_warmup_targets_acceptance(key):
    """Dual averaging must land the post-warmup acceptance NEAR the target,
    not merely above a floor — and different targets must steer it."""
    e = GaussianEnergy.create(jnp.zeros(2), jnp.array([[1.0, 0.5], [0.5, 1.0]]))
    accs = {}
    for target in (0.6, 0.9):
        nuts = NoUTurnSampler(e, step_size=0.4, target_accept=target)
        x, eps = nuts.warmup(key, dim=2, n_warmup=400, n_samples=256)
        _, diag = nuts.replace(step_size=eps).sample(
            jax.random.fold_in(key, hash(target) % 1000),
            x=x, n_steps=300, return_diagnostics=True,
        )
        accs[target] = float(jnp.mean(diag["acceptance_rate"]))
    # calibrated to the target within MC + NUTS-multinomial slack
    assert abs(accs[0.9] - 0.9) < 0.09, accs
    assert accs[0.6] - 0.6 > -0.12, accs
    # steering: higher target => higher achieved acceptance
    assert accs[0.9] > accs[0.6], accs


def test_double_well_both_modes(key):
    nuts = NoUTurnSampler(DoubleWellEnergy(barrier_height=1.0), step_size=0.4)
    out = nuts.sample(key, dim=1, n_samples=512, n_steps=200)
    frac_right = float(jnp.mean(out > 0))
    assert 0.3 < frac_right < 0.7


def test_mixing_beats_fixed_length_hmc_on_anisotropic(key):
    """Dynamic trajectory lengths explore the wide dimension without tuning."""
    from torchebm_tpu.samplers import HamiltonianMonteCarlo

    cov = jnp.diag(jnp.array([1.0, 100.0]))
    e = GaussianEnergy.create(jnp.zeros(2), cov)
    k1, k2 = jax.random.split(key)
    traj_nuts = NoUTurnSampler(e, step_size=0.8).sample(
        k1, dim=2, n_samples=64, n_steps=200, return_trajectory=True
    )
    traj_hmc = HamiltonianMonteCarlo(e, step_size=0.8, n_leapfrog_steps=2).sample(
        k2, dim=2, n_samples=64, n_steps=200, return_trajectory=True
    )
    ess_nuts = float(jnp.min(summarize_chains(traj_nuts)["ess"]))
    ess_hmc = float(jnp.min(summarize_chains(traj_hmc)["ess"]))
    assert ess_nuts > 2.0 * ess_hmc, (ess_nuts, ess_hmc)


def test_diagonal_mass(key):
    cov = jnp.diag(jnp.array([1.0, 25.0]))
    nuts = NoUTurnSampler(
        GaussianEnergy.create(jnp.zeros(2), cov),
        step_size=0.5,
        mass=jnp.array([1.0, 0.04]),
    )
    out = nuts.sample(key, dim=2, n_samples=256, n_steps=300)
    np.testing.assert_allclose(jnp.var(out, 0), jnp.array([1.0, 25.0]), rtol=0.3)


def test_huge_step_size_stays_finite(key):
    """Divergent trajectories are rejected, not propagated."""
    nuts = NoUTurnSampler(GaussianEnergy.standard(2), step_size=50.0)
    out = nuts.sample(key, dim=2, n_samples=32, n_steps=20)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_reproducible(key):
    nuts = NoUTurnSampler(GaussianEnergy.standard(2), step_size=0.5)
    a = nuts.sample(key, dim=2, n_samples=16, n_steps=30)
    b = nuts.sample(key, dim=2, n_samples=16, n_steps=30)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_validation():
    with pytest.raises(ValueError, match="max_tree_depth"):
        NoUTurnSampler(GaussianEnergy.standard(2), max_tree_depth=0)


def test_contract_shapes(key):
    nuts = NoUTurnSampler(GaussianEnergy.standard(2), step_size=0.5)
    traj, diag = nuts.sample(
        key, dim=2, n_samples=4, n_steps=9, thin=3,
        return_trajectory=True, return_diagnostics=True,
    )
    assert traj.shape == (4, 3, 2)
    assert set(diag) == {
        "mean", "var", "energy", "acceptance_rate", "tree_depth", "divergence_rate"
    }
    assert diag["tree_depth"].shape == (3,)


def test_divergence_rate_surfaced(key):
    """A pathologically large step size must report divergences; a sane one
    must report (near) zero."""
    e = GaussianEnergy.standard(2)
    _, diag_bad = NoUTurnSampler(e, step_size=50.0).sample(
        key, dim=2, n_samples=64, n_steps=20, return_diagnostics=True
    )
    _, diag_ok = NoUTurnSampler(e, step_size=0.3).sample(
        key, dim=2, n_samples=64, n_steps=20, return_diagnostics=True
    )
    assert float(jnp.mean(diag_bad["divergence_rate"])) > 0.5
    assert float(jnp.mean(diag_ok["divergence_rate"])) < 0.05


def test_warmup_adapt_mass(key):
    """Mass adaptation on an anisotropic Gaussian recovers ~1/var per dim."""
    cov = jnp.diag(jnp.array([1.0, 25.0]))
    nuts = NoUTurnSampler(GaussianEnergy.create(jnp.zeros(2), cov), step_size=0.5)
    x, eps, mass = nuts.warmup(
        key, dim=2, n_warmup=300, n_samples=128, adapt_mass=True
    )
    assert mass.shape == (2,)
    # mass ~ 1/variance: dim 0 near 1, dim 1 near 1/25
    assert 0.4 < float(mass[0]) < 2.5
    assert 0.015 < float(mass[1]) < 0.12
    tuned = nuts.replace(step_size=eps, mass=mass)
    out = tuned.sample(jax.random.fold_in(key, 1), x=x, n_steps=200)
    np.testing.assert_allclose(jnp.var(out, 0), jnp.array([1.0, 25.0]), rtol=0.3)


def test_trailing_ones_closed_form():
    """The popcount-based bit counter matches the Python reference for every
    value the tree builder can produce (leaf indices and their complements,
    including negatives from ``bitwise_not``)."""
    from torchebm_tpu.samplers.nuts import _trailing_ones

    def ref(n):
        c = 0
        while n & 1:
            n >>= 1
            c += 1
        return c

    vals = list(range(0, 4097)) + [~v for v in range(2, 4097)]
    got = np.asarray(jax.vmap(_trailing_ones)(jnp.asarray(vals, jnp.int32)))
    want = np.asarray([ref(v & 0xFFFFFFFF) if v >= 0 else ref(v + (1 << 32)) for v in vals])
    np.testing.assert_array_equal(got, want)


def test_shared_kwargs_pins_coincident_leading_dim(key):
    """A batch-shared (n_proj, d) conditioning matrix whose leading dim equals
    n_chains must NOT be sliced per chain when named in ``shared_kwargs``
    (advisor r4: the leading-dim heuristic is ambiguous for such leaves)."""
    from torchebm_tpu.core.energies import WrappedEnergy

    n_chains, d = 4, 2
    A = jnp.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0], [1.0, -1.0]])  # (4, 2)

    def cond_energy(x, A):
        return 0.5 * jnp.sum((x @ A.T) ** 2, axis=-1)

    shared = NoUTurnSampler(
        WrappedEnergy(fn=cond_energy), step_size=0.2, shared_kwargs=("A",)
    )
    closed = NoUTurnSampler(
        WrappedEnergy(fn=lambda x: cond_energy(x, A)), step_size=0.2
    )
    out_shared = shared.sample(
        key, dim=d, n_samples=n_chains, n_steps=20, model_kwargs={"A": A}
    )
    out_closed = closed.sample(key, dim=d, n_samples=n_chains, n_steps=20)
    np.testing.assert_array_equal(out_shared, out_closed)

    # the unpinned heuristic slices A per chain -> silently different chains
    unpinned = NoUTurnSampler(WrappedEnergy(fn=cond_energy), step_size=0.2)
    out_heur = unpinned.sample(
        key, dim=d, n_samples=n_chains, n_steps=20, model_kwargs={"A": A}
    )
    assert not np.allclose(np.asarray(out_heur), np.asarray(out_closed))


def test_shared_kwargs_unknown_name_raises(key):
    from torchebm_tpu.core.energies import WrappedEnergy

    nuts = NoUTurnSampler(
        WrappedEnergy(fn=lambda x, z: jnp.sum(x * x, -1) + jnp.sum(z)),
        step_size=0.2,
        shared_kwargs=("typo",),
    )
    with pytest.raises(ValueError, match="shared_kwargs"):
        nuts.sample(
            key, dim=2, n_samples=4, n_steps=2, model_kwargs={"z": jnp.ones(3)}
        )

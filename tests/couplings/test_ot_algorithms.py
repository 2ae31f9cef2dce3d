"""Algorithmic depth tests for the OT solvers themselves.

Mirrors the reference's numerics-first test style (``tests/couplings`` in
``torchebm``): solver-level invariants — Sinkhorn marginal fixed points and
the reg→0 limit, unbalanced→balanced limit, greedy vs a sequential host-side
re-simulation of the reference's sorted-scan semantics
(``torchebm/couplings/ot.py:182-217``), and an auction optimality sweep over
sizes and seeds (``torchebm/couplings/ot.py:91-179``).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchebm_tpu.couplings import (
    ExactOTCoupling,
    GreedyCoupling,
    SinkhornCoupling,
    UnbalancedSinkhornCoupling,
    auction_assignment,
    greedy_assignment,
)
from torchebm_tpu.couplings.ot import sinkhorn_log, unbalanced_sinkhorn_log


def _random_cost(key, n, m=None, scale=1.0):
    m = n if m is None else m
    x0 = jax.random.normal(key, (n, 4))
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (m, 4)) * scale
    C = jnp.sum((x0[:, None] - x1[None]) ** 2, -1)
    return C / jnp.max(C)


# ---------------------------------------------------------------- sinkhorn


def test_sinkhorn_plan_marginals_are_uniform(key):
    """Converged log-plan has row/col marginals 1/n, 1/m (the fixed point)."""
    C = _random_cost(key, 24, 40)
    log_plan = sinkhorn_log(C, reg=0.1, n_iters=500)
    plan = np.asarray(jnp.exp(log_plan))
    np.testing.assert_allclose(plan.sum(axis=1), 1.0 / 24, rtol=1e-4)
    # after a row update then col update the col marginal is exact
    np.testing.assert_allclose(plan.sum(axis=0), 1.0 / 40, rtol=1e-4)
    assert (plan >= 0).all()


def test_sinkhorn_cost_approaches_exact_ot_as_reg_shrinks(key):
    """⟨plan, C⟩ decreases with reg and approaches the Hungarian optimum."""
    import scipy.optimize as so

    n = 32
    C = _random_cost(key, n)
    Cn = np.asarray(C)
    ri, ci = so.linear_sum_assignment(Cn)
    opt = Cn[ri, ci].sum() / n  # optimal cost under uniform 1/n masses

    costs = []
    for reg in (0.5, 0.1, 0.02, 0.005):
        plan = np.asarray(jnp.exp(sinkhorn_log(C, reg=reg, n_iters=2000)))
        costs.append(float((plan * Cn).sum()))
    assert costs == sorted(costs, reverse=True), costs  # monotone in reg
    assert costs[-1] <= opt * 1.05 + 1e-6
    assert costs[-1] >= opt - 1e-6  # never beats the exact optimum


def test_sinkhorn_entropy_increases_with_reg(key):
    C = _random_cost(key, 24)
    ents = []
    for reg in (0.01, 0.1, 1.0):
        plan = np.asarray(jnp.exp(sinkhorn_log(C, reg=reg, n_iters=1000)))
        p = plan.ravel()
        ents.append(float(-(p * np.log(np.maximum(p, 1e-30))).sum()))
    assert ents == sorted(ents), ents


# ------------------------------------------------------------- unbalanced


def test_unbalanced_approaches_balanced_as_rho_grows(key):
    """reg_marginal → ∞ recovers the balanced plan (phi → 1)."""
    C = _random_cost(key, 20)
    bal = np.asarray(sinkhorn_log(C, reg=0.1, n_iters=800))
    unb = np.asarray(unbalanced_sinkhorn_log(C, reg=0.1, reg_marginal=1e5, n_iters=800))
    np.testing.assert_allclose(np.exp(unb), np.exp(bal), atol=2e-5)


def test_unbalanced_sheds_mass_on_outliers(key):
    """An x1 outlier row receives less mass than inliers at small rho."""
    x0 = jax.random.normal(key, (16, 2))
    x1 = jnp.concatenate([x0[:15] + 0.05, jnp.full((1, 2), 40.0)])
    C = jnp.sum((x0[:, None] - x1[None]) ** 2, -1)
    C = C / jnp.max(C)
    plan = np.asarray(
        jnp.exp(unbalanced_sinkhorn_log(C, reg=0.05, reg_marginal=0.1, n_iters=500))
    )
    col_mass = plan.sum(axis=0)
    assert col_mass[-1] < 0.2 * col_mass[:-1].mean()


def test_unbalanced_coupling_weights_mean_one(key):
    x0 = jax.random.normal(key, (24, 2))
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (24, 2)) + 2.0
    res = UnbalancedSinkhornCoupling(reg=0.05, reg_marginal=0.5)(
        x0, x1, key=jax.random.fold_in(key, 2)
    )
    w = np.asarray(res.weights)
    assert w.shape == (24,)
    # normalized to mean 1 so they slot into a weighted-mean reduction
    np.testing.assert_allclose(w.mean(), 1.0, rtol=1e-5)
    assert (w >= 0).all()


# ---------------------------------------------------------------- greedy


def _greedy_sequential(Cn: np.ndarray) -> np.ndarray:
    """Host-side re-simulation of the reference's sorted-scan greedy
    (``torchebm/couplings/ot.py:182-217``): repeatedly take the globally
    cheapest pair among free rows x free cols."""
    n = Cn.shape[0]
    C = Cn.copy()
    perm = np.full(n, -1, np.int64)
    for _ in range(n):
        i, j = np.unravel_index(np.argmin(C), C.shape)
        perm[i] = j
        C[i, :] = np.inf
        C[:, j] = np.inf
    return perm


@pytest.mark.parametrize("n", [5, 17, 64])
def test_greedy_matches_sequential_reference(key, n):
    """The dominant-pair parallel greedy reproduces sequential nearest-free-
    pair exactly when costs are distinct."""
    C = np.asarray(_random_cost(jax.random.fold_in(key, n), n), np.float64)
    # make ties measure-zero explicit
    assert len(np.unique(C)) == C.size
    ours = np.asarray(greedy_assignment(jnp.asarray(C, jnp.float32)))
    ref = _greedy_sequential(C)
    np.testing.assert_array_equal(ours, ref)


def test_greedy_beats_identity_on_shuffled_clusters(key):
    """Shuffled near-copies: greedy must recover the near-identity matching."""
    n = 40
    x1 = jax.random.normal(key, (n, 3)) * 3
    shuffle = jax.random.permutation(jax.random.fold_in(key, 1), n)
    x0 = x1[shuffle] + 0.01 * jax.random.normal(jax.random.fold_in(key, 2), (n, 3))
    res = GreedyCoupling()(x0, x1)
    # each x0 row should be matched back to its own near-copy
    assert float(jnp.mean(jnp.sum((res.x0 - res.x1) ** 2, -1))) < 0.01


# ---------------------------------------------------------------- auction


@pytest.mark.parametrize("n,seed", [(8, 0), (33, 1), (64, 2), (96, 3)])
def test_auction_optimality_sweep(n, seed):
    """Auction assignment within its epsilon-scaling tolerance of Hungarian
    across sizes/seeds (reference claims near-exact, ``ot.py:220-253``)."""
    import scipy.optimize as so

    C = np.asarray(_random_cost(jax.random.key(seed), n), np.float64)
    ri, ci = so.linear_sum_assignment(C)
    opt = C[ri, ci].sum()
    perm = np.asarray(auction_assignment(jnp.asarray(C, jnp.float32), tol=1e-4))
    assert sorted(perm.tolist()) == list(range(n))
    ours = C[np.arange(n), perm].sum()
    # eps-scaling guarantee: within n*eps_final = tol of optimal benefit
    assert ours <= opt + 1e-3 + 1e-6 * n


def test_auction_recovers_identity_on_diagonal_cost():
    n = 16
    C = 1.0 - np.eye(n)
    perm = np.asarray(auction_assignment(jnp.asarray(C, jnp.float32)))
    np.testing.assert_array_equal(perm, np.arange(n))


# ----------------------------------------------------- cost-template rules


def test_cost_matrix_is_max_normalized_squared_euclidean(key):
    x0 = jax.random.normal(key, (12, 5)) * 7
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (12, 5)) * 3
    C = ExactOTCoupling().compute_cost(x0, x1)
    raw = np.asarray(jnp.sum((x0[:, None] - x1[None]) ** 2, -1))
    np.testing.assert_allclose(np.asarray(C), raw / raw.max(), rtol=1e-5)
    assert float(jnp.max(C)) == pytest.approx(1.0, rel=1e-6)


def test_cost_couplings_flatten_structured_samples(key):
    """Image-shaped batches couple on flattened features (ref base_coupling
    cost on flattened samples)."""
    x0 = jax.random.normal(key, (10, 4, 4, 1))
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (10, 4, 4, 1))
    res = GreedyCoupling()(x0, x1)
    assert res.x1.shape == x1.shape
    # x1 rows are a permutation of the originals
    s_in = np.sort(np.asarray(x1).reshape(10, -1).sum(1))
    s_out = np.sort(np.asarray(res.x1).reshape(10, -1).sum(1))
    np.testing.assert_allclose(s_in, s_out, rtol=1e-5)


def test_degenerate_constant_cost(key):
    """All targets identical → constant cost matrix: the assignment solvers
    must still return a valid permutation (any), Sinkhorn a uniform plan."""
    x0 = jax.random.normal(key, (12, 2))
    x1 = jnp.broadcast_to(jnp.array([1.0, -1.0]), (12, 2))
    for c in (ExactOTCoupling(), GreedyCoupling()):
        res = c(x0, x1, key=key)
        np.testing.assert_allclose(
            np.asarray(res.x1), np.asarray(x1), rtol=1e-6
        )
    cost = jnp.zeros((12, 12))
    from torchebm_tpu.couplings.ot import auction_assignment, greedy_assignment

    for perm in (auction_assignment(cost), greedy_assignment(cost)):
        assert sorted(np.asarray(perm).tolist()) == list(range(12))
    plan = jnp.exp(sinkhorn_log(cost, reg=0.1, n_iters=50))
    np.testing.assert_allclose(np.asarray(plan), np.full((12, 12), 1 / 144), atol=1e-6)


def test_duplicate_sources_ok(key):
    """Duplicate x0 rows (repeated samples in a batch) don't break solvers."""
    x0 = jnp.tile(jax.random.normal(key, (4, 2)), (4, 1))  # 16 rows, 4 unique
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (16, 2))
    for c in (ExactOTCoupling(), GreedyCoupling(), SinkhornCoupling()):
        res = c(x0, x1, key=key)
        assert res.x1.shape == (16, 2)
        assert bool(jnp.all(jnp.isfinite(res.x1)))


def test_x0_marginal_always_preserved(key):
    """Every cost coupling returns x0 untouched and in order (ref rule,
    ``base_coupling.py:146-227``)."""
    x0 = jax.random.normal(key, (16, 2))
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (16, 2))
    k = jax.random.fold_in(key, 2)
    for c in (
        ExactOTCoupling(),
        GreedyCoupling(),
        SinkhornCoupling(),
        UnbalancedSinkhornCoupling(),
    ):
        res = c(x0, x1, key=k)
        np.testing.assert_array_equal(np.asarray(res.x0), np.asarray(x0))

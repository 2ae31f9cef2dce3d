"""Coupling tests: assignment optimality, marginal preservation, weights, registry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchebm_tpu.couplings import (
    CouplingResult,
    ExactOTCoupling,
    GreedyCoupling,
    IndependentCoupling,
    ReflowCoupling,
    SinkhornCoupling,
    UnbalancedSinkhornCoupling,
    auction_assignment,
    get_coupling,
    greedy_assignment,
    resolve_coupling,
)


def _pair_cost(res):
    return float(jnp.sum((res.x0 - res.x1) ** 2))


def test_coupling_result_unpacks():
    r = CouplingResult(jnp.zeros((2, 2)), jnp.ones((2, 2)))
    a, b = r
    assert float(a.sum()) == 0 and float(b.sum()) == 4
    assert r.weights is None


def test_independent_identity(key):
    x0 = jax.random.normal(key, (8, 2))
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (8, 2))
    r = IndependentCoupling()(x0, x1)
    np.testing.assert_array_equal(r.x0, x0)
    np.testing.assert_array_equal(r.x1, x1)


def test_auction_matches_hungarian(key):
    import scipy.optimize as so

    n = 48
    x0 = jax.random.normal(key, (n, 2))
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (n, 2)) * 2 + 1
    C = np.asarray(jnp.sum((x0[:, None] - x1[None]) ** 2, -1))
    ri, ci = so.linear_sum_assignment(C)
    opt = C[ri, ci].sum()
    perm = np.asarray(auction_assignment(jnp.asarray(C / C.max())))
    assert sorted(perm.tolist()) == list(range(n))  # a true permutation
    ours = C[np.arange(n), perm].sum()
    assert ours <= opt * 1.01 + 1e-6


def test_greedy_is_permutation_and_reasonable(key):
    n = 32
    x0 = jax.random.normal(key, (n, 3))
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    C = jnp.sum((x0[:, None] - x1[None]) ** 2, -1)
    perm = np.asarray(greedy_assignment(C))
    assert sorted(perm.tolist()) == list(range(n))
    ind = float(jnp.trace(C))
    grd = float(C[jnp.arange(n), perm].sum())
    assert grd < ind  # better than identity pairing on random data


def test_exact_ot_reduces_cost(key):
    n = 64
    x0 = jax.random.normal(key, (n, 2))
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (n, 2))
    ind = _pair_cost(IndependentCoupling()(x0, x1))
    ot = _pair_cost(ExactOTCoupling()(x0, x1))
    assert ot < 0.7 * ind


def test_sinkhorn_preserves_x0_marginal(key):
    n = 32
    x0 = jax.random.normal(key, (n, 2))
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (n, 2))
    r = SinkhornCoupling()(x0, x1, key=jax.random.fold_in(key, 2))
    np.testing.assert_array_equal(r.x0, x0)  # x0 order untouched
    # x1 rows all come from the original batch
    match = (r.x1[:, None, :] == x1[None, :, :]).all(-1).any(-1)
    assert bool(jnp.all(match))


def test_sinkhorn_requires_key(key):
    x = jax.random.normal(key, (8, 2))
    with pytest.raises(ValueError, match="key"):
        SinkhornCoupling()(x, x)


def test_sinkhorn_reproducible(key):
    x0 = jax.random.normal(key, (16, 2))
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (16, 2))
    a = SinkhornCoupling()(x0, x1, key=key)
    b = SinkhornCoupling()(x0, x1, key=key)
    np.testing.assert_array_equal(a.x1, b.x1)


def test_unbalanced_weights(key):
    n = 32
    x0 = jax.random.normal(key, (n, 2))
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (n, 2))
    r = UnbalancedSinkhornCoupling(reg=0.05, reg_marginal=1.0)(x0, x1, key=key)
    assert r.weights.shape == (n,)
    np.testing.assert_allclose(float(r.weights.mean()), 1.0, rtol=1e-5)
    # outlier source gets down-weighted
    x0_out = x0.at[0].set(jnp.array([50.0, 50.0]))
    r2 = UnbalancedSinkhornCoupling(reg=0.05, reg_marginal=1.0)(x0_out, x1, key=key)
    assert float(r2.weights[0]) < 0.8


def test_validation_errors(key):
    x = jax.random.normal(key, (8, 2))
    with pytest.raises(ValueError, match="equal batch"):
        ExactOTCoupling()(x, x[:4])
    with pytest.raises(ValueError, match="x1 must not be None"):
        ExactOTCoupling()(x)
    with pytest.raises(ValueError):
        SinkhornCoupling(reg=-1.0)
    with pytest.raises(ValueError):
        SinkhornCoupling(n_iters=0)
    with pytest.raises(ValueError):
        UnbalancedSinkhornCoupling(reg_marginal=0.0)


def test_single_sample_passthrough(key):
    x0 = jax.random.normal(key, (1, 2))
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (1, 2))
    r = ExactOTCoupling()(x0, x1)
    np.testing.assert_array_equal(r.x1, x1)


def test_reflow_coupling_with_callable(key):
    x0 = jax.random.normal(key, (8, 2))
    r = ReflowCoupling(model=lambda x: 2.0 * x)(x0)
    np.testing.assert_allclose(r.x1, 2.0 * x0)
    # sampler-like object path
    class FakeSampler:
        def sample(self, key, x=None, **kw):
            return x + 1.0
    r2 = ReflowCoupling(model=FakeSampler())(x0, key=key)
    np.testing.assert_allclose(r2.x1, x0 + 1.0)


def test_couplings_jittable(key):
    x0 = jax.random.normal(key, (16, 2))
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (16, 2))
    f = jax.jit(lambda a, b, k: SinkhornCoupling().couple(a, b, key=k).x1)
    np.testing.assert_array_equal(
        f(x0, x1, key), SinkhornCoupling()(x0, x1, key=key).x1
    )
    g = jax.jit(lambda a, b: GreedyCoupling().couple(a, b).x1)
    np.testing.assert_array_equal(g(x0, x1), GreedyCoupling()(x0, x1).x1)


def test_coupling_results_stop_gradient(key):
    """Couplings never propagate gradients (reference: computed under no_grad)."""
    x0 = jax.random.normal(key, (8, 2))
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (8, 2))

    def loss(a):
        r = GreedyCoupling()(a, x1)
        return jnp.sum(r.x0**2)

    g = jax.grad(loss)(x0)
    np.testing.assert_array_equal(g, jnp.zeros_like(g))


def test_registry():
    assert isinstance(get_coupling("independent"), IndependentCoupling)
    assert isinstance(get_coupling("ot"), ExactOTCoupling)
    assert isinstance(get_coupling("exact_ot"), ExactOTCoupling)
    assert isinstance(get_coupling("sinkhorn", reg=0.1), SinkhornCoupling)
    with pytest.raises(ValueError):
        get_coupling("reflow")  # instance-only, not registrable
    inst = GreedyCoupling()
    assert resolve_coupling(inst) is inst
    with pytest.raises(TypeError):
        resolve_coupling(1)

"""Parity + convergence-gate tests for the whole-loop Sinkhorn kernel.

The kernel (``ops/fused_sinkhorn.py``) must reproduce the XLA path
(``couplings/ot.py::sinkhorn_log``) bit-for-bit in spirit: same fixed-point
updates in f32, so plans agree to float tolerance at any iteration count, for
balanced and damped (unbalanced) updates, padded and tile-aligned shapes.
Runs in interpret mode on CPU (compiled on TPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchebm_tpu.couplings.ot import sinkhorn_log, unbalanced_sinkhorn_log
from torchebm_tpu.ops.fused_sinkhorn import fits_fused_sinkhorn, sinkhorn_log_fused

INTERPRET = jax.default_backend() != "tpu"


def _cost(key, n, m):
    x0 = jax.random.normal(key, (n, 2))
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (m, 2)) + 1.0
    C = jnp.sum((x0[:, None, :] - x1[None, :, :]) ** 2, axis=-1)
    return C / jnp.max(C)


@pytest.mark.parametrize("shape", [(8, 128), (256, 256), (17, 33), (5, 200)])
def test_fused_matches_xla_fixed_iters(shape):
    C = _cost(jax.random.PRNGKey(0), *shape)
    ref = sinkhorn_log(C, reg=0.05, n_iters=60, fused="off")
    out = sinkhorn_log_fused(C, reg=0.05, n_iters=60, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fused_matches_xla_damped():
    C = _cost(jax.random.PRNGKey(1), 64, 192)
    ref = unbalanced_sinkhorn_log(C, reg=0.1, reg_marginal=0.5, n_iters=80, fused="off")
    fi = 0.5 / (0.5 + 0.1)
    out = sinkhorn_log_fused(C, reg=0.1, n_iters=80, damping=fi, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_convergence_gate_matches_full_run():
    """tol-gated exit must land within tol of the fully-iterated potentials:
    plan marginals still uniform to the same tolerance scale."""
    C = _cost(jax.random.PRNGKey(2), 128, 128)
    gated = sinkhorn_log_fused(C, reg=0.1, n_iters=500, tol=1e-4, interpret=INTERPRET)
    plan = jnp.exp(gated)
    np.testing.assert_allclose(
        np.asarray(jnp.sum(plan, axis=1)), np.full(128, 1 / 128), rtol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(jnp.sum(plan, axis=0)), np.full(128, 1 / 128), rtol=2e-3
    )


def test_xla_tol_gate_matches_full_run():
    """The XLA while_loop tol path converges to the fixed point too."""
    C = _cost(jax.random.PRNGKey(3), 96, 96)
    full = sinkhorn_log(C, reg=0.1, n_iters=2000, fused="off")
    gated = sinkhorn_log(C, reg=0.1, n_iters=2000, tol=1e-6, unroll=4, fused="off")
    np.testing.assert_allclose(np.asarray(gated), np.asarray(full), atol=1e-4)


def test_xla_unroll_is_exact():
    C = _cost(jax.random.PRNGKey(4), 40, 72)
    a = sinkhorn_log(C, reg=0.05, n_iters=64, unroll=1, fused="off")
    b = sinkhorn_log(C, reg=0.05, n_iters=64, unroll=8, fused="off")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


def test_fused_under_jit():
    """The kernel must trace transparently inside an outer jit — the EqM
    train step jits the loss that owns the coupling."""
    C = _cost(jax.random.PRNGKey(5), 32, 128)

    @jax.jit
    def f(c):
        return sinkhorn_log_fused(c, reg=0.05, n_iters=40, tol=1e-3, interpret=INTERPRET)

    ref = sinkhorn_log(C, reg=0.05, n_iters=40, tol=1e-3, fused="off")
    np.testing.assert_allclose(np.asarray(f(C)), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_vmem_budget_gate():
    assert fits_fused_sinkhorn(1024, 1024)
    assert not fits_fused_sinkhorn(4096, 4096)
    with pytest.raises(ValueError, match="VMEM"):
        sinkhorn_log_fused(jnp.zeros((4096, 4096)), reg=0.05, n_iters=1)

r"""Pallas TPU kernel: whole-loop log-domain Sinkhorn in VMEM.

Beyond-reference perf feature (the reference's ``SinkhornCoupling`` runs its
fixed-point loop as ~100 sequential torch ops, ``torchebm/couplings/ot.py:32-53``;
its kernel layer stops at Langevin). Profiling the EqM+Sinkhorn train step
(BASELINE config 5) showed the Sinkhorn ``fori_loop`` — 2 masked logsumexp
passes over a (256, 256) matrix per iteration, ~200 sequential sub-microsecond
XLA kernels — dominating the 2.3 ms step at 0.03% MFU: the workload is
dispatch-latency-bound, not compute-bound. This kernel runs the **entire**
fixed-point iteration in one launch with the cost matrix VMEM-resident, and
adds an in-kernel convergence gate (sup-norm of the potential update) so a
converged plan exits after ~10-40 iterations instead of always paying the cap.

The same kernel serves the KL-relaxed unbalanced variant: the damped update
:math:`f \leftarrow \phi\,(\log\mu - \mathrm{LSE}(M + g))` with
:math:`\phi=\rho/(\rho+\varepsilon)` (Chizat et al. 2018) reduces to the
balanced update at :math:`\phi = 1`.

Shapes are padded to the (8, 128) f32 tile; padded rows/columns are pinned to
``NEG`` (−1e30) so they contribute nothing to either logsumexp and the
returned log-plan entries for them are ``NEG`` (sliced off by the wrapper).
Dispatch lives in :func:`torchebm_tpu.couplings.ot.sinkhorn_log` (``fused``
argument, auto on TPU for matrices that fit VMEM); ``interpret=True`` gives
the exact-parity CI path on CPU (``tests/ops/test_sinkhorn_parity.py``).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

__all__ = ["sinkhorn_log_fused", "fits_fused_sinkhorn"]

# Python float (not a jnp array): scalar constants must enter the kernel
# jaxpr as literals — captured device arrays are rejected by pallas_call.
NEG = -1e30

# VMEM working set is ~4 copies of the padded matrix (cost, M, plan, loop
# temporaries); cap the padded element count so the kernel stays well inside
# the ~16 MB/core budget.
_MAX_PAD_ELEMS = 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def fits_fused_sinkhorn(n: int, m: int) -> bool:
    """Whether an (n, m) cost matrix fits the whole-loop kernel's VMEM budget."""
    return _round_up(max(n, 1), 8) * _round_up(max(m, 1), 128) <= _MAX_PAD_ELEMS


def _sinkhorn_kernel(
    c_ref,
    out_ref,
    *,
    n: int,
    m: int,
    reg: float,
    n_iters: int,
    tol: float,
    damping: float,
):
    n_pad, m_pad = c_ref.shape
    row_valid = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0) < n
    col_valid = jax.lax.broadcasted_iota(jnp.int32, (1, m_pad), 1) < m
    mask = row_valid & col_valid
    M = jnp.where(mask, c_ref[:] * (-1.0 / reg), NEG)
    log_mu = -math.log(n)
    log_nu = -math.log(m)
    phi = float(damping)

    def lse(A, axis):
        mx = jnp.max(A, axis=axis, keepdims=True)
        return mx + jnp.log(jnp.sum(jnp.exp(A - mx), axis=axis, keepdims=True))

    def pair(f, g):
        # f: (n_pad, 1) column potentials; g: (1, m_pad) row potentials.
        f_new = jnp.where(row_valid, phi * (log_mu - lse(M + g, axis=1)), NEG)
        g_new = jnp.where(col_valid, phi * (log_nu - lse(M + f_new, axis=0)), NEG)
        return f_new, g_new

    f0 = jnp.where(row_valid, 0.0, NEG)
    g0 = jnp.where(col_valid, 0.0, NEG)

    if tol > 0.0:

        def cond(state):
            _, _, err, it = state
            return (it < n_iters) & (err > tol)

        def body(state):
            f, g, _, it = state
            f_new, g_new = pair(f, g)
            err = jnp.max(jnp.where(row_valid, jnp.abs(f_new - f), 0.0))
            return f_new, g_new, err, it + 1

        f, g, _, _ = jax.lax.while_loop(
            cond, body, (f0, g0, jnp.float32(jnp.inf), jnp.int32(0))
        )
    else:

        def body(_, fg):
            return pair(*fg)

        f, g = jax.lax.fori_loop(0, n_iters, body, (f0, g0))

    out_ref[:] = jnp.where(mask, M + f + g, NEG)


def sinkhorn_log_fused(
    C: Array,
    reg: float,
    n_iters: int,
    tol: float = 0.0,
    damping: float = 1.0,
    interpret: bool = False,
) -> Array:
    """Whole-loop Sinkhorn in ONE kernel launch; returns the log plan (n, m).

    Semantics match :func:`torchebm_tpu.couplings.ot.sinkhorn_log` (and, for
    ``damping`` < 1, ``unbalanced_sinkhorn_log``) with the same ``tol``:
    identical fixed-point updates in f32, convergence measured as
    ``max|f_new − f|`` per iteration. ``reg``/``tol``/``damping`` must be
    concrete Python floats (they are baked into the program).
    """
    n, m = C.shape
    if n < 1 or m < 1:
        raise ValueError(f"cost matrix must be non-empty, got {C.shape}")
    if not fits_fused_sinkhorn(n, m):
        raise ValueError(
            f"cost matrix {C.shape} exceeds the fused Sinkhorn VMEM budget; "
            "use the XLA path (fused='off')"
        )
    n_pad = _round_up(n, 8)
    m_pad = _round_up(m, 128)
    Cp = jnp.zeros((n_pad, m_pad), jnp.float32).at[:n, :m].set(C.astype(jnp.float32))
    kernel = functools.partial(
        _sinkhorn_kernel,
        n=n,
        m=m,
        reg=float(reg),
        n_iters=int(n_iters),
        tol=float(tol),
        damping=float(damping),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(Cp)
    return out[:n, :m].astype(C.dtype)

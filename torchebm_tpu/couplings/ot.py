r"""Minibatch optimal-transport couplings, all jnp-native and jittable.

Reference: ``torchebm/couplings/ot.py`` (auction ``:91-179``, log-Sinkhorn
``:32-53``, unbalanced ``:56-88``, greedy ``:182-217``). Differences from the
torch implementations:

- Sinkhorn iterations run in ``lax.fori_loop``; the row-conditional draw is
  ``jax.random.categorical`` on the log-plan (equivalent to multinomial on the
  exponentiated plan, but skips the exp→clamp→renormalize round-trip).
- The Bertsekas auction's data-dependent bidding rounds become **bounded
  ``lax.while_loop``s on device** — the reference's host-side
  ``.nonzero()``/``.any()`` round-trips per round disappear; bidding is
  computed for all rows each round and masked to the unassigned ones.
- Greedy nearest-free-pair is re-expressed as ``n`` rounds of masked global
  argmin (identical pairing to the reference's sorted-scan on the host,
  ``ot.py:182-217``, but vectorized: each round is one ``argmin`` over the
  masked cost matrix on the VPU instead of a host-side byte-array scan).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from .base import BaseCostCoupling, BaseCoupling, BaseModelCoupling, CouplingResult

Array = jax.Array

__all__ = [
    "ExactOTCoupling",
    "SinkhornCoupling",
    "UnbalancedSinkhornCoupling",
    "GreedyCoupling",
    "IndependentCoupling",
    "ReflowCoupling",
    "sinkhorn_log",
    "unbalanced_sinkhorn_log",
    "auction_assignment",
    "greedy_assignment",
]


# ---------------------------------------------------------------- solvers


def _use_fused_sinkhorn(C: Array, reg, tol, damping, fused: str) -> bool:
    """Dispatch gate for the whole-loop Pallas kernel (``ops/fused_sinkhorn``).

    TPU backend only (CPU tests exercise the XLA path; the kernel itself is
    covered by interpret-mode parity tests), float32 cost matrix (the kernel
    computes in f32 — non-f32 inputs keep the XLA path so their numerics are
    never silently changed), hyperparameters concrete (they are baked into
    the kernel program), matrix inside the VMEM budget. Unlike the sampler
    chain kernels this engages under an outer ``jit`` — ``pallas_call``
    traces transparently, and the training step that owns the coupling is
    always jitted. ``fused="force"`` overrides the backend and dtype gates
    (off-TPU it runs the kernel in interpret mode, matching the analytic
    chain kernels' convention).
    """
    if fused == "off":
        return False
    if fused != "force":
        if jax.default_backend() != "tpu":
            return False
        if C.dtype != jnp.float32:
            return False
    for v in (reg, tol, damping):
        if isinstance(v, jax.core.Tracer):
            return False
    from ..ops.fused_sinkhorn import fits_fused_sinkhorn

    return fits_fused_sinkhorn(*C.shape)


def _fused_interpret() -> bool:
    """Interpret-mode flag for force-dispatched kernels off-TPU."""
    return jax.default_backend() != "tpu"


def _sinkhorn_potentials(M, log_mu, log_nu, n_iters, tol, unroll, damping=1.0):
    """Shared XLA fixed-point loop; returns potentials ``(f, g)``.

    ``tol > 0`` runs a bounded ``lax.while_loop`` that exits once the sup-norm
    of the ``f`` update drops below ``tol`` (checked every ``unroll``
    iterations); at most ``n_iters`` pair updates run in total — with
    ``unroll > 1`` the trailing ``n_iters % unroll`` iterations execute as a
    partial block guarded on non-convergence. ``tol == 0`` keeps the fixed
    ``fori_loop`` (exact backward compatibility), unrolled ``unroll``-way.
    """
    n = M.shape[0]
    m = M.shape[1]

    def pair(fg):
        f, g = fg
        f = damping * (log_mu - jax.scipy.special.logsumexp(M + g[None, :], axis=1))
        g = damping * (log_nu - jax.scipy.special.logsumexp(M + f[:, None], axis=0))
        return f, g

    init = (jnp.zeros(n, M.dtype), jnp.zeros(m, M.dtype))
    unroll = max(1, int(unroll))
    if tol and tol > 0:
        n_checks = int(n_iters) // unroll
        rem = int(n_iters) - n_checks * unroll

        def cond(state):
            _, err, it = state
            return (it < n_checks) & (err > tol)

        def body(state):
            fg, _, it = state
            f_prev = fg[0]
            for _ in range(unroll):
                fg = pair(fg)
            err = jnp.max(jnp.abs(fg[0] - f_prev))
            return fg, err, it + 1

        (f, g), err, _ = jax.lax.while_loop(
            cond, body, (init, jnp.array(jnp.inf, M.dtype), jnp.int32(0))
        )
        if rem:
            def partial_block(fg):
                for _ in range(rem):
                    fg = pair(fg)
                return fg

            f, g = jax.lax.cond(err > tol, partial_block, lambda fg: fg, (f, g))
        return f, g
    f, g = jax.lax.fori_loop(0, n_iters, lambda _, fg: pair(fg), init, unroll=unroll)
    return f, g


def sinkhorn_log(
    C: Array,
    reg: float,
    n_iters: int,
    tol: float = 0.0,
    unroll: int = 1,
    fused: str = "auto",
) -> Array:
    """Log-domain Sinkhorn; returns the **log** transport plan (n, m).

    ``n_iters`` is the iteration cap; with ``tol > 0`` the fixed point exits
    early once ``max|Δf| < tol`` (typical exit ≪ cap at training batch sizes).
    On TPU, matrices that fit VMEM ride the whole-loop Pallas kernel
    (:func:`torchebm_tpu.ops.fused_sinkhorn.sinkhorn_log_fused`) — one launch
    instead of ~2·n_iters sequential logsumexp kernels; ``fused="off"``
    forces the XLA path.
    """
    if _use_fused_sinkhorn(C, reg, tol, 1.0, fused):
        from ..ops.fused_sinkhorn import sinkhorn_log_fused

        return sinkhorn_log_fused(C, reg, n_iters, tol=tol, interpret=_fused_interpret())
    n, m = C.shape
    M = -C / reg
    f, g = _sinkhorn_potentials(M, -math.log(n), -math.log(m), n_iters, tol, unroll)
    return M + f[:, None] + g[None, :]


def unbalanced_sinkhorn_log(
    C: Array,
    reg: float,
    reg_marginal: float,
    n_iters: int,
    tol: float = 0.0,
    unroll: int = 1,
    fused: str = "auto",
) -> Array:
    r"""KL-relaxed log-domain Sinkhorn with damping :math:`\phi=\rho/(\rho+\varepsilon)`
    (Chizat et al. 2018); returns the log plan. Same ``tol``/``unroll``/
    ``fused`` semantics as :func:`sinkhorn_log` (the damped update rides the
    same whole-loop kernel)."""
    fi = reg_marginal / (reg_marginal + reg)
    if _use_fused_sinkhorn(C, reg, tol, fi, fused):
        from ..ops.fused_sinkhorn import sinkhorn_log_fused

        return sinkhorn_log_fused(
            C, reg, n_iters, tol=tol, damping=fi, interpret=_fused_interpret()
        )
    n, m = C.shape
    M = -C / reg
    f, g = _sinkhorn_potentials(
        M, -math.log(n), -math.log(m), n_iters, tol, unroll, damping=fi
    )
    return M + f[:, None] + g[None, :]


def auction_assignment(
    cost: Array,
    tol: float = 1e-4,
    scale_factor: float = 8.0,
    max_rounds: int = 0,
) -> Array:
    r"""Vectorized Bertsekas forward auction with ε-scaling, fully on device.

    Each bidding round: every unassigned row bids on its best column
    (``top_k(2)`` margins); contested columns resolve by highest bid then
    lowest row index; evicted owners re-enter the pool. Prices persist across
    ε-scaling phases. Returns a permutation ``perm`` with row ``i`` assigned
    to column ``perm[i]``; within ``tol`` of the optimal assignment.
    """
    n = cost.shape[0]
    if n == 1:
        return jnp.zeros((1,), jnp.int32)
    benefit = -cost.astype(jnp.float32)
    eps_final = tol / n
    spread = jnp.maximum(jnp.max(benefit) - jnp.min(benefit), eps_final)
    eps0 = jnp.maximum(spread / 4.0, eps_final)
    if max_rounds <= 0:
        max_rounds = max(200, 100 * n)

    rows_iota = jnp.arange(n, dtype=jnp.int32)
    NEG = jnp.float32(-jnp.inf)

    def bidding_phase(state):
        """Inner loop: bid until all rows assigned or round budget exhausted."""
        assign_row, assign_col, prices, eps, rounds = state

        def cond(s):
            a_row, _, _, _, r = s
            return jnp.any(a_row < 0) & (r <= max_rounds)

        def body(s):
            a_row, a_col, pr, e, r = s
            unassigned = a_row < 0  # (n,)
            values = benefit - pr[None, :]  # (n, n)
            top2_vals, top2_idx = jax.lax.top_k(values, 2)
            best_col = top2_idx[:, 0]
            margin = top2_vals[:, 0] - top2_vals[:, 1]
            bids = jnp.where(unassigned, pr[best_col] + margin + e, NEG)

            # highest bid per contested column
            bid_max = jnp.full((n,), NEG).at[best_col].max(bids)
            is_winner = unassigned & (bids >= bid_max[best_col])
            # lowest row index wins ties
            winner_row = (
                jnp.full((n,), n, jnp.int32)
                .at[jnp.where(is_winner, best_col, n)]
                .min(jnp.where(is_winner, rows_iota, n), mode="drop")
            )
            col_won = winner_row < n  # (n,) columns with a new owner

            # evict previous owners of the won columns
            prev_owner = jnp.where(col_won, a_col, -1)
            a_row = a_row.at[jnp.where(prev_owner >= 0, prev_owner, n)].set(
                -1, mode="drop"
            )
            # assign winners
            a_row = a_row.at[jnp.where(col_won, winner_row, n)].set(
                jnp.where(col_won, rows_iota, n), mode="drop"
            )
            a_col = jnp.where(col_won, winner_row, a_col)
            pr = jnp.where(col_won, bid_max, pr)
            return a_row, a_col, pr, e, r + 1

        return jax.lax.while_loop(cond, body, state)

    def scaling_cond(state):
        _, _, _, eps, rounds, done = state
        return jnp.logical_not(done)

    def scaling_body(state):
        assign_row, assign_col, prices, eps, rounds, _ = state
        assign_row = jnp.full((n,), -1, jnp.int32)
        assign_col = jnp.full((n,), -1, jnp.int32)
        assign_row, assign_col, prices, eps, rounds = bidding_phase(
            (assign_row, assign_col, prices, eps, rounds)
        )
        done = (rounds > max_rounds) | (eps <= eps_final)
        eps = jnp.maximum(eps / scale_factor, eps_final)
        return assign_row, assign_col, prices, eps, rounds, done

    init = (
        jnp.full((n,), -1, jnp.int32),
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,), jnp.float32),
        eps0,
        jnp.int32(0),
        jnp.bool_(False),
    )
    assign_row, assign_col, *_ = jax.lax.while_loop(scaling_cond, scaling_body, init)

    # Safety-valve completion: pair leftover rows with leftover columns by rank.
    row_free = assign_row < 0
    col_free = assign_col < 0
    row_rank = jnp.cumsum(row_free.astype(jnp.int32)) - 1  # rank among free rows
    # free_cols[r] = index of the r-th free column
    col_order = jnp.argsort(jnp.where(col_free, rows_iota, n + rows_iota))
    fallback = col_order[jnp.clip(row_rank, 0, n - 1)]
    return jnp.where(row_free, fallback, assign_row).astype(jnp.int32)


def greedy_assignment(cost: Array) -> Array:
    """Nearest-free-pair greedy assignment (reference ``ot.py:182-217``).

    The reference sorts all n² pairs once and scans them host-side; the
    previous TPU form ran n sequential rounds of a full (n, n) argmin —
    O(n³) work. This version assigns, each round, every *locally dominant*
    free pair (cheapest in both its row and its column): the cheapest
    remaining pair is always locally dominant, and a locally dominant pair is
    untouchable by any earlier greedy pick, so simultaneous assignment
    reproduces the sequential nearest-free-pair result exactly for distinct
    costs (ties may resolve differently). Expected O(log n) rounds of
    vectorized O(n²) work on random costs, n rounds worst case.
    """
    n = cost.shape[0]
    if n == 1:
        return jnp.zeros((1,), jnp.int32)
    INF = jnp.float32(jnp.inf)
    iota = jnp.arange(n)

    def cond(state):
        _, perm, rounds = state
        return jnp.logical_and(jnp.any(perm < 0), rounds < n)

    def body(state):
        c, perm, rounds = state
        rmin = jnp.argmin(c, axis=1)  # cheapest free col per row
        cmin = jnp.argmin(c, axis=0)  # cheapest free row per col
        dominant = (perm < 0) & (cmin[rmin] == iota) & jnp.isfinite(c[iota, rmin])
        perm = jnp.where(dominant, rmin.astype(jnp.int32), perm)
        col_taken = (
            jnp.zeros((n,), bool).at[jnp.where(dominant, rmin, n)].set(True, mode="drop")
        )
        c = jnp.where(dominant[:, None] | col_taken[None, :], INF, c)
        return c, perm, rounds + 1

    _, perm, _ = jax.lax.while_loop(
        cond, body, (cost.astype(jnp.float32), jnp.full((n,), -1, jnp.int32), jnp.int32(0))
    )

    # Safety-valve completion (non-finite costs): rank-pair leftovers.
    row_free = perm < 0
    col_free = ~(
        jnp.zeros((n,), bool).at[jnp.where(row_free, n, perm)].set(True, mode="drop")
    )
    row_rank = jnp.cumsum(row_free.astype(jnp.int32)) - 1
    col_order = jnp.argsort(jnp.where(col_free, iota, n + iota))
    fallback = col_order[jnp.clip(row_rank, 0, n - 1)]
    return jnp.where(row_free, fallback, perm).astype(jnp.int32)


# ---------------------------------------------------------------- couplings


@struct.dataclass
class IndependentCoupling(BaseCoupling):
    """Identity pairing (reference ``independent.py:12-42``)."""

    def couple(self, x0, x1=None, *, key=None, **kwargs) -> CouplingResult:
        x1 = self._require_x1(x1)
        self._check_batch(x0, x1)
        return CouplingResult(jax.lax.stop_gradient(x0), jax.lax.stop_gradient(x1))


@struct.dataclass
class ExactOTCoupling(BaseCostCoupling):
    """Exact minibatch OT via the auction algorithm (reference ``ot.py:218-253``).

    Deterministic permutation of the target batch; prefer
    :class:`SinkhornCoupling` inside training loops (same guidance as the
    reference).
    """

    tol: float = struct.field(pytree_node=False, default=1e-4)

    def _solve(self, cost, key=None):
        return auction_assignment(cost, tol=self.tol)


@struct.dataclass
class SinkhornCoupling(BaseCostCoupling):
    """Entropic OT: log-Sinkhorn plan + row-conditional draw (reference ``ot.py:256-296``).

    ``n_iters`` caps the fixed point; ``tol`` (sup-norm of the potential
    update, default 1e-3) exits early once converged — at training batch
    sizes the plan typically converges in a fraction of the cap. Set
    ``tol=0.0`` to always run exactly ``n_iters`` iterations.
    """

    reg: float = struct.field(pytree_node=False, default=0.05)
    n_iters: int = struct.field(pytree_node=False, default=100)
    tol: float = struct.field(pytree_node=False, default=1e-3)
    fused: str = struct.field(pytree_node=False, default="auto")

    def __post_init__(self):
        if self.reg <= 0:
            raise ValueError(f"reg must be positive, got {self.reg}")
        if self.n_iters <= 0:
            raise ValueError(f"n_iters must be positive, got {self.n_iters}")
        if self.tol < 0:
            raise ValueError(f"tol must be non-negative, got {self.tol}")

    def _solve(self, cost, key=None):
        if key is None:
            raise ValueError("SinkhornCoupling draws row-conditionally; a PRNG key is required.")
        log_plan = sinkhorn_log(
            cost, reg=self.reg, n_iters=self.n_iters, tol=self.tol, fused=self.fused
        )
        return jax.random.categorical(key, log_plan, axis=1)


@struct.dataclass
class UnbalancedSinkhornCoupling(BaseCostCoupling):
    """KL-relaxed Sinkhorn with per-pair importance weights (reference ``ot.py:299-368``)."""

    reg: float = struct.field(pytree_node=False, default=0.05)
    reg_marginal: float = struct.field(pytree_node=False, default=1.0)
    n_iters: int = struct.field(pytree_node=False, default=100)
    tol: float = struct.field(pytree_node=False, default=1e-3)
    fused: str = struct.field(pytree_node=False, default="auto")

    def __post_init__(self):
        if self.reg <= 0:
            raise ValueError(f"reg must be positive, got {self.reg}")
        if self.reg_marginal <= 0:
            raise ValueError(f"reg_marginal must be positive, got {self.reg_marginal}")
        if self.n_iters <= 0:
            raise ValueError(f"n_iters must be positive, got {self.n_iters}")
        if self.tol < 0:
            raise ValueError(f"tol must be non-negative, got {self.tol}")

    def couple(self, x0, x1=None, *, key=None, **kwargs) -> CouplingResult:
        x1 = self._require_x1(x1)
        self._check_batch(x0, x1)
        if x0.shape[0] == 1:
            return CouplingResult(jax.lax.stop_gradient(x0), jax.lax.stop_gradient(x1))
        if key is None:
            raise ValueError("UnbalancedSinkhornCoupling requires a PRNG key.")
        cost = self.compute_cost(x0, x1, **kwargs)
        log_plan = unbalanced_sinkhorn_log(
            cost,
            reg=self.reg,
            reg_marginal=self.reg_marginal,
            n_iters=self.n_iters,
            tol=self.tol,
            fused=self.fused,
        )
        mass = jnp.exp(jax.scipy.special.logsumexp(log_plan, axis=1))
        weights = mass / jnp.maximum(jnp.mean(mass), 1e-12)
        idx = jax.random.categorical(key, log_plan, axis=1)
        return CouplingResult(
            jax.lax.stop_gradient(x0),
            jax.lax.stop_gradient(x1[idx]),
            weights=jax.lax.stop_gradient(weights),
        )

    def _solve(self, cost, key=None):  # pragma: no cover
        raise NotImplementedError(
            "UnbalancedSinkhornCoupling overrides couple() to attach weights"
        )


@struct.dataclass
class GreedyCoupling(BaseCostCoupling):
    """Greedy nearest-free-pair coupling (reference ``ot.py:371-394``)."""

    def _solve(self, cost, key=None):
        return greedy_assignment(cost)


@struct.dataclass
class ReflowCoupling(BaseModelCoupling):
    r"""Model-induced coupling :math:`x_1 = \Phi(x_0)` for rectified-flow reflow
    (reference ``model_induced.py:26-78``).

    ``model`` may be a sampler-like object with ``.sample(key, x=x0, ...)``
    (e.g. :class:`~torchebm_tpu.samplers.FlowSampler`) or a bare callable
    ``phi(x0)`` / ``phi(key, x0)``. Instance-only — not string-registrable,
    same as the reference.
    """

    model: object = struct.field(pytree_node=True, default=None)
    sample_kwargs: dict = struct.field(pytree_node=False, default_factory=dict)

    def _generate(self, x0, key=None, **kwargs):
        m = self.model
        if hasattr(m, "sample"):
            return m.sample(key, x=x0, **dict(self.sample_kwargs, **kwargs))
        try:
            return m(key, x0, **kwargs)
        except TypeError:
            return m(x0, **kwargs)

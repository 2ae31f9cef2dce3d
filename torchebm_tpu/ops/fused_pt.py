r"""Pallas TPU kernel: whole-chain parallel-tempered Langevin (replica exchange).

Round-4 verdict item 3: :class:`~torchebm_tpu.samplers.ParallelTemperingLangevin`
previously could not ride the fused chain kernels because its per-replica
:math:`\beta_r`-scaled drift has no slot in the single-scale Langevin kernels
(``ops/fused_langevin.py``). This kernel runs the ENTIRE replica ladder in one
launch: the state tile is ``(R·8·d, lanes)`` — replica ``r``'s coordinate
``i`` occupies sublane rows ``r·8d + 8i .. +8`` — and the (static) ladder
unrolls in-trace, so each replica's drift carries its own baked
:math:`\beta_r` multiplier with zero table lookups:

.. math::
    x^{(r)}_{t+1} = x^{(r)}_t - \eta\,\beta_r \nabla U(x^{(r)}_t)
    + \text{noise\_scale}\cdot\sqrt{2\eta}\,\varepsilon_t

Replica-exchange sweeps happen **in-kernel**: every ``swap_every`` steps the
per-chain unnormalized log-densities of all replicas are evaluated from the
(already VMEM-resident) state, and the alternating even/odd adjacent-pair
Metropolis exchanges (Okabe et al. 2001; the scan path's ``_swap``) run as
branch-free ``jnp.where`` selects on the coordinate tiles. The chain never
round-trips HBM — neither between Langevin steps nor across swaps — which is
exactly what the scan path cannot avoid (one state materialization per step).

All four kernel variants (PRNG / injected-randomness × plain / trajectory)
share ONE body (:func:`_pt_body`), parameterized by the randomness source
and the trajectory recorder — a fix in the dynamics or swap math lands
everywhere at once. The ``*_trajectory`` variants DMA every ``thin``-th
COLD (replica 0) state to an HBM-resident trajectory, post-swap on exchange
steps (the library loop's kept-carry semantics).

Supported targets mirror the mixture-family chain kernels: d-dim isotropic
Gaussian mixtures (``K·d ≤ 1024``) and full-covariance Gaussians (``d ≤ 32``
via ``precision=``), sharing :func:`~torchebm_tpu.ops.fused_langevin._tile_grad_logp`.
The swap-acceptance statistic of the FINAL attempted sweep is emitted per
grid block and averaged by the wrapper (mean accept probability over the
pairs attempted that sweep; includes the padded tail chains — approximate,
like the scan path's batch mean but computed blockwise).

``noise=`` / ``swap_uniform=`` inject the Gaussian increments and the
per-pair exchange uniforms for the exact-parity CI path
(``tests/ops/test_pt_parity.py``) — the same correctness pattern as every
other chain kernel (reference ``torchebm/cuda/fused_langevin.py:90-138``;
the reference itself never implemented parallel tempering —
``torchebm/losses/contrastive_divergence.py:246-263`` is a constructor stub).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_langevin import (
    _mixture_block,
    _normal_tiles,
    _pack_target,
    _split_coords,
    _tile_grad_logp,
    _uniform_from_bits,
    chains_to_tiles,
    tiles_to_chains,
)

Array = jax.Array

__all__ = ["pt_langevin_chain", "pt_langevin_chain_trajectory"]


def _split_ladder(x, R, d):
    """Split an ``(R·8d, block)`` ladder tile into per-replica coord lists."""
    rows = 8 * d
    return [_split_coords(x[r * rows : (r + 1) * rows], d) for r in range(R)]


def _pt_body(
    get_eps_all,
    get_swapu,
    means,
    *,
    betas,
    step_size,
    noise_coef,
    inv_var,
    n_components,
    d,
    clamp,
    track_acc,
):
    """The shared ladder program: returns ``(langevin_all, swap)``.

    ``get_eps_all(t, shape)`` supplies the per-replica lists of d normal
    tiles for global step ``t`` (one fetch/draw for the whole ladder);
    ``get_swapu(s, r, shape)`` the exchange uniforms for pair ``r`` at sweep
    ``s``. Trajectory recording is wired into :func:`_run_ladder`, not here.
    ``track_acc`` keeps the last sweep's blockwise mean accept probability
    (the PRNG path's diagnostic channel).
    """
    R = len(betas)

    def langevin_all(x, t):
        reps = _split_ladder(x, R, d)
        eps_all = get_eps_all(t, reps[0][0].shape)
        new = []
        for r in range(R):
            grads, _ = _tile_grad_logp(reps[r], means, inv_var, n_components, d)
            eps = eps_all[r]
            cs = [
                reps[r][j] - (step_size * betas[r]) * grads[j] + noise_coef * eps[j]
                for j in range(d)
            ]
            if clamp is not None:
                cs = [jnp.clip(c, clamp[0], clamp[1]) for c in cs]
            new.extend(cs)
        return jnp.concatenate(new, axis=0)

    def swap(x, s):
        reps = _split_ladder(x, R, d)
        logps = [
            _tile_grad_logp(reps[r], means, inv_var, n_components, d)[1]
            for r in range(R)
        ]
        coords = [list(reps[r]) for r in range(R)]
        acc_sum = jnp.zeros((1, 1), jnp.float32)
        n_att = 0
        for r in range(R - 1):
            u = get_swapu(s, r, logps[r].shape)
            if R > 2:
                active = (s % 2) == (r % 2)
            else:
                active = r % 2 == 0
            # delta = (beta_r - beta_{r+1}) (U_r - U_{r+1}); U = -logp + const
            delta = (betas[r] - betas[r + 1]) * (logps[r + 1] - logps[r])
            p = jnp.minimum(jnp.exp(jnp.clip(delta, -50.0, 50.0)), 1.0)
            do = jnp.logical_and(active, u < p)
            for j in range(d):
                lo, hi = coords[r][j], coords[r + 1][j]
                coords[r][j] = jnp.where(do, hi, lo)
                coords[r + 1][j] = jnp.where(do, lo, hi)
            e_lo, e_hi = logps[r], logps[r + 1]
            logps[r] = jnp.where(do, e_hi, e_lo)
            logps[r + 1] = jnp.where(do, e_lo, e_hi)
            if track_acc:
                if R > 2:
                    acc_sum = acc_sum + jnp.where(active, jnp.mean(p), 0.0)
                else:
                    acc_sum = acc_sum + jnp.mean(p)
                    n_att += 1
        if track_acc:
            if R > 2:
                n_act = jnp.where(
                    (s % 2) == 0, (R - 1 + 1) // 2, (R - 1) // 2
                ).astype(jnp.float32)
                acc = acc_sum / jnp.maximum(n_act, 1.0)
            else:
                acc = acc_sum / float(n_att)
        else:
            acc = jnp.zeros((1, 1), jnp.float32)
        return jnp.concatenate(sum(coords, []), axis=0), acc

    return langevin_all, swap


def _run_ladder(x0, langevin_all, swap, record, *, n_steps, swap_every):
    """Drive the shared ladder program over ``n_steps`` transitions."""
    n_sweeps = n_steps // swap_every
    rem = n_steps - n_sweeps * swap_every

    def sweep(s, carry):
        x, acc = carry
        for t in range(swap_every - 1):
            g = s * swap_every + t
            x = langevin_all(x, g)
            record(x, g + 1)
        x = langevin_all(x, s * swap_every + swap_every - 1)
        x, acc = swap(x, s)
        record(x, (s + 1) * swap_every)
        return x, acc

    acc0 = jnp.zeros((1, 1), jnp.float32)
    x, acc = jax.lax.fori_loop(0, n_sweeps, sweep, (x0, acc0))
    for t in range(rem):
        g = n_sweeps * swap_every + t
        x = langevin_all(x, g)
        record(x, g + 1)
    return x, acc


def _no_record(x, g):
    return None


def _make_recorder(traj_ref, scratch_ref, sem_ref, *, thin, rows_cold, block):
    col0 = pl.program_id(0) * block

    def record(x, g):
        @pl.when(g % thin == 0)
        def _():
            k = g // thin - 1
            scratch_ref[...] = x[0:rows_cold]
            dma = pltpu.make_async_copy(
                scratch_ref, traj_ref.at[k, :, pl.ds(col0, block)], sem_ref
            )
            dma.start()
            dma.wait()

    return record


def _pt_prng_kernel_body(R, d):
    # draws happen per replica in ascending order — the same PRNG stream as
    # an in-loop draw would consume
    def get_eps_all(t, shape):
        return [_normal_tiles(shape, d) for _ in range(R)]

    def get_swapu(s, r, shape):
        return _uniform_from_bits(shape)

    return get_eps_all, get_swapu


def _pt_injected_kernel_body(noise_ref, swapu_ref, R, d):
    def get_eps_all(t, shape):
        et = noise_ref[pl.ds(t, 1)][0]  # ONE slab fetch + split per step
        return _split_ladder(et, R, d)

    def get_swapu(s, r, shape):
        return swapu_ref[pl.ds(s, 1)][0, r]

    return get_eps_all, get_swapu


def _pt_chain_kernel(seed_ref, x_ref, means_ref, out_ref, acc_ref, *, kw):
    """In-kernel-PRNG PT chain. ``kw['betas']`` is the static ladder tuple."""
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    get_eps_all, get_swapu = _pt_prng_kernel_body(len(kw["betas"]), kw["d"])
    langevin_all, swap = _pt_body(
        get_eps_all, get_swapu, means_ref[...], track_acc=True,
        **{k: v for k, v in kw.items() if k not in ("n_steps", "swap_every")},
    )
    x, acc = _run_ladder(
        x_ref[...], langevin_all, swap, _no_record,
        n_steps=kw["n_steps"], swap_every=kw["swap_every"],
    )
    out_ref[...] = x
    acc_ref[0, 0] = acc[0, 0]


def _pt_chain_noise_kernel(x_ref, means_ref, noise_ref, swapu_ref, out_ref,
                           acc_ref, *, kw):
    """Injected-noise/uniform variant (exact-parity CI path).

    ``noise_ref``: ``(n_steps, R·8d, block)`` Gaussian increments;
    ``swapu_ref``: ``(n_sweeps, R-1, 8, block)`` exchange uniforms.
    """
    body_kw = {k: v for k, v in kw.items() if k not in ("n_steps", "swap_every")}
    get_eps_all, get_swapu = _pt_injected_kernel_body(
        noise_ref, swapu_ref, len(kw["betas"]), kw["d"]
    )
    langevin_all, swap = _pt_body(
        get_eps_all, get_swapu, means_ref[...], track_acc=False, **body_kw
    )
    x, acc = _run_ladder(
        x_ref[...], langevin_all, swap, _no_record,
        n_steps=kw["n_steps"], swap_every=kw["swap_every"],
    )
    out_ref[...] = x
    acc_ref[0, 0] = acc[0, 0]


def _pt_chain_traj_kernel(seed_ref, x_ref, means_ref, out_ref, acc_ref,
                          traj_ref, scratch_ref, sem_ref, *, kw, thin, block):
    """In-kernel-PRNG PT chain recording every ``thin``-th COLD state."""
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    get_eps_all, get_swapu = _pt_prng_kernel_body(len(kw["betas"]), kw["d"])
    body_kw = {k: v for k, v in kw.items() if k not in ("n_steps", "swap_every")}
    langevin_all, swap = _pt_body(
        get_eps_all, get_swapu, means_ref[...], track_acc=True, **body_kw
    )
    record = _make_recorder(
        traj_ref, scratch_ref, sem_ref, thin=thin,
        rows_cold=8 * kw["d"], block=block,
    )
    x, acc = _run_ladder(
        x_ref[...], langevin_all, swap, record,
        n_steps=kw["n_steps"], swap_every=kw["swap_every"],
    )
    out_ref[...] = x
    acc_ref[0, 0] = acc[0, 0]


def _pt_chain_traj_noise_kernel(x_ref, means_ref, noise_ref, swapu_ref,
                                out_ref, acc_ref, traj_ref, scratch_ref,
                                sem_ref, *, kw, thin, block):
    """Injected-noise/uniform trajectory variant (exact-parity CI path)."""
    body_kw = {k: v for k, v in kw.items() if k not in ("n_steps", "swap_every")}
    get_eps_all, get_swapu = _pt_injected_kernel_body(
        noise_ref, swapu_ref, len(kw["betas"]), kw["d"]
    )
    langevin_all, swap = _pt_body(
        get_eps_all, get_swapu, means_ref[...], track_acc=False, **body_kw
    )
    record = _make_recorder(
        traj_ref, scratch_ref, sem_ref, thin=thin,
        rows_cold=8 * kw["d"], block=block,
    )
    x, acc = _run_ladder(
        x_ref[...], langevin_all, swap, record,
        n_steps=kw["n_steps"], swap_every=kw["swap_every"],
    )
    out_ref[...] = x
    acc_ref[0, 0] = acc[0, 0]


def _validate_and_pack(replicas, means, betas, swap_every, noise, swap_uniform,
                       log_weights, precision, name):
    R, n_chains, dim = replicas.shape
    betas = tuple(float(b) for b in betas)
    if len(betas) != R:
        raise ValueError(f"betas has {len(betas)} entries for {R} replicas")
    if R < 2:
        raise ValueError("parallel tempering needs >= 2 replicas")
    if swap_every < 1:
        raise ValueError("swap_every must be >= 1")
    k, kd = means.shape
    if kd != dim:
        raise ValueError(f"means dim {kd} != state dim {dim}")
    if dim > 64 or k * dim > 1024:
        raise ValueError(
            f"{name} unrolls K components x d dims in-kernel; K*d={k * dim}, "
            f"d={dim} exceeds the supported size (d<=64, K*d<=1024)"
        )
    if (noise is None) != (swap_uniform is None):
        raise ValueError("pass both noise= and swap_uniform=, or neither")
    tiles = [chains_to_tiles(replicas[r])[0] for r in range(R)]
    xt = jnp.concatenate(tiles, axis=0)
    packed, n_comp = _pack_target(means, log_weights, precision)
    return betas, xt, tiles[0].shape[1], packed, n_comp


def _stage_injected(noise, swap_uniform, n_steps, n_sweeps, R, n_chains, dim,
                    lanes):
    """Tile the injected randomness; guards run BEFORE any stacking so a
    zero-sweep chain stages a placeholder uniforms block instead of crashing
    on an empty stack."""
    if noise.shape != (n_steps, R, n_chains, dim):
        raise ValueError(
            f"noise must have shape {(n_steps, R, n_chains, dim)}, got {noise.shape}"
        )
    if swap_uniform.shape != (n_sweeps, R - 1, n_chains):
        raise ValueError(
            f"swap_uniform must have shape {(n_sweeps, R - 1, n_chains)}, "
            f"got {swap_uniform.shape}"
        )
    nt = jnp.stack(
        [
            jnp.concatenate(
                [chains_to_tiles(noise[t, r])[0] for r in range(R)], axis=0
            )
            for t in range(int(n_steps))
        ]
    )
    if n_sweeps == 0:
        ut = jnp.zeros((1, R - 1, 8, lanes), jnp.float32)
    else:
        ut = jnp.stack(
            [
                jnp.stack(
                    [chains_to_tiles(swap_uniform[s, r][:, None])[0]
                     for r in range(R - 1)]
                )
                for s in range(n_sweeps)
            ]
        )
    return nt, ut


def pt_langevin_chain(
    replicas: Array,
    means: Array,
    n_steps: int,
    step_size: float,
    noise_scale: float,
    betas: Sequence[float],
    swap_every: int,
    *,
    scale: float = 1.0,
    log_weights: Optional[Array] = None,
    precision: Optional[Array] = None,
    seed: Union[int, Array] = 0,
    clamp: Optional[Tuple[float, float]] = None,
    noise: Optional[Array] = None,
    swap_uniform: Optional[Array] = None,
    block_chains: int = 1 << 20,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Full n-step parallel-tempered Langevin ladder in ONE kernel launch.

    ``replicas``: ``(R, B, d)`` — the full ladder state (replica 0 cold);
    ``betas``: the R static inverse temperatures (baked into the trace);
    remaining target arguments as :func:`~torchebm_tpu.ops.fused_langevin.mixture_langevin_chain`.
    Every ``swap_every`` steps an even/odd adjacent-pair exchange sweep runs
    in-kernel (phase alternates per sweep for R > 2; the single pair is
    attempted every sweep for R == 2, matching
    ``samplers/parallel_tempering.py::step``). Returns ``(ladder, acc)``:
    the final ``(R, B, d)`` state and the mean accept probability of the
    last attempted sweep, averaged over grid blocks
    (``swap_acceptance_rate``; 0.0 on the injected-noise parity path).

    ``noise``: ``(n_steps, R, B, d)`` Gaussian increments and ``swap_uniform``:
    ``(n_sweeps, R-1, B)`` exchange uniforms replace the in-kernel PRNG for
    exact-parity testing (both or neither).
    """
    R, n_chains, dim = replicas.shape
    betas, xt, lanes, packed, n_comp = _validate_and_pack(
        replicas, means, betas, swap_every, noise, swap_uniform,
        log_weights, precision, "pt_langevin_chain",
    )
    n_sweeps = int(n_steps) // int(swap_every)
    staged = 0 if noise is None else int(n_steps) + n_sweeps
    block = _mixture_block(lanes, R * dim, block_chains, n_staged=staged)
    rows = R * 8 * dim
    grid = (lanes // block,)
    kw = dict(
        n_steps=int(n_steps),
        swap_every=int(swap_every),
        step_size=float(step_size),
        noise_coef=float(noise_scale) * math.sqrt(2.0 * float(step_size)),
        betas=betas,
        inv_var=1.0 / float(scale) ** 2,
        n_components=n_comp,
        d=int(dim),
        clamp=(float(clamp[0]), float(clamp[1])) if clamp is not None else None,
    )
    state_spec = pl.BlockSpec((rows, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    means_spec = pl.BlockSpec(packed.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_shape = (
        jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
        jax.ShapeDtypeStruct((1, grid[0]), jnp.float32),
    )
    out_specs = (
        state_spec,
        pl.BlockSpec((1, 1), lambda i: (0, i), memory_space=pltpu.SMEM),
    )

    if noise is None:
        final, acc = pl.pallas_call(
            functools.partial(_pt_chain_kernel, kw=kw),
            out_shape=out_shape,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                state_spec,
                means_spec,
            ],
            out_specs=out_specs,
            interpret=interpret,
        )(jnp.asarray(seed, jnp.int32).reshape(1), xt, packed)
    else:
        nt, ut = _stage_injected(
            noise, swap_uniform, int(n_steps), n_sweeps, R, n_chains, dim, lanes
        )
        noise_spec = pl.BlockSpec(
            (int(n_steps), rows, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        )
        swapu_spec = pl.BlockSpec(
            (max(n_sweeps, 1), R - 1, 8, block),
            lambda i: (0, 0, 0, i),
            memory_space=pltpu.VMEM,
        )
        final, acc = pl.pallas_call(
            functools.partial(_pt_chain_noise_kernel, kw=kw),
            out_shape=out_shape,
            grid=grid,
            in_specs=[state_spec, means_spec, noise_spec, swapu_spec],
            out_specs=out_specs,
            interpret=interpret,
        )(xt, packed, nt, ut)
    ladder = jnp.stack(
        [
            tiles_to_chains(final[r * 8 * dim : (r + 1) * 8 * dim], n_chains, dim)
            for r in range(R)
        ]
    )
    return ladder, jnp.mean(acc)


def pt_langevin_chain_trajectory(
    replicas: Array,
    means: Array,
    n_steps: int,
    step_size: float,
    noise_scale: float,
    betas: Sequence[float],
    swap_every: int,
    *,
    thin: int = 1,
    scale: float = 1.0,
    log_weights: Optional[Array] = None,
    precision: Optional[Array] = None,
    seed: Union[int, Array] = 0,
    clamp: Optional[Tuple[float, float]] = None,
    noise: Optional[Array] = None,
    swap_uniform: Optional[Array] = None,
    block_chains: int = 1 << 20,
    interpret: bool = False,
) -> Tuple[Array, Array, Array]:
    """PT ladder chain recording every ``thin``-th COLD state.

    Same semantics as :func:`pt_langevin_chain` plus an in-kernel DMA of the
    cold (replica 0) state after every ``thin``-th transition — post-swap on
    exchange steps, matching the library loop's kept carry. Returns
    ``(traj, ladder, acc)`` with ``traj`` of shape ``(n_steps//thin,
    n_chains, d)``.
    """
    R, n_chains, dim = replicas.shape
    if thin < 1:
        raise ValueError("thin must be >= 1")
    n_kept = int(n_steps) // int(thin)
    if n_kept < 1:
        raise ValueError("n_steps // thin must be >= 1 for trajectory output")
    betas, xt, lanes, packed, n_comp = _validate_and_pack(
        replicas, means, betas, swap_every, noise, swap_uniform,
        log_weights, precision, "pt_langevin_chain_trajectory",
    )
    n_sweeps = int(n_steps) // int(swap_every)
    staged = 0 if noise is None else int(n_steps) + n_sweeps
    block = _mixture_block(lanes, R * dim, block_chains, n_staged=staged + 1)
    rows_all = R * 8 * dim
    rows_cold = 8 * dim
    grid = (lanes // block,)
    kw = dict(
        n_steps=int(n_steps),
        swap_every=int(swap_every),
        step_size=float(step_size),
        noise_coef=float(noise_scale) * math.sqrt(2.0 * float(step_size)),
        betas=betas,
        inv_var=1.0 / float(scale) ** 2,
        n_components=n_comp,
        d=int(dim),
        clamp=(float(clamp[0]), float(clamp[1])) if clamp is not None else None,
    )
    state_spec = pl.BlockSpec(
        (rows_all, block), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    means_spec = pl.BlockSpec(packed.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_shape = (
        jax.ShapeDtypeStruct((rows_all, lanes), jnp.float32),
        jax.ShapeDtypeStruct((1, grid[0]), jnp.float32),
        jax.ShapeDtypeStruct((n_kept, rows_cold, lanes), jnp.float32),
    )
    out_specs = (
        state_spec,
        pl.BlockSpec((1, 1), lambda i: (0, i), memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    )
    scratch = [
        pltpu.VMEM((rows_cold, block), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
    ]

    if noise is None:
        final, acc, traj = pl.pallas_call(
            functools.partial(
                _pt_chain_traj_kernel, kw=kw, thin=int(thin), block=int(block)
            ),
            out_shape=out_shape,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                state_spec,
                means_spec,
            ],
            out_specs=out_specs,
            scratch_shapes=scratch,
            interpret=interpret,
        )(jnp.asarray(seed, jnp.int32).reshape(1), xt, packed)
    else:
        nt, ut = _stage_injected(
            noise, swap_uniform, int(n_steps), n_sweeps, R, n_chains, dim, lanes
        )
        noise_spec = pl.BlockSpec(
            (int(n_steps), rows_all, block),
            lambda i: (0, 0, i),
            memory_space=pltpu.VMEM,
        )
        swapu_spec = pl.BlockSpec(
            (max(n_sweeps, 1), R - 1, 8, block),
            lambda i: (0, 0, 0, i),
            memory_space=pltpu.VMEM,
        )
        final, acc, traj = pl.pallas_call(
            functools.partial(
                _pt_chain_traj_noise_kernel, kw=kw, thin=int(thin), block=int(block)
            ),
            out_shape=out_shape,
            grid=grid,
            in_specs=[state_spec, means_spec, noise_spec, swapu_spec],
            out_specs=out_specs,
            scratch_shapes=scratch,
            interpret=interpret,
        )(xt, packed, nt, ut)
    ladder = jnp.stack(
        [
            tiles_to_chains(final[r * 8 * dim : (r + 1) * 8 * dim], n_chains, dim)
            for r in range(R)
        ]
    )
    traj_chains = jax.vmap(lambda t: tiles_to_chains(t, n_chains, dim))(traj)
    return traj_chains, ladder, jnp.mean(acc)

r"""Pallas TPU kernel: whole-chain HMC on mixtures / full-covariance Gaussians.

Beyond-reference perf feature (the reference's kernel layer stops at Langevin,
``torchebm/cuda/fused_langevin.py``): an entire HMC run — momentum refresh,
``n_leapfrog`` leapfrog steps with force reuse, Metropolis test — for every
draw of every chain executes in ONE kernel launch with the state resident in
VMEM/registers. This is BASELINE config 2's throughput path on the 8gaussians
/ analytic mixture energies.

Layout matches :mod:`torchebm_tpu.ops.fused_langevin`: chains spread over
``(8·d, lanes)`` blocks (rows ``8i:8(i+1)`` = coordinate i) so every VPU op
runs at full (8, 128) sublane×lane utilization; means/log-weights ride in a
packed ``(round8(d+1), K_pad)`` tile; normals come from both Box–Muller
outputs of the hardware PRNG, uniforms from one 24-bit draw. An
injected-randomness variant (``noise=`` momenta + ``uniforms=`` MH draws)
gives the exact-parity CI path on CPU interpret mode.

Targets: d-dim isotropic Gaussian mixtures (``pack_mixture_params``) or a
full-covariance Gaussian via ``precision=`` (``pack_gaussian_params``, d ≤ 32
— the correlated-Gaussian ESS benchmark workload rides this path after
dual-averaging warmup). The ``*_trajectory`` variant DMAs every ``thin``-th
post-MH draw to an HBM-resident trajectory so ``return_trajectory=True``
R̂/ESS runs stay on the kernel. Numerical guards mirror the library sampler
(``samplers/hmc.py``): the Hamiltonian difference is clamped to ±50 before
``exp``.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_langevin import (
    _LANE,
    _mixture_block,
    _pack_target,
    _tile_grad_logp,
    _normal_tiles,
    _round_up,
    _split_coords,
    _uniform_from_bits,
    chains_to_tiles,
    tiles_to_chains,
)

Array = jax.Array

__all__ = ["mixture_hmc_chain", "mixture_hmc_chain_trajectory"]


def _hmc_draw(x, eps, u, means, *, n_leapfrog, step_size, inv_var, n_components,
              d, use_mass):
    """One MH-corrected HMC draw on tile lists; returns (new_x, accept_prob).

    ``eps`` are standard-normal tiles; with ``use_mass`` the per-dimension
    diagonal masses live in row ``d+1`` of the params tile and the library
    semantics apply (``samplers/hmc.py:119-133``): momentum ``p = ε√m``,
    kinetic ``½Σp²/m``, drift ``q += h·p/m``.
    """
    h = step_size
    if use_mass:
        msqrt = [jnp.sqrt(means[d + 1, i]) for i in range(d)]
        minv = [1.0 / means[d + 1, i] for i in range(d)]
    else:
        msqrt = [1.0] * d
        minv = [1.0] * d
    p = [eps[i] * msqrt[i] for i in range(d)]
    coords = _split_coords(x, d)
    grads, lp0 = _tile_grad_logp(coords, means, inv_var, n_components, d)
    k0 = p[0] * p[0] * minv[0]
    for i in range(1, d):
        k0 = k0 + p[i] * p[i] * minv[i]
    h0 = -lp0 + 0.5 * k0

    # leapfrog with force reuse: half-kick, drift, full gradient, half-kick
    def lf(_, s):
        q, mom, g = s[:d], s[d : 2 * d], s[2 * d :]
        mom = [mom[i] - 0.5 * h * g[i] for i in range(d)]
        q = [q[i] + h * mom[i] * minv[i] for i in range(d)]
        ng, _ = _tile_grad_logp(list(q), means, inv_var, n_components, d)
        mom = [mom[i] - 0.5 * h * ng[i] for i in range(d)]
        return tuple(q) + tuple(mom) + tuple(ng)

    state = jax.lax.fori_loop(
        0, n_leapfrog, lf, tuple(coords) + tuple(p) + tuple(grads)
    )
    q, mom = state[:d], state[d : 2 * d]
    _, lp1 = _tile_grad_logp(list(q), means, inv_var, n_components, d)
    k1 = mom[0] * mom[0] * minv[0]
    for i in range(1, d):
        k1 = k1 + mom[i] * mom[i] * minv[i]
    h1 = -lp1 + 0.5 * k1
    accept_prob = jnp.minimum(jnp.exp(jnp.clip(h0 - h1, -50.0, 50.0)), 1.0)
    take = u < accept_prob
    new_x = jnp.concatenate(
        [jnp.where(take, q[i], coords[i]) for i in range(d)], axis=0
    )
    return new_x, accept_prob


def _mixture_hmc_kernel(seed_ref, x_ref, means_ref, out_ref, acc_ref, *,
                        n_draws, n_leapfrog, step_size, inv_var, n_components,
                        d, use_mass):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    means = means_ref[...]
    tile = (8, x_ref.shape[1])

    def draw(_, carry):
        x, acc_sum = carry
        eps = _normal_tiles(tile, d)
        u = _uniform_from_bits(tile)
        new_x, accept_prob = _hmc_draw(
            x, eps, u, means, n_leapfrog=n_leapfrog, step_size=step_size,
            inv_var=inv_var, n_components=n_components, d=d, use_mass=use_mass,
        )
        return new_x, acc_sum + accept_prob

    x_f, acc = jax.lax.fori_loop(
        0, n_draws, draw, (x_ref[...], jnp.zeros(tile, jnp.float32))
    )
    out_ref[...] = x_f
    acc_ref[...] = acc * (1.0 / n_draws)


def _mixture_hmc_noise_kernel(x_ref, means_ref, noise_ref, unif_ref, out_ref,
                              acc_ref, *, n_draws, n_leapfrog, step_size,
                              inv_var, n_components, d, use_mass):
    """Injected-randomness variant: exact-parity CI path (no in-kernel PRNG).

    ``noise_ref`` holds standard normals; the mass scaling p = ε√m happens
    in-kernel so the parity reference mirrors the library's momentum refresh.
    """
    means = means_ref[...]
    tile = (8, x_ref.shape[1])

    def draw(t, carry):
        x, acc_sum = carry
        pt = noise_ref[pl.ds(t, 1)][0]
        eps = _split_coords(pt, d)
        u = unif_ref[pl.ds(t, 1)][0]
        new_x, accept_prob = _hmc_draw(
            x, eps, u, means, n_leapfrog=n_leapfrog, step_size=step_size,
            inv_var=inv_var, n_components=n_components, d=d, use_mass=use_mass,
        )
        return new_x, acc_sum + accept_prob

    x_f, acc = jax.lax.fori_loop(
        0, n_draws, draw, (x_ref[...], jnp.zeros(tile, jnp.float32))
    )
    out_ref[...] = x_f
    acc_ref[...] = acc * (1.0 / n_draws)


def _mixture_hmc_traj_kernel(seed_ref, x_ref, means_ref, out_ref, acc_ref,
                             traj_ref, scratch_ref, sem_ref, *, n_draws, thin,
                             n_leapfrog, step_size, inv_var, n_components, d,
                             use_mass, block):
    """HMC run emitting every ``thin``-th post-MH state to HBM (the R̂/ESS
    workload; staging pattern as in
    :func:`~torchebm_tpu.ops.fused_langevin._mixture_chain_traj_kernel`)."""
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    means = means_ref[...]
    tile = (8, x_ref.shape[1])
    col0 = pl.program_id(0) * block

    def draw(i, carry):
        x, acc_sum = carry
        eps = _normal_tiles(tile, d)
        u = _uniform_from_bits(tile)
        new_x, accept_prob = _hmc_draw(
            x, eps, u, means, n_leapfrog=n_leapfrog, step_size=step_size,
            inv_var=inv_var, n_components=n_components, d=d, use_mass=use_mass,
        )

        @pl.when((i + 1) % thin == 0)
        def _():
            k = (i + 1) // thin - 1
            scratch_ref[...] = new_x
            dma = pltpu.make_async_copy(
                scratch_ref, traj_ref.at[k, :, pl.ds(col0, block)], sem_ref
            )
            dma.start()
            dma.wait()

        return new_x, acc_sum + accept_prob

    x_f, acc = jax.lax.fori_loop(
        0, n_draws, draw, (x_ref[...], jnp.zeros(tile, jnp.float32))
    )
    out_ref[...] = x_f
    acc_ref[...] = acc * (1.0 / n_draws)


def _mixture_hmc_traj_noise_kernel(x_ref, means_ref, noise_ref, unif_ref,
                                   out_ref, acc_ref, traj_ref, scratch_ref,
                                   sem_ref, *, n_draws, thin, n_leapfrog,
                                   step_size, inv_var, n_components, d,
                                   use_mass, block):
    """Injected-randomness variant of :func:`_mixture_hmc_traj_kernel`."""
    means = means_ref[...]
    tile = (8, x_ref.shape[1])
    col0 = pl.program_id(0) * block

    def draw(t, carry):
        x, acc_sum = carry
        eps = _split_coords(noise_ref[pl.ds(t, 1)][0], d)
        u = unif_ref[pl.ds(t, 1)][0]
        new_x, accept_prob = _hmc_draw(
            x, eps, u, means, n_leapfrog=n_leapfrog, step_size=step_size,
            inv_var=inv_var, n_components=n_components, d=d, use_mass=use_mass,
        )

        @pl.when((t + 1) % thin == 0)
        def _():
            k = (t + 1) // thin - 1
            scratch_ref[...] = new_x
            dma = pltpu.make_async_copy(
                scratch_ref, traj_ref.at[k, :, pl.ds(col0, block)], sem_ref
            )
            dma.start()
            dma.wait()

        return new_x, acc_sum + accept_prob

    x_f, acc = jax.lax.fori_loop(
        0, n_draws, draw, (x_ref[...], jnp.zeros(tile, jnp.float32))
    )
    out_ref[...] = x_f
    acc_ref[...] = acc * (1.0 / n_draws)


def mixture_hmc_chain_trajectory(
    x0: Array,
    means: Array,
    n_draws: int,
    step_size: float,
    n_leapfrog: int = 10,
    *,
    thin: int = 1,
    scale: float = 1.0,
    log_weights: Optional[Array] = None,
    precision: Optional[Array] = None,
    mass: Optional[Array] = None,
    seed: int = 0,
    noise: Optional[Array] = None,
    uniforms: Optional[Array] = None,
    block_chains: int = 1 << 20,
    interpret: bool = False,
) -> Tuple[Array, Array, Array]:
    """Whole HMC run recording every ``thin``-th draw (the R̂/ESS workload).

    Returns ``(traj, final, accept)``: ``traj`` of shape
    ``(n_draws//thin, n_chains, d)`` (post-MH states after draws
    ``thin, 2·thin, …``), ``final`` the state after all draws, ``accept``
    the per-chain mean acceptance. ``precision=`` selects the
    full-covariance Gaussian target; ``mass`` as in :func:`mixture_hmc_chain`.
    """
    n_chains, dim = x0.shape
    k, kd = means.shape
    if kd != dim:
        raise ValueError(f"means dim {kd} != state dim {dim}")
    if dim > 64 or k * dim > 1024:
        raise ValueError(
            "mixture_hmc_chain_trajectory unrolls K components x d dims "
            f"in-kernel; K*d={k * dim}, d={dim} exceeds the supported size"
        )
    if thin < 1:
        raise ValueError("thin must be >= 1")
    n_kept = int(n_draws) // int(thin)
    if n_kept < 1:
        raise ValueError("n_draws // thin must be >= 1 for trajectory output")
    if (noise is None) != (uniforms is None):
        raise ValueError("noise and uniforms must be supplied together")

    xt, padded = chains_to_tiles(x0)
    lanes = padded // 8
    if mass is not None:
        mass = jnp.broadcast_to(jnp.asarray(mass, jnp.float32), (dim,))
    packed, n_comp = _pack_target(means, log_weights, precision, mass=mass)
    block = _mixture_block(
        lanes, dim, block_chains,
        n_staged=(0 if noise is None else int(n_draws) + 1) + 1,
    )

    kw = dict(
        n_draws=int(n_draws),
        thin=int(thin),
        n_leapfrog=int(n_leapfrog),
        step_size=float(step_size),
        inv_var=1.0 / float(scale) ** 2,
        n_components=n_comp,
        d=int(dim),
        use_mass=mass is not None,
        block=int(block),
    )
    rows = 8 * dim
    grid = (lanes // block,)
    state_spec = pl.BlockSpec((rows, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    means_spec = pl.BlockSpec(packed.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((8, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_shape = (
        jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
        jax.ShapeDtypeStruct((8, lanes), jnp.float32),
        jax.ShapeDtypeStruct((n_kept, rows, lanes), jnp.float32),
    )
    out_specs = (state_spec, acc_spec, pl.BlockSpec(memory_space=pl.ANY))
    scratch = [
        pltpu.VMEM((rows, block), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
    ]
    if noise is None:
        out, acc, traj = pl.pallas_call(
            functools.partial(_mixture_hmc_traj_kernel, **kw),
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
        )(jnp.asarray([seed], jnp.int32), xt, packed)
    else:
        if noise.shape != (n_draws, n_chains, dim):
            raise ValueError(
                f"noise must have shape {(n_draws, n_chains, dim)}, got {noise.shape}"
            )
        if uniforms.shape != (n_draws, n_chains):
            raise ValueError(
                f"uniforms must have shape {(n_draws, n_chains)}, got {uniforms.shape}"
            )
        nt = jnp.stack([chains_to_tiles(noise[t])[0] for t in range(n_draws)])
        ut = jnp.stack(
            [chains_to_tiles(uniforms[t][:, None])[0] for t in range(n_draws)]
        )
        out, acc, traj = pl.pallas_call(
            functools.partial(_mixture_hmc_traj_noise_kernel, **kw),
            out_shape=out_shape,
            grid=grid,
            in_specs=[
                state_spec,
                means_spec,
                pl.BlockSpec(
                    (n_draws, rows, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (n_draws, 8, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=out_specs,
            scratch_shapes=scratch,
            interpret=interpret,
        )(xt, packed, nt, ut)
    traj_chains = jax.vmap(lambda t: tiles_to_chains(t, n_chains, dim))(traj)
    return (
        traj_chains,
        tiles_to_chains(out, n_chains, dim),
        acc.reshape(padded)[:n_chains],
    )


def mixture_hmc_chain(
    x0: Array,
    means: Array,
    n_draws: int,
    step_size: float,
    n_leapfrog: int = 10,
    *,
    scale: float = 1.0,
    log_weights: Optional[Array] = None,
    precision: Optional[Array] = None,
    mass: Optional[Array] = None,
    seed: int = 0,
    noise: Optional[Array] = None,
    uniforms: Optional[Array] = None,
    block_chains: int = 1 << 20,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Full HMC run on a d-dim isotropic Gaussian mixture in one kernel launch.

    ``x0``: (n_chains, d); ``means``: (K, d). Returns ``(samples, accept)``
    where ``samples`` is the final state (n_chains, d) and ``accept`` the
    per-chain mean acceptance probability over all draws (n_chains,).
    ``mass`` is an optional scalar or (d,) diagonal mass matrix with the
    library semantics (p = ε√m, K = ½Σp²/m, q += h·p/m) — the output of
    ``HamiltonianMonteCarlo.warmup(adapt_mass=True)`` stays on this fast
    path. ``noise`` (standard-normal momenta seeds, shape
    ``(n_draws, n_chains, d)``) together with ``uniforms`` (MH draws, shape
    ``(n_draws, n_chains)``) replaces the in-kernel PRNG for exact-parity CI
    tests.
    """
    n_chains, dim = x0.shape
    k, kd = means.shape
    if kd != dim:
        raise ValueError(f"means dim {kd} != state dim {dim}")
    if dim > 64 or k * dim > 1024:
        raise ValueError(
            "mixture_hmc_chain unrolls K components x d dims in-kernel; "
            f"K*d={k * dim}, d={dim} exceeds the supported size (d<=64, K*d<=1024)"
        )
    if (noise is None) != (uniforms is None):
        raise ValueError("noise and uniforms must be supplied together")

    xt, padded = chains_to_tiles(x0)
    lanes = padded // 8
    if mass is not None:
        mass = jnp.broadcast_to(jnp.asarray(mass, jnp.float32), (dim,))
    packed, n_comp = _pack_target(means, log_weights, precision, mass=mass)
    # injected-randomness CI path stages (n_draws, 8d+8, block) in VMEM too
    block = _mixture_block(
        lanes, dim, block_chains, n_staged=0 if noise is None else int(n_draws) + 1
    )

    kw = dict(
        n_draws=int(n_draws),
        n_leapfrog=int(n_leapfrog),
        step_size=float(step_size),
        inv_var=1.0 / float(scale) ** 2,
        n_components=n_comp,
        d=int(dim),
        use_mass=mass is not None,
    )
    rows = 8 * dim
    state_spec = pl.BlockSpec((rows, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    means_spec = pl.BlockSpec(packed.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((8, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_shape = (
        jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
        jax.ShapeDtypeStruct((8, lanes), jnp.float32),
    )
    if noise is None:
        out, acc = pl.pallas_call(
            functools.partial(_mixture_hmc_kernel, **kw),
            out_shape=out_shape,
            grid=(lanes // block,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                state_spec,
                means_spec,
            ],
            out_specs=(state_spec, acc_spec),
            interpret=interpret,
        )(jnp.asarray([seed], jnp.int32), xt, packed)
    else:
        if noise.shape != (n_draws, n_chains, dim):
            raise ValueError(
                f"noise must have shape {(n_draws, n_chains, dim)}, got {noise.shape}"
            )
        if uniforms.shape != (n_draws, n_chains):
            raise ValueError(
                f"uniforms must have shape {(n_draws, n_chains)}, got {uniforms.shape}"
            )
        nt = jnp.stack([chains_to_tiles(noise[t])[0] for t in range(n_draws)])
        ut = jnp.stack(
            [chains_to_tiles(uniforms[t][:, None])[0] for t in range(n_draws)]
        )
        out, acc = pl.pallas_call(
            functools.partial(_mixture_hmc_noise_kernel, **kw),
            out_shape=out_shape,
            grid=(lanes // block,),
            in_specs=[
                state_spec,
                means_spec,
                pl.BlockSpec(
                    (n_draws, rows, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (n_draws, 8, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=(state_spec, acc_spec),
            interpret=interpret,
        )(xt, packed, nt, ut)
    samples = tiles_to_chains(out, n_chains, dim)
    return samples, acc.reshape(padded)[:n_chains]


def _selftest():  # pragma: no cover - exercised via `python -m`
    import time

    import numpy as np

    from ..core.energies import GaussianMixtureEnergy
    from ..samplers import HamiltonianMonteCarlo

    key = jax.random.PRNGKey(0)
    mix = GaussianMixtureEnergy.eight_gaussians()
    n, draws, lf = 10_000, 500, 8
    x0 = mix.sample(key, n)

    samples, acc = mixture_hmc_chain(
        x0, mix.means, draws, 0.3, lf, scale=float(mix.scale), seed=3
    )
    r = float(jnp.mean(jnp.linalg.norm(samples, axis=-1)))
    a = float(jnp.mean(acc))
    print(f"ring radius {r:.3f} (expect ~4), mean accept {a:.3f}")

    def timed(fn, units):
        np.asarray(fn(2_000))
        t0 = time.perf_counter(); np.asarray(fn(2_000)); t1 = time.perf_counter()
        np.asarray(fn(200)); t2 = time.perf_counter(); np.asarray(fn(200)); t3 = time.perf_counter()
        per = ((t1 - t0) - (t3 - t2)) / 1_800
        return per

    hmc = HamiltonianMonteCarlo(mix, step_size=0.3, n_leapfrog_steps=lf)
    per_lib = timed(lambda d: hmc.sample(jax.random.fold_in(key, d), x=x0, n_steps=d), draws)
    per_pal = timed(
        lambda d: mixture_hmc_chain(x0, mix.means, d, 0.3, lf, scale=float(mix.scale))[0],
        draws,
    )
    print(f"[{n} chains, {lf} leapfrog] library scan: {per_lib*1e6:.2f} us/draw | "
          f"pallas: {per_pal*1e6:.2f} us/draw | speedup {per_lib/per_pal:.1f}x")


if __name__ == "__main__":  # pragma: no cover
    _selftest()

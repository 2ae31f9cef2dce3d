r"""Pallas TPU kernel: whole-chain MALA on mixtures / full-covariance Gaussians.

Beyond-reference perf feature (the reference's kernel layer stops at
unadjusted Langevin, ``torchebm/cuda/fused_langevin.py``; MALA itself is a
build addition, ``samplers/mala.py``): every exact Metropolis-adjusted
Langevin transition — proposal, forward/reverse proposal densities, MH test —
runs VMEM-resident in ONE kernel launch. The mixture machinery
(:func:`~torchebm_tpu.ops.fused_langevin._mixture_grad_logp`) already returns
the unnormalized log-density, so the MH ratio costs one extra gradient+logp
evaluation at the proposal.

One transition (library semantics, ``samplers/mala.py:49-71``; the energy
constant cancels in the ratio, so the kernel uses logp = −U + c):

.. math::
    y = x - \eta \nabla U(x) + \sqrt{2\eta}\,\varepsilon, \qquad
    \log q(b \mid a) = -\lVert b - a + \eta \nabla U(a)\rVert^2 / (4\eta)

    \alpha = \min(1, e^{\,\text{clip}(\log p(y) - \log p(x)
    + \log q(x|y) - \log q(y|x),\ \pm 50)})

Targets: d-dim isotropic Gaussian mixtures (``pack_mixture_params``) or a
full-covariance Gaussian via ``precision=`` (``pack_gaussian_params``, d ≤ 32
— the correlated-Gaussian ESS benchmark workload). The ``*_trajectory``
variant DMAs every ``thin``-th post-MH state to an HBM-resident trajectory
(see ``fused_langevin``), so ``return_trajectory=True`` R̂/ESS runs stay on
the kernel. Layout and the injected-randomness CI path match the other chain
kernels.
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
    _mixture_block,
    _pack_target,
    _tile_grad_logp,
    _normal_tiles,
    _split_coords,
    _uniform_from_bits,
    chains_to_tiles,
    tiles_to_chains,
)

Array = jax.Array

__all__ = ["mixture_mala_chain", "mixture_mala_chain_trajectory"]


def _mala_transition(x, eps, u, means, *, step_size, inv_var, n_components, d):
    """One MALA transition on tile lists; returns (new_x, accept_prob)."""
    eta = step_size
    noise_coef = math.sqrt(2.0 * eta)
    coords = _split_coords(x, d)
    gx, lp_x = _tile_grad_logp(coords, means, inv_var, n_components, d)
    y = [coords[i] - eta * gx[i] + noise_coef * eps[i] for i in range(d)]
    gy, lp_y = _tile_grad_logp(y, means, inv_var, n_components, d)

    # log q(x|y) - log q(y|x): squared proposal residuals, accumulated per dim
    sq_xy = None  # ||x - y + eta*grad(y)||^2
    sq_yx = None  # ||y - x + eta*grad(x)||^2
    for i in range(d):
        dxy = coords[i] - y[i] + eta * gy[i]
        dyx = y[i] - coords[i] + eta * gx[i]
        sq_xy = dxy * dxy if sq_xy is None else sq_xy + dxy * dxy
        sq_yx = dyx * dyx if sq_yx is None else sq_yx + dyx * dyx

    log_ratio = (lp_y - lp_x) + (sq_yx - sq_xy) / (4.0 * eta)
    accept_prob = jnp.minimum(jnp.exp(jnp.clip(log_ratio, -50.0, 50.0)), 1.0)
    take = u < accept_prob
    new_x = jnp.concatenate(
        [jnp.where(take, y[i], coords[i]) for i in range(d)], axis=0
    )
    return new_x, accept_prob


def _mixture_mala_kernel(seed_ref, x_ref, means_ref, out_ref, acc_ref, *,
                         n_steps, step_size, inv_var, n_components, d):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    means = means_ref[...]
    tile = (8, x_ref.shape[1])

    def body(_, carry):
        x, acc_sum = carry
        eps = _normal_tiles(tile, d)
        u = _uniform_from_bits(tile)
        new_x, accept_prob = _mala_transition(
            x, eps, u, means, step_size=step_size, inv_var=inv_var,
            n_components=n_components, d=d,
        )
        return new_x, acc_sum + accept_prob

    x_f, acc = jax.lax.fori_loop(
        0, n_steps, body, (x_ref[...], jnp.zeros(tile, jnp.float32))
    )
    out_ref[...] = x_f
    acc_ref[...] = acc * (1.0 / n_steps)


def _mixture_mala_noise_kernel(x_ref, means_ref, noise_ref, unif_ref, out_ref,
                               acc_ref, *, n_steps, step_size, inv_var,
                               n_components, d):
    """Injected-randomness variant: exact-parity CI path (no in-kernel PRNG)."""
    means = means_ref[...]
    tile = (8, x_ref.shape[1])

    def body(t, carry):
        x, acc_sum = carry
        et = noise_ref[pl.ds(t, 1)][0]
        eps = _split_coords(et, d)
        u = unif_ref[pl.ds(t, 1)][0]
        new_x, accept_prob = _mala_transition(
            x, eps, u, means, step_size=step_size, inv_var=inv_var,
            n_components=n_components, d=d,
        )
        return new_x, acc_sum + accept_prob

    x_f, acc = jax.lax.fori_loop(
        0, n_steps, body, (x_ref[...], jnp.zeros(tile, jnp.float32))
    )
    out_ref[...] = x_f
    acc_ref[...] = acc * (1.0 / n_steps)


def _mixture_mala_traj_kernel(seed_ref, x_ref, means_ref, out_ref, acc_ref,
                              traj_ref, scratch_ref, sem_ref, *, n_steps, thin,
                              step_size, inv_var, n_components, d, block):
    """MALA chain emitting every ``thin``-th state to HBM (the R̂/ESS
    workload; staging pattern as in
    :func:`~torchebm_tpu.ops.fused_langevin._mixture_chain_traj_kernel`)."""
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    means = means_ref[...]
    tile = (8, x_ref.shape[1])
    col0 = pl.program_id(0) * block

    def body(i, carry):
        x, acc_sum = carry
        eps = _normal_tiles(tile, d)
        u = _uniform_from_bits(tile)
        new_x, accept_prob = _mala_transition(
            x, eps, u, means, step_size=step_size, inv_var=inv_var,
            n_components=n_components, d=d,
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
        0, n_steps, body, (x_ref[...], jnp.zeros(tile, jnp.float32))
    )
    out_ref[...] = x_f
    acc_ref[...] = acc * (1.0 / n_steps)


def _mixture_mala_traj_noise_kernel(x_ref, means_ref, noise_ref, unif_ref,
                                    out_ref, acc_ref, traj_ref, scratch_ref,
                                    sem_ref, *, n_steps, thin, step_size,
                                    inv_var, n_components, d, block):
    """Injected-randomness variant of :func:`_mixture_mala_traj_kernel`."""
    means = means_ref[...]
    tile = (8, x_ref.shape[1])
    col0 = pl.program_id(0) * block

    def body(t, carry):
        x, acc_sum = carry
        eps = _split_coords(noise_ref[pl.ds(t, 1)][0], d)
        u = unif_ref[pl.ds(t, 1)][0]
        new_x, accept_prob = _mala_transition(
            x, eps, u, means, step_size=step_size, inv_var=inv_var,
            n_components=n_components, d=d,
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
        0, n_steps, body, (x_ref[...], jnp.zeros(tile, jnp.float32))
    )
    out_ref[...] = x_f
    acc_ref[...] = acc * (1.0 / n_steps)


def mixture_mala_chain(
    x0: Array,
    means: Array,
    n_steps: int,
    step_size: float,
    *,
    scale: float = 1.0,
    log_weights: Optional[Array] = None,
    precision: Optional[Array] = None,
    seed: int = 0,
    noise: Optional[Array] = None,
    uniforms: Optional[Array] = None,
    block_chains: int = 1 << 20,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Full n-step MALA chain on a d-dim isotropic Gaussian mixture in one kernel.

    ``x0``: (n_chains, d); ``means``: (K, d). Returns ``(samples, accept)``:
    the final state and the per-chain mean acceptance probability. ``noise``
    (proposal normals, shape ``(n_steps, n_chains, d)``) together with
    ``uniforms`` (MH draws, shape ``(n_steps, n_chains)``) replaces the
    in-kernel PRNG for exact-parity CI tests.
    """
    n_chains, dim = x0.shape
    k, kd = means.shape
    if kd != dim:
        raise ValueError(f"means dim {kd} != state dim {dim}")
    if dim > 64 or k * dim > 1024:
        raise ValueError(
            "mixture_mala_chain unrolls K components x d dims in-kernel; "
            f"K*d={k * dim}, d={dim} exceeds the supported size (d<=64, K*d<=1024)"
        )
    if (noise is None) != (uniforms is None):
        raise ValueError("noise and uniforms must be supplied together")

    xt, padded = chains_to_tiles(x0)
    lanes = padded // 8
    packed, n_comp = _pack_target(means, log_weights, precision)
    # injected-randomness CI path stages (n_steps, 8d+8, block) in VMEM too
    block = _mixture_block(
        lanes, dim, block_chains, n_staged=0 if noise is None else int(n_steps) + 1
    )

    kw = dict(
        n_steps=int(n_steps),
        step_size=float(step_size),
        inv_var=1.0 / float(scale) ** 2,
        n_components=n_comp,
        d=int(dim),
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
            functools.partial(_mixture_mala_kernel, **kw),
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
        if noise.shape != (n_steps, n_chains, dim):
            raise ValueError(
                f"noise must have shape {(n_steps, n_chains, dim)}, got {noise.shape}"
            )
        if uniforms.shape != (n_steps, n_chains):
            raise ValueError(
                f"uniforms must have shape {(n_steps, n_chains)}, got {uniforms.shape}"
            )
        nt = jnp.stack([chains_to_tiles(noise[t])[0] for t in range(n_steps)])
        ut = jnp.stack(
            [chains_to_tiles(uniforms[t][:, None])[0] for t in range(n_steps)]
        )
        out, acc = pl.pallas_call(
            functools.partial(_mixture_mala_noise_kernel, **kw),
            out_shape=out_shape,
            grid=(lanes // block,),
            in_specs=[
                state_spec,
                means_spec,
                pl.BlockSpec(
                    (n_steps, rows, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (n_steps, 8, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=(state_spec, acc_spec),
            interpret=interpret,
        )(xt, packed, nt, ut)
    samples = tiles_to_chains(out, n_chains, dim)
    return samples, acc.reshape(padded)[:n_chains]


def mixture_mala_chain_trajectory(
    x0: Array,
    means: Array,
    n_steps: int,
    step_size: float,
    *,
    thin: int = 1,
    scale: float = 1.0,
    log_weights: Optional[Array] = None,
    precision: Optional[Array] = None,
    seed: int = 0,
    noise: Optional[Array] = None,
    uniforms: Optional[Array] = None,
    block_chains: int = 1 << 20,
    interpret: bool = False,
) -> Tuple[Array, Array, Array]:
    """Whole-run MALA recording every ``thin``-th state (the R̂/ESS workload).

    Returns ``(traj, final, accept)``: ``traj`` of shape
    ``(n_steps//thin, n_chains, d)`` (post-MH states after transitions
    ``thin, 2·thin, …`` — the library loop's kept slots), ``final`` the state
    after all transitions, ``accept`` the per-chain mean acceptance over the
    whole run. ``precision=`` selects the full-covariance Gaussian target.
    """
    n_chains, dim = x0.shape
    k, kd = means.shape
    if kd != dim:
        raise ValueError(f"means dim {kd} != state dim {dim}")
    if dim > 64 or k * dim > 1024:
        raise ValueError(
            "mixture_mala_chain_trajectory unrolls K components x d dims "
            f"in-kernel; K*d={k * dim}, d={dim} exceeds the supported size"
        )
    if thin < 1:
        raise ValueError("thin must be >= 1")
    n_kept = int(n_steps) // int(thin)
    if n_kept < 1:
        raise ValueError("n_steps // thin must be >= 1 for trajectory output")
    if (noise is None) != (uniforms is None):
        raise ValueError("noise and uniforms must be supplied together")

    xt, padded = chains_to_tiles(x0)
    lanes = padded // 8
    packed, n_comp = _pack_target(means, log_weights, precision)
    block = _mixture_block(
        lanes, dim, block_chains,
        n_staged=(0 if noise is None else int(n_steps) + 1) + 1,
    )

    kw = dict(
        n_steps=int(n_steps),
        thin=int(thin),
        step_size=float(step_size),
        inv_var=1.0 / float(scale) ** 2,
        n_components=n_comp,
        d=int(dim),
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
            functools.partial(_mixture_mala_traj_kernel, **kw),
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
        if noise.shape != (n_steps, n_chains, dim):
            raise ValueError(
                f"noise must have shape {(n_steps, n_chains, dim)}, got {noise.shape}"
            )
        if uniforms.shape != (n_steps, n_chains):
            raise ValueError(
                f"uniforms must have shape {(n_steps, n_chains)}, got {uniforms.shape}"
            )
        nt = jnp.stack([chains_to_tiles(noise[t])[0] for t in range(n_steps)])
        ut = jnp.stack(
            [chains_to_tiles(uniforms[t][:, None])[0] for t in range(n_steps)]
        )
        out, acc, traj = pl.pallas_call(
            functools.partial(_mixture_mala_traj_noise_kernel, **kw),
            out_shape=out_shape,
            grid=grid,
            in_specs=[
                state_spec,
                means_spec,
                pl.BlockSpec(
                    (n_steps, rows, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (n_steps, 8, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM
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


def _selftest():  # pragma: no cover - exercised via `python -m`
    import time

    import numpy as np

    from ..core.energies import GaussianMixtureEnergy
    from ..samplers import MetropolisAdjustedLangevin

    key = jax.random.PRNGKey(0)
    mix = GaussianMixtureEnergy.eight_gaussians()
    n, steps = 10_000, 500
    x0 = mix.sample(key, n)

    samples, acc = mixture_mala_chain(
        x0, mix.means, steps, 0.05, scale=float(mix.scale), seed=3
    )
    r = float(jnp.mean(jnp.linalg.norm(samples, axis=-1)))
    print(f"ring radius {r:.3f} (expect ~4), mean accept {float(jnp.mean(acc)):.3f}")

    def timed(fn):
        np.asarray(fn(2_000))
        t0 = time.perf_counter(); np.asarray(fn(2_000)); t1 = time.perf_counter()
        np.asarray(fn(200)); t2 = time.perf_counter(); np.asarray(fn(200)); t3 = time.perf_counter()
        return ((t1 - t0) - (t3 - t2)) / 1_800

    mala = MetropolisAdjustedLangevin(mix, step_size=0.05)
    per_lib = timed(lambda s: mala.sample(jax.random.fold_in(key, s), x=x0, n_steps=s))
    per_pal = timed(lambda s: mixture_mala_chain(x0, mix.means, s, 0.05, scale=float(mix.scale))[0])
    print(f"[{n} chains] library scan: {per_lib*1e6:.2f} us/step | "
          f"pallas: {per_pal*1e6:.2f} us/step | speedup {per_lib/per_pal:.1f}x")


if __name__ == "__main__":  # pragma: no cover
    _selftest()

r"""Pallas TPU kernel: whole-chain HMC on 2D isotropic Gaussian mixtures.

Beyond-reference perf feature (the reference's kernel layer stops at Langevin,
``torchebm/cuda/fused_langevin.py``): an entire HMC run — momentum refresh,
``n_leapfrog`` leapfrog steps with force reuse, Metropolis test — for every
draw of every chain executes in ONE kernel launch with the state resident in
VMEM/registers. This is BASELINE config 2's throughput path on the 8gaussians
/ analytic 2D mixture energies.

Layout matches :mod:`torchebm_tpu.ops.fused_langevin`: chains spread over
``(16, lanes)`` blocks (rows 0-7 x-coordinates, 8-15 y-coordinates) so every
VPU op runs at full (8, 128) sublane×lane utilization; means/log-weights ride
in a packed (8, K_pad) tile; normals come from both Box–Muller outputs of the
hardware PRNG, uniforms from one 24-bit draw.

Numerical guards mirror the library sampler (``samplers/hmc.py``):
the Hamiltonian difference is clamped to ±50 before ``exp``.
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
    _mixture_grad_logp,
    _normal_pair_from_bits,
    _round_up,
    _uniform_from_bits,
)

Array = jax.Array

__all__ = ["mixture_hmc_chain"]


def _mixture_hmc_kernel(seed_ref, x_ref, means_ref, logw_ref, out_ref, acc_ref, *,
                        n_draws, n_leapfrog, step_size, inv_var, n_components):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    means = means_ref[...]
    logw = logw_ref[...]
    h = step_size

    def mix(qx, qy):
        return _mixture_grad_logp(qx, qy, means, logw, inv_var, n_components)

    def draw(_, carry):
        x, acc_sum = carry
        xx = x[0:8, :]
        yy = x[8:16, :]
        px, py = _normal_pair_from_bits(xx.shape)
        gx, gy, lp0 = mix(xx, yy)
        h0 = -lp0 + 0.5 * (px * px + py * py)

        # leapfrog with force reuse: half-kick, drift, full gradient, half-kick
        def lf(_, s):
            qx, qy, px_, py_, gx_, gy_ = s
            px_ = px_ - 0.5 * h * gx_
            py_ = py_ - 0.5 * h * gy_
            qx = qx + h * px_
            qy = qy + h * py_
            ngx, ngy, _ = mix(qx, qy)
            px_ = px_ - 0.5 * h * ngx
            py_ = py_ - 0.5 * h * ngy
            return qx, qy, px_, py_, ngx, ngy

        qx, qy, px, py, _, _ = jax.lax.fori_loop(
            0, n_leapfrog, lf, (xx, yy, px, py, gx, gy)
        )
        _, _, lp1 = mix(qx, qy)
        h1 = -lp1 + 0.5 * (px * px + py * py)
        accept_prob = jnp.minimum(jnp.exp(jnp.clip(h0 - h1, -50.0, 50.0)), 1.0)
        u = _uniform_from_bits(xx.shape)
        take = u < accept_prob
        new_x = jnp.concatenate(
            [jnp.where(take, qx, xx), jnp.where(take, qy, yy)], axis=0
        )
        return new_x, acc_sum + accept_prob

    x_f, acc = jax.lax.fori_loop(
        0, n_draws, draw, (x_ref[...], jnp.zeros_like(x_ref[0:8, :]))
    )
    out_ref[...] = x_f
    acc_ref[...] = acc * (1.0 / n_draws)


def mixture_hmc_chain(
    x0: Array,
    means: Array,
    n_draws: int,
    step_size: float,
    n_leapfrog: int = 10,
    *,
    scale: float = 1.0,
    log_weights: Optional[Array] = None,
    seed: int = 0,
    block_chains: int = 1 << 20,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Full HMC run on a 2D isotropic Gaussian mixture in one kernel launch.

    ``x0``: (n_chains, 2); ``means``: (K, 2). Returns ``(samples, accept)``
    where ``samples`` is the final state (n_chains, 2) and ``accept`` the
    per-chain mean acceptance probability over all draws (n_chains,).
    """
    n_chains, dim = x0.shape
    if dim != 2:
        raise ValueError("mixture_hmc_chain currently supports dim=2 states")
    k = means.shape[0]
    if log_weights is None:
        log_weights = jnp.full((k,), -math.log(k), jnp.float32)

    padded = _round_up(n_chains, 8 * _LANE)
    lanes = padded // 8
    xpad = jnp.pad(x0, ((0, padded - n_chains), (0, 0)))
    xt = jnp.concatenate(
        [xpad[:, 0].reshape(8, lanes), xpad[:, 1].reshape(8, lanes)], axis=0
    )
    k_pad = _round_up(k, _LANE)
    packed = jnp.zeros((8, k_pad), jnp.float32)
    packed = packed.at[0, :k].set(means[:, 0])
    packed = packed.at[1, :k].set(means[:, 1])
    packed = packed.at[2, :k].set(log_weights)

    block = min(max(block_chains // 8, _LANE), lanes)
    while lanes % block:
        block //= 2
    block = max(block, _LANE)

    out, acc = pl.pallas_call(
        functools.partial(
            _mixture_hmc_kernel,
            n_draws=int(n_draws),
            n_leapfrog=int(n_leapfrog),
            step_size=float(step_size),
            inv_var=1.0 / float(scale) ** 2,
            n_components=int(k),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((16, lanes), jnp.float32),
            jax.ShapeDtypeStruct((8, lanes), jnp.float32),
        ),
        grid=(lanes // block,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((16, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((16, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), xt, packed, packed)
    samples = jnp.stack([out[0:8].reshape(padded), out[8:16].reshape(padded)], axis=-1)
    return samples[:n_chains], acc.reshape(padded)[:n_chains]


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

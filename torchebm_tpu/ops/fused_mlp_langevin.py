r"""Pallas TPU kernel: whole-chain Langevin on a neural (SiLU-MLP) energy.

**Measured negative result — kept as the reproducible experiment.** The
hypothesis was that neural-energy negative sampling (the CD/PCD inner loop)
would benefit from the whole-chain treatment that pays 6.5× for analytic
energies: weights + the whole k-step chain VMEM-resident in one launch,
exact MLP gradient as MXU matmuls (forward SiLU stack + hand-rolled
backward over pre-transposed weights), in-kernel PRNG. Measured on 1× v5e
(two-point slopes, 4096 chains, MLP(128,128)): the XLA compiled-scan path
wins everywhere — 9.7 vs 22.8 µs/step at d=2 (kernel 0.43×), 0.83× at
d=128 where lane-padding waste vanishes, 0.93× inside the CD-10 train
step. Unlike the eager per-step case, launches *inside one compiled
program* are cheap, XLA already fuses the small matmul/elementwise chain
well, and Mosaic's generic matmul scheduling has no edge over XLA's — the
analytic kernels win because they eliminate HBM round-trips AND the
autodiff graph, neither of which burdens a compiled neural scan. Dispatch
is therefore **opt-in and default-off**
(``LangevinDynamics(fused_neural=...)``); the kernel and its exact-parity
suite remain so the measurement is reproducible and the wide-input regime
can be re-tested on future hardware.

Supported energy: ``MLPEnergy``'s architecture (``models/nets.py:22-33``) —
``E(x) = W_out·silu(W_L(...silu(W_1 x + b_1)...) + b_L) + b_out`` with any
number of hidden layers, each dimension ≤ 512 after 128-padding. The exact
gradient is

.. math::
    \nabla_x E = W_1^T(\sigma'(a_1)\odot(\cdots W_L^T(\sigma'(a_L)\odot
    w_{out})\cdots)), \qquad \mathrm{silu}'(a) = \sigma(a)(1 + a(1-\sigma(a)))

All tensors are zero-padded to (8, 128) tiles; zero-padded weight rows/
columns make the padded coordinates exact no-ops, and noise is masked to the
real ``d`` columns so padded state stays identically zero. Like the Sinkhorn
kernel (and unlike the analytic chain kernels) this dispatches **under an
outer jit** — the CD train step is always jitted; the caller must ensure the
parameters carry no JVP tangents (``ContrastiveDivergence`` cuts them with
``stop_gradient`` before sampling, matching the CD estimator).

``noise=`` injects explicit noise for the exact-parity CI path
(``tests/ops/test_mlp_chain_parity.py``, interpret mode on CPU).
"""

from __future__ import annotations

import functools
import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_langevin import _normal_from_bits, _round_up

Array = jax.Array

__all__ = ["mlp_langevin_chain", "extract_mlp_layers"]

_LANE = 128
#: max padded width per layer: (512, 512) f32 weights are 1 MB each; with
#: transposes and a handful of layers the weight set stays ~10 MB in VMEM.
_MAX_WIDTH = 512


def extract_mlp_layers(params) -> Optional[List[Tuple[Array, Array]]]:
    """``[(W_1, b_1), ..., (W_out, b_out)]`` from a flax SiLU-MLP param tree.

    Returns None if the tree is not the expected ``Dense_0..Dense_n`` stack
    of 2D kernels ending in an output dimension of 1 (``MLPEnergy``'s
    structure), so dispatch can fall back silently.
    """
    try:
        tree = params["params"] if "params" in params else params
        names = sorted(tree.keys(), key=lambda s: int(s.split("_")[1]))
        if not all(n.startswith("Dense_") for n in names):
            return None
        layers = []
        for n in names:
            w, b = tree[n]["kernel"], tree[n]["bias"]
            if getattr(w, "ndim", 0) != 2 or getattr(b, "ndim", 0) != 1:
                return None
            layers.append((w, b))
        if not layers or layers[-1][0].shape[1] != 1:
            return None
        return layers
    except (KeyError, TypeError, AttributeError, ValueError, IndexError):
        return None


def _silu(a):
    return a * jax.nn.sigmoid(a)


def _dsilu(a):
    s = jax.nn.sigmoid(a)
    return s * (1.0 + a * (1.0 - s))


def _mlp_chain_kernel(seed_ref, x_ref, *refs, n_steps, n_hidden, d, step_size,
                      noise_coef, clamp):
    """PRNG variant: refs = [W_1, W_1ᵀ, b_1, …, W_L, W_Lᵀ, b_L, w_out, out]."""
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    out_ref = refs[-1]
    weights = refs[:-1]
    col = jax.lax.broadcasted_iota(jnp.int32, x_ref.shape, 1)
    dmask = (col < d).astype(jnp.float32)

    def grad_of(xb):
        acts = []
        h = xb
        for i in range(n_hidden):
            W, _, b = weights[3 * i], weights[3 * i + 1], weights[3 * i + 2]
            a = jnp.dot(h, W[...], preferred_element_type=jnp.float32) + b[...]
            acts.append(a)
            h = _silu(a)
        wout_t = weights[3 * n_hidden]  # (1, D_L) row: w_out transposed
        g = jnp.broadcast_to(wout_t[...], h.shape)
        for i in range(n_hidden - 1, -1, -1):
            Wt = weights[3 * i + 1]
            g = jnp.dot(_dsilu(acts[i]) * g, Wt[...], preferred_element_type=jnp.float32)
        return g

    def body(_, xb):
        g = grad_of(xb)
        eps = _normal_from_bits(xb.shape) * dmask
        new = xb - step_size * g + noise_coef * eps
        if clamp is not None:
            new = jnp.clip(new, clamp[0], clamp[1]) * dmask
        return new

    out_ref[...] = jax.lax.fori_loop(0, n_steps, body, x_ref[...])


def _mlp_chain_noise_kernel(x_ref, noise_ref, *refs, n_steps, n_hidden, d,
                            step_size, noise_coef, clamp):
    """Injected-noise variant (exact-parity CI path)."""
    out_ref = refs[-1]
    weights = refs[:-1]
    col = jax.lax.broadcasted_iota(jnp.int32, x_ref.shape, 1)
    dmask = (col < d).astype(jnp.float32)

    def grad_of(xb):
        acts = []
        h = xb
        for i in range(n_hidden):
            W, _, b = weights[3 * i], weights[3 * i + 1], weights[3 * i + 2]
            a = jnp.dot(h, W[...], preferred_element_type=jnp.float32) + b[...]
            acts.append(a)
            h = _silu(a)
        wout_t = weights[3 * n_hidden]  # (1, D_L) row: w_out transposed
        g = jnp.broadcast_to(wout_t[...], h.shape)
        for i in range(n_hidden - 1, -1, -1):
            Wt = weights[3 * i + 1]
            g = jnp.dot(_dsilu(acts[i]) * g, Wt[...], preferred_element_type=jnp.float32)
        return g

    def body(i, xb):
        g = grad_of(xb)
        eps = noise_ref[pl.ds(i, 1)][0] * dmask
        new = xb - step_size * g + noise_coef * eps
        if clamp is not None:
            new = jnp.clip(new, clamp[0], clamp[1]) * dmask
        return new

    out_ref[...] = jax.lax.fori_loop(0, n_steps, body, x_ref[...])


def mlp_langevin_chain(
    x0: Array,
    layers: List[Tuple[Array, Array]],
    n_steps: int,
    step_size: float,
    noise_scale: float = 1.0,
    *,
    seed=0,
    clamp: Optional[Tuple[float, float]] = None,
    noise: Optional[Array] = None,
    block_chains: int = 1024,
    interpret: bool = False,
) -> Array:
    """Full n-step Langevin chain on a SiLU-MLP energy in ONE kernel launch.

    ``x0``: (n_chains, d) f32; ``layers``: ``extract_mlp_layers`` output.
    ``step_size``/``noise_scale`` are constant (the CD negative-sampling
    contract). Unlike the analytic chain kernels this traces under ``jit``;
    parameters must not carry JVP tangents (stop-gradient them first).
    """
    n_chains, d = x0.shape
    if d > _MAX_WIDTH:
        raise ValueError(f"input dim {d} exceeds the kernel width cap {_MAX_WIDTH}")
    hidden = layers[:-1]
    w_out, _b_out = layers[-1]
    dims = [d] + [w.shape[1] for w, _ in hidden]
    for (w, b), din, dout in zip(hidden, dims[:-1], dims[1:]):
        if w.shape != (din, dout) or b.shape != (dout,):
            raise ValueError(f"layer shape mismatch: {w.shape}, {b.shape}")
    if w_out.shape != (dims[-1], 1):
        raise ValueError(f"output layer must map to 1, got {w_out.shape}")
    pdims = [max(_round_up(s, _LANE), _LANE) for s in dims]
    if max(pdims) > _MAX_WIDTH:
        raise ValueError(f"padded layer width {max(pdims)} exceeds {_MAX_WIDTH}")

    B = _round_up(max(n_chains, 8), 8)
    xp = jnp.zeros((B, pdims[0]), jnp.float32).at[:n_chains, :d].set(
        x0.astype(jnp.float32)
    )

    def pad2(a, r, c):
        return jnp.zeros((r, c), jnp.float32).at[: a.shape[0], : a.shape[1]].set(
            a.astype(jnp.float32)
        )

    packed = []
    for (w, b), din, dout in zip(hidden, pdims[:-1], pdims[1:]):
        packed += [pad2(w, din, dout), pad2(w.T, dout, din),
                   pad2(b[None, :], 1, dout)]
    packed.append(pad2(w_out.T, 1, pdims[-1]))

    # block the chain axis so state + weights stay inside VMEM
    weight_bytes = sum(p.size for p in packed) * 4
    budget_rows = max(((12 << 20) - weight_bytes) // (max(pdims) * 4 * 6), 8)
    block = min(block_chains, int(budget_rows), B)
    while B % block:
        block //= 2
    block = max(block, 8)
    grid = (B // block,)

    kw = dict(
        n_steps=int(n_steps),
        n_hidden=len(hidden),
        d=int(d),
        step_size=float(step_size),
        noise_coef=float(noise_scale) * math.sqrt(2.0 * float(step_size)),
        clamp=(float(clamp[0]), float(clamp[1])) if clamp is not None else None,
    )
    state_spec = pl.BlockSpec((block, pdims[0]), lambda i: (i, 0), memory_space=pltpu.VMEM)
    weight_specs = [
        pl.BlockSpec(p.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for p in packed
    ]
    out_shape = jax.ShapeDtypeStruct((B, pdims[0]), jnp.float32)

    if noise is None:
        out = pl.pallas_call(
            functools.partial(_mlp_chain_kernel, **kw),
            out_shape=out_shape,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), state_spec, *weight_specs],
            out_specs=state_spec,
            interpret=interpret,
        )(jnp.asarray(seed, jnp.int32).reshape(1), xp, *packed)
    else:
        if noise.shape != (n_steps, n_chains, d):
            raise ValueError(
                f"noise must have shape {(n_steps, n_chains, d)}, got {noise.shape}"
            )
        npad = jnp.zeros((int(n_steps), B, pdims[0]), jnp.float32)
        npad = npad.at[:, :n_chains, :d].set(noise.astype(jnp.float32))
        noise_spec = pl.BlockSpec(
            (int(n_steps), block, pdims[0]), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )
        out = pl.pallas_call(
            functools.partial(_mlp_chain_noise_kernel, **kw),
            out_shape=out_shape,
            grid=grid,
            in_specs=[state_spec, noise_spec, *weight_specs],
            out_specs=state_spec,
            interpret=interpret,
        )(xp, npad, *packed)
    return out[:n_chains, :d]

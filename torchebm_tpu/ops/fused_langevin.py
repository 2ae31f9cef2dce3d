r"""Pallas TPU kernels: fused Langevin update and whole-chain samplers.

The TPU-native equivalent of the reference's Triton proof-of-concept layer
(``torchebm/cuda/fused_langevin.py``, the only kernel-level code in the
reference):

- :func:`fused_langevin_step` — model-agnostic one-step fusion
  (reference ``:34-62``): load x, g → in-kernel PRNG → ``x - η·g +
  noise_scale·√(2η)·ε`` → optional clamp → store, in one kernel. An explicit
  ``noise=`` path exists for exact-parity tests, like the reference.
- :func:`doublewell_langevin_chain` — the model-specific ceiling
  (reference ``:65-88``): an entire n-step chain resident in VMEM in ONE
  kernel launch, analytic :math:`\nabla E = 4h x(x^2-b^2)` inline.
- :func:`mixture_langevin_chain` — build addition: the same whole-chain form
  for d-dim isotropic Gaussian-mixture energies (the 8gaussians benchmark
  target; a 1-component mixture covers isotropic ``GaussianEnergy``), with
  the responsibility-weighted analytic gradient computed in-kernel and an
  optional fused per-step clamp. With ``precision=`` the same kernels run a
  full-covariance Gaussian target instead (:func:`pack_gaussian_params`
  packing, :func:`_gaussian_grad_logp` evaluator, d ≤ 32) — the
  correlated-Gaussian ESS workload.

Every chain kernel has an injected-noise variant (``noise=``) that skips the
in-kernel PRNG: the exact-parity CI path, tested step-for-step against plain
jnp loops in interpret mode on CPU (``tests/ops/test_chain_parity.py``) —
the reference's correctness pattern (``cuda/fused_langevin.py:90-138``).

``step_size``/``noise_scale`` may each be a float (constant schedule — the
value is baked into the trace) or a ``(n_steps,)`` array (annealed schedule —
e.g. ``TemperatureScheduler`` for the Energy-Matching workload). Scheduled
chains stage a per-step ``[η_t, noise_scale_t·√(2η_t)]`` table in SMEM and
index it from the scalar unit each step; chains longer than
:data:`_SCHED_CHUNK` steps are split into several kernel launches (the state
tile round-trips HBM once per chunk — ~30 µs per launch, negligible against
thousands of in-VMEM steps).

The ``*_trajectory`` variants additionally record every ``thin``-th state:
the kept tile is staged to a VMEM scratch and async-DMA'd to an HBM-resident
``(n_kept, …)`` output while the chain itself stays in VMEM — so
``return_trajectory=True`` (the R̂/ESS diagnostics workload) keeps the
whole-chain kernel's advantage over the scan path instead of falling back.

Layout notes (see the TPU tiling constraints): the huge chain axis is spread
over BOTH the 8-sublane and 128-lane dimensions — the elementwise chain
kernel uses flat ``(rows, 128)`` blocks, the mixture kernels ``(8·d,
lanes)`` blocks (8 sublane rows per coordinate) — so every VPU op runs at
full (8, 128) utilization; the Python wrappers reshape at the boundary.
Gaussian noise comes from ``pltpu.prng_random_bits`` via Box–Muller, using
both transform outputs. Measured on a v5e chip (two-point slope over
1M→10M steps, which cancels per-call host latency): the mixture chain kernel
runs at 0.64 µs/step for 10k chains vs 4.2 µs/step for the compiled
``lax.scan`` library path (with the rbg key upgrade; 8.5 µs with threefry) —
~6.5× — because the scan pays per-step loop/launch overhead and HBM
round-trips while the kernel keeps the whole chain in VMEM/registers. A
per-step ``pallas_call`` inside the scan was measured at 27.8 µs/step
(launch + (rows,128) relayout per step dominate): on TPU, fuse whole chains
or rely on rbg + XLA elementwise fusion — never one kernel per step.

Run ``python -m torchebm_tpu.ops.fused_langevin`` for the correctness +
4-way benchmark harness mirroring the reference's self-test (``:183-266``).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

__all__ = [
    "fused_langevin_step",
    "doublewell_langevin_chain",
    "doublewell_langevin_chain_trajectory",
    "mixture_langevin_chain",
    "mixture_langevin_chain_trajectory",
]

_LANE = 128
_TWO_PI = 2.0 * math.pi
#: max steps per scheduled-chain launch: the (2, chunk) f32 schedule table
#: lives in SMEM (32 KB at 4096), and longer chains chunk into extra launches.
_SCHED_CHUNK = 4096


def _normal_pair_from_bits(shape) -> Tuple[Array, Array]:
    """TWO independent standard-normal blocks from one Box–Muller transform.

    Both outputs of the transform (cos and sin branches) are used, so the
    cost is two ``prng_random_bits`` draws per two normal blocks.
    """
    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # top 24 bits -> uniforms in (0, 1]. Mosaic lacks a uint32->f32 cast, so
    # bitcast the (always-positive, <2^24) shifted value to int32 first.
    i1 = pltpu.bitcast(b1 >> 8, jnp.int32).astype(jnp.float32)
    i2 = pltpu.bitcast(b2 >> 8, jnp.int32).astype(jnp.float32)
    u1 = i1 * (1.0 / (1 << 24)) + (1.0 / (1 << 25))
    u2 = i2 * (1.0 / (1 << 24))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(_TWO_PI * u2), r * jnp.sin(_TWO_PI * u2)


def _normal_from_bits(shape) -> Array:
    """Standard normals via Box–Muller on two draws of uint32 bits."""
    return _normal_pair_from_bits(shape)[0]


def _uniform_from_bits(shape) -> Array:
    """Uniforms in [0, 1) from the top 24 bits of one draw."""
    b = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    i = pltpu.bitcast(b >> 8, jnp.int32).astype(jnp.float32)
    return i * (1.0 / (1 << 24))


def _mixture_grad_logp(coords, means, inv_var, n_components):
    r"""Shared in-kernel d-dim isotropic-mixture math on (8, L) coordinate blocks.

    ``coords`` is a list of d tiles (one per coordinate). Returns
    ``(grads, logp)``: the per-coordinate energy-gradient tiles via softmax
    responsibilities and the unnormalized log-density
    :math:`\log\sum_k e^{\text{logit}_k}` (:math:`-E` up to a constant that
    cancels in Metropolis ratios). ``means`` is the packed
    (round8(d+1), K_pad) tile: row i < d holds coordinate i of every mean,
    row d the log-weights.
    """
    d = len(coords)
    logits = []
    for k in range(n_components):
        sq = None
        for i in range(d):
            diff = coords[i] - means[i, k]
            sq = diff * diff if sq is None else sq + diff * diff
        logits.append(means[d, k] - 0.5 * inv_var * sq)
    m = logits[0]
    for k in range(1, n_components):
        m = jnp.maximum(m, logits[k])
    nums = [jnp.zeros_like(coords[0]) for _ in range(d)]
    den = jnp.zeros_like(coords[0])
    for k in range(n_components):
        w = jnp.exp(logits[k] - m)
        den = den + w
        for i in range(d):
            nums[i] = nums[i] + w * means[i, k]
    inv_den = 1.0 / den
    grads = [(coords[i] - nums[i] * inv_den) * inv_var for i in range(d)]
    return grads, m + jnp.log(den)


def _gaussian_grad_logp(coords, pm, d):
    r"""In-kernel full-covariance Gaussian on (8, L) coordinate blocks.

    ``pm`` is the :func:`pack_gaussian_params` tile: row ``i < d`` holds row i
    of the precision matrix :math:`P = \Sigma^{-1}` (columns 0..d-1), row
    ``d`` the mean. Returns ``(grads, logp)`` with
    :math:`\nabla_i E = \sum_j P_{ij}(x_j - \mu_j)` (matching
    :class:`~torchebm_tpu.core.energies.GaussianEnergy`, reference
    ``base_model.py:151-210``) and the unnormalized log-density
    :math:`-\tfrac12 \sum_i (x_i-\mu_i)\,\nabla_i E` (constant dropped — it
    cancels in Metropolis ratios). The d² multiply-adds unroll into the
    trace, hence the d ≤ 32 wrapper guard.
    """
    diffs = [coords[j] - pm[d, j] for j in range(d)]
    grads = []
    for i in range(d):
        g = None
        for j in range(d):
            term = pm[i, j] * diffs[j]
            g = term if g is None else g + term
        grads.append(g)
    quad = None
    for i in range(d):
        t = diffs[i] * grads[i]
        quad = t if quad is None else quad + t
    return grads, -0.5 * quad


def _tile_grad_logp(coords, params, inv_var, n_components, d):
    """Dispatch the in-kernel target evaluator by packing convention.

    ``n_components >= 1``: isotropic mixture (:func:`pack_mixture_params`
    tile). ``n_components == 0``: full-covariance Gaussian
    (:func:`pack_gaussian_params` tile). The branch resolves at trace time —
    ``n_components`` is a Python int baked via ``functools.partial``.
    """
    if n_components == 0:
        return _gaussian_grad_logp(coords, params, d)
    return _mixture_grad_logp(coords, params, inv_var, n_components)


def pack_gaussian_params(
    mean: Array, precision: Array, mass: Optional[Array] = None
) -> Array:
    """Pack a (d,) mean + (d, d) precision into the kernels' 2D tile.

    Layout mirrors :func:`pack_mixture_params` so the kernels are agnostic:
    row ``i < d`` = precision row i (columns 0..d-1), row ``d`` = mean, row
    ``d+1`` = optional per-dimension diagonal mass (HMC kernels).
    """
    d = mean.shape[0]
    if precision.shape != (d, d):
        raise ValueError(f"precision must be ({d}, {d}), got {precision.shape}")
    cols = _round_up(d, _LANE)
    rows = _round_up(d + 1 + (1 if mass is not None else 0), 8)
    packed = jnp.zeros((rows, cols), jnp.float32)
    packed = packed.at[:d, :d].set(precision)
    packed = packed.at[d, :d].set(mean)
    if mass is not None:
        packed = packed.at[d + 1, :d].set(jnp.broadcast_to(mass, (d,)))
    return packed


def _pack_target(means, log_weights, precision, mass=None):
    """Pack the target-params tile and pick the evaluator convention.

    Returns ``(packed, n_components)``: mixture packing when ``precision`` is
    None, else the full-covariance Gaussian packing (``n_components = 0``;
    ``means`` must then be a single ``(1, d)`` row — the Gaussian mean).
    """
    k, d = means.shape
    if precision is None:
        return pack_mixture_params(means, log_weights, mass=mass), int(k)
    if k != 1:
        raise ValueError(
            "precision= requires a single (1, d) means row (a Gaussian target)"
        )
    if d > 32:
        raise ValueError(
            f"full-covariance kernels unroll d^2 precision terms; d={d} > 32"
        )
    return pack_gaussian_params(means[0], jnp.asarray(precision, jnp.float32), mass=mass), 0


def _normal_tiles(shape, d):
    """d independent standard-normal tiles from ceil(d/2) Box–Muller pairs."""
    tiles = []
    for _ in range((d + 1) // 2):
        tiles.extend(_normal_pair_from_bits(shape))
    return tiles[:d]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _schedule_table(step_size, noise_scale, n_steps: int) -> Optional[Array]:
    """``None`` when both parameters are Python scalars (constant chain — the
    values are baked into the trace); else the ``(2, n_steps)`` f32 per-step
    table ``[η_t, noise_scale_t·√(2η_t)]`` staged into SMEM by the scheduled
    kernels. Scalars broadcast against an array-valued partner."""
    if isinstance(step_size, (int, float)) and isinstance(noise_scale, (int, float)):
        return None
    for name, p in (("step_size", step_size), ("noise_scale", noise_scale)):
        if not isinstance(p, (int, float)) and jnp.shape(p) not in ((), (int(n_steps),)):
            raise ValueError(
                f"{name} must be a scalar or a ({n_steps},) per-step schedule, "
                f"got shape {jnp.shape(p)}"
            )
    h = jnp.broadcast_to(jnp.asarray(step_size, jnp.float32), (int(n_steps),))
    ns = jnp.broadcast_to(jnp.asarray(noise_scale, jnp.float32), (int(n_steps),))
    return jnp.stack([h, ns * jnp.sqrt(2.0 * h)])


def _sched_chunks(n_steps: int):
    """[start, end) step ranges of at most :data:`_SCHED_CHUNK` steps each."""
    chunk = _SCHED_CHUNK
    return [(s, min(s + chunk, int(n_steps))) for s in range(0, int(n_steps), chunk)]


#: cached jitted chunk-loop runners, keyed on every static that shapes the
#: trace. Scheduled chains longer than _SCHED_CHUNK issue one kernel launch
#: per chunk; dispatched eagerly that is one REMOTE execution per chunk
#: (measured ~80 ms each through the axon tunnel — a 25-chunk 100k-step
#: trajectory took 20 µs/step, 3x SLOWER than the scan). Under one jit the
#: whole chunk sequence compiles to a single XLA program and the launch
#: count is n-independent.
_RUNNER_CACHE: dict = {}


def _cached_jit(key, make):
    fn = _RUNNER_CACHE.get(key)
    if fn is None:
        fn = jax.jit(make())
        _RUNNER_CACHE[key] = fn
    return fn


# ---------------------------------------------------------------------------
# fused one-step kernel (model-agnostic)
# ---------------------------------------------------------------------------


def _fused_step_kernel(seed_ref, x_ref, g_ref, out_ref, *, step_size, noise_coef,
                       clamp_min, clamp_max, use_clamp):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    eps = _normal_from_bits(x_ref.shape)
    new = x_ref[...] - step_size * g_ref[...] + noise_coef * eps
    if use_clamp:
        new = jnp.clip(new, clamp_min, clamp_max)
    out_ref[...] = new


def _fused_step_noise_kernel(x_ref, g_ref, n_ref, out_ref, *, step_size, noise_coef,
                             clamp_min, clamp_max, use_clamp):
    new = x_ref[...] - step_size * g_ref[...] + noise_coef * n_ref[...]
    if use_clamp:
        new = jnp.clip(new, clamp_min, clamp_max)
    out_ref[...] = new


def fused_langevin_step(
    x: Array,
    grad: Array,
    step_size: float,
    noise_scale: float = 1.0,
    *,
    seed: int = 0,
    clamp: Optional[Tuple[float, float]] = None,
    noise: Optional[Array] = None,
    interpret: bool = False,
) -> Array:
    r"""One fused Langevin update ``x - η·g + noise_scale·√(2η)·ε``.

    ``noise=None`` draws ε in-kernel from the TPU PRNG (seeded per grid
    block); passing explicit ``noise`` reproduces the library's eager update
    bit-for-bit (the exact-parity testing hook, reference ``:90-138``).
    """
    orig_shape = x.shape
    flat = x.reshape(-1)
    n = flat.shape[0]
    rows = _round_up(max(1, n // _LANE + (n % _LANE > 0)), 8)
    padded = rows * _LANE
    pad = padded - n

    def prep(a):
        return jnp.pad(a.reshape(-1), (0, pad)).reshape(rows, _LANE)

    coef = float(noise_scale) * math.sqrt(2.0 * float(step_size))
    kw = dict(
        step_size=float(step_size),
        noise_coef=coef,
        clamp_min=clamp[0] if clamp else 0.0,
        clamp_max=clamp[1] if clamp else 0.0,
        use_clamp=clamp is not None,
    )
    if noise is None:
        out = pl.pallas_call(
            functools.partial(_fused_step_kernel, **kw),
            out_shape=jax.ShapeDtypeStruct((rows, _LANE), jnp.float32),
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((rows, _LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, _LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rows, _LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
            interpret=interpret,
        )(jnp.asarray([seed], jnp.int32), prep(x), prep(grad))
    else:
        out = pl.pallas_call(
            functools.partial(_fused_step_noise_kernel, **kw),
            out_shape=jax.ShapeDtypeStruct((rows, _LANE), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(prep(x), prep(grad), prep(noise))
    return out.reshape(-1)[:n].reshape(orig_shape)


# ---------------------------------------------------------------------------
# whole-chain kernels (state stays in VMEM across all steps)
# ---------------------------------------------------------------------------


def _clip(x, clamp):
    return x if clamp is None else jnp.clip(x, clamp[0], clamp[1])


def _doublewell_chain_kernel(seed_ref, x_ref, out_ref, *, n_steps, step_size,
                             noise_coef, barrier_height, b, clamp):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    b2 = b * b
    coef = 4.0 * barrier_height

    def body(_, x):
        grad = coef * x * (x * x - b2)  # analytic double-well ∇E, inline
        eps = _normal_from_bits(x.shape)
        return _clip(x - step_size * grad + noise_coef * eps, clamp)

    out_ref[...] = jax.lax.fori_loop(0, n_steps, body, x_ref[...])


def _doublewell_chain_noise_kernel(x_ref, noise_ref, out_ref, *, n_steps,
                                   step_size, noise_coef, barrier_height, b,
                                   clamp):
    """Injected-noise variant: exact-parity CI path (no in-kernel PRNG)."""
    b2 = b * b
    coef = 4.0 * barrier_height

    def body(i, x):
        grad = coef * x * (x * x - b2)
        eps = noise_ref[pl.ds(i, 1)][0]
        return _clip(x - step_size * grad + noise_coef * eps, clamp)

    out_ref[...] = jax.lax.fori_loop(0, n_steps, body, x_ref[...])


def _doublewell_chain_sched_kernel(seed_ref, sched_ref, x_ref, out_ref, *,
                                   n_steps, barrier_height, b, clamp):
    """Scheduled-chain variant: per-step ``[η_t, noise_coef_t]`` from SMEM."""
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    b2 = b * b
    coef = 4.0 * barrier_height

    def body(i, x):
        grad = coef * x * (x * x - b2)
        eps = _normal_from_bits(x.shape)
        return _clip(x - sched_ref[0, i] * grad + sched_ref[1, i] * eps, clamp)

    out_ref[...] = jax.lax.fori_loop(0, n_steps, body, x_ref[...])


def _doublewell_chain_sched_noise_kernel(sched_ref, x_ref, noise_ref, out_ref,
                                         *, n_steps, barrier_height, b, clamp):
    """Scheduled + injected-noise variant (exact-parity CI path)."""
    b2 = b * b
    coef = 4.0 * barrier_height

    def body(i, x):
        grad = coef * x * (x * x - b2)
        eps = noise_ref[pl.ds(i, 1)][0]
        return _clip(x - sched_ref[0, i] * grad + sched_ref[1, i] * eps, clamp)

    out_ref[...] = jax.lax.fori_loop(0, n_steps, body, x_ref[...])


def doublewell_langevin_chain(
    x0: Array,
    n_steps: int,
    step_size: Union[float, Array],
    noise_scale: Union[float, Array] = 1.0,
    *,
    barrier_height: float = 2.0,
    b: float = 1.0,
    seed: int = 0,
    clamp: Optional[Tuple[float, float]] = None,
    noise: Optional[Array] = None,
    block_rows: int = 256,
    interpret: bool = False,
) -> Array:
    """Full n-step Langevin chain on the double-well energy in ONE kernel.

    Elementwise-separable energy ⇒ the state is treated as a flat vector and
    blocked over the grid; each block's chain segment never leaves VMEM
    (reference Triton ceiling, ``fused_langevin.py:65-88``). ``noise``
    (shape ``(n_steps, *x0.shape)``) replaces the in-kernel PRNG for
    exact-parity testing — the reference's correctness hook (``:90-138``);
    ``clamp`` bounds the state per step like the library sampler.
    ``step_size``/``noise_scale`` may each be a ``(n_steps,)`` per-step
    schedule (see module docstring).
    """
    orig_shape = x0.shape
    flat = x0.reshape(-1)
    n = flat.shape[0]
    rows = _round_up(max(1, (n + _LANE - 1) // _LANE), 8)
    padded = rows * _LANE
    flat = jnp.pad(flat, (0, padded - n)).reshape(rows, _LANE)
    sched = _schedule_table(step_size, noise_scale, n_steps)
    if noise is not None:
        # the (staged_steps, block_rows, 128) noise stage must fit VMEM too;
        # scheduled chains stage at most one _SCHED_CHUNK-step slice at a time
        staged = int(n_steps) if sched is None else min(int(n_steps), _SCHED_CHUNK)
        budget_rows = max((4 << 20) // (_LANE * 4 * (6 + staged)), 8)
        block_rows = min(block_rows, budget_rows)
    block_rows = min(block_rows, rows)
    # grid blocks must tile the rows evenly
    while rows % block_rows:
        block_rows //= 2
    block_rows = max(block_rows, 8) if rows % 8 == 0 else rows

    kw = dict(
        barrier_height=float(barrier_height),
        b=float(b),
        clamp=(float(clamp[0]), float(clamp[1])) if clamp is not None else None,
    )
    grid = (rows // block_rows,)
    out_shape = jax.ShapeDtypeStruct((rows, _LANE), jnp.float32)
    state_spec = pl.BlockSpec((block_rows, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    if noise is not None:
        if noise.shape != (n_steps, *orig_shape):
            raise ValueError(
                f"noise must have shape {(n_steps, *orig_shape)}, got {noise.shape}"
            )
        npad = jnp.pad(noise.reshape(n_steps, -1), ((0, 0), (0, padded - n)))
        npad = npad.reshape(n_steps, rows, _LANE)

    def noise_spec(steps):
        return pl.BlockSpec(
            (steps, block_rows, _LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )

    if sched is None:
        ckw = dict(
            n_steps=int(n_steps),
            step_size=float(step_size),
            noise_coef=float(noise_scale) * math.sqrt(2.0 * float(step_size)),
            **kw,
        )
        if noise is None:
            out = pl.pallas_call(
                functools.partial(_doublewell_chain_kernel, **ckw),
                out_shape=out_shape,
                grid=grid,
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), state_spec],
                out_specs=state_spec,
                interpret=interpret,
            )(jnp.asarray([seed], jnp.int32), flat)
        else:
            out = pl.pallas_call(
                functools.partial(_doublewell_chain_noise_kernel, **ckw),
                out_shape=out_shape,
                grid=grid,
                in_specs=[state_spec, noise_spec(int(n_steps))],
                out_specs=state_spec,
                interpret=interpret,
            )(flat, npad)
    else:
        cache_key = (
            "dw_chain_sched", _SCHED_CHUNK, int(n_steps), rows, block_rows, grid,
            tuple(sorted(kw.items())), bool(interpret), noise is not None,
        )

        def make():
            def run(flat_a, sched_a, aux):
                out_a = flat_a
                for c, (s0, s1) in enumerate(_sched_chunks(n_steps)):
                    ckw = dict(n_steps=s1 - s0, **kw)
                    if noise is None:
                        # per-(chunk, block) distinct seeds: offset by grid size
                        out_a = pl.pallas_call(
                            functools.partial(_doublewell_chain_sched_kernel, **ckw),
                            out_shape=out_shape,
                            grid=grid,
                            in_specs=[
                                pl.BlockSpec(memory_space=pltpu.SMEM),
                                pl.BlockSpec(memory_space=pltpu.SMEM),
                                state_spec,
                            ],
                            out_specs=state_spec,
                            interpret=interpret,
                        )(aux + c * grid[0], sched_a[:, s0:s1], out_a)
                    else:
                        out_a = pl.pallas_call(
                            functools.partial(
                                _doublewell_chain_sched_noise_kernel, **ckw
                            ),
                            out_shape=out_shape,
                            grid=grid,
                            in_specs=[
                                pl.BlockSpec(memory_space=pltpu.SMEM),
                                state_spec,
                                noise_spec(s1 - s0),
                            ],
                            out_specs=state_spec,
                            interpret=interpret,
                        )(sched_a[:, s0:s1], out_a, aux[s0:s1])
                return out_a

            return run

        aux = jnp.asarray([seed], jnp.int32) if noise is None else npad
        out = _cached_jit(cache_key, make)(flat, sched, aux)
    return out.reshape(-1)[:n].reshape(orig_shape)


def _doublewell_chain_traj_kernel(seed_ref, x_ref, out_ref, traj_ref,
                                  scratch_ref, sem_ref, *, n_steps, thin,
                                  step_size, noise_coef, barrier_height, b,
                                  block_rows, clamp):
    """Double-well chain emitting every ``thin``-th state to HBM (see
    :func:`_mixture_chain_traj_kernel` for the staging pattern)."""
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    row0 = pl.program_id(0) * block_rows
    b2 = b * b
    coef = 4.0 * barrier_height

    def body(i, x):
        grad = coef * x * (x * x - b2)
        eps = _normal_from_bits(x.shape)
        xn = _clip(x - step_size * grad + noise_coef * eps, clamp)

        @pl.when((i + 1) % thin == 0)
        def _():
            k = (i + 1) // thin - 1
            scratch_ref[...] = xn
            dma = pltpu.make_async_copy(
                scratch_ref, traj_ref.at[k, pl.ds(row0, block_rows), :], sem_ref
            )
            dma.start()
            dma.wait()

        return xn

    out_ref[...] = jax.lax.fori_loop(0, n_steps, body, x_ref[...])


def _doublewell_chain_traj_noise_kernel(x_ref, noise_ref, out_ref, traj_ref,
                                        scratch_ref, sem_ref, *, n_steps, thin,
                                        step_size, noise_coef, barrier_height,
                                        b, block_rows, clamp):
    """Injected-noise variant of :func:`_doublewell_chain_traj_kernel`."""
    row0 = pl.program_id(0) * block_rows
    b2 = b * b
    coef = 4.0 * barrier_height

    def body(i, x):
        grad = coef * x * (x * x - b2)
        eps = noise_ref[pl.ds(i, 1)][0]
        xn = _clip(x - step_size * grad + noise_coef * eps, clamp)

        @pl.when((i + 1) % thin == 0)
        def _():
            k = (i + 1) // thin - 1
            scratch_ref[...] = xn
            dma = pltpu.make_async_copy(
                scratch_ref, traj_ref.at[k, pl.ds(row0, block_rows), :], sem_ref
            )
            dma.start()
            dma.wait()

        return xn

    out_ref[...] = jax.lax.fori_loop(0, n_steps, body, x_ref[...])


def _doublewell_chain_traj_sched_kernel(seed_ref, sched_ref, x_ref, out_ref,
                                        traj_ref, scratch_ref, sem_ref, *,
                                        n_steps, thin, barrier_height, b,
                                        block_rows, clamp):
    """Scheduled + trajectory composition: per-step ``[η_t, noise_coef_t]``
    from SMEM *and* every ``thin``-th state DMA'd to HBM — the annealed
    R̂/ESS workload (e.g. a ``TemperatureScheduler`` sweep with
    ``return_trajectory=True``) stays on the whole-chain kernel.

    ``seed_ref`` carries ``[seed, step0, kept0]``: chunked chains pass their
    global step offset and first kept-slot index so kept positions line up
    across launches without per-chunk recompilation.
    """
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    step0 = seed_ref[1]
    kept0 = seed_ref[2]
    row0 = pl.program_id(0) * block_rows
    b2 = b * b
    coef = 4.0 * barrier_height

    def body(i, x):
        grad = coef * x * (x * x - b2)
        eps = _normal_from_bits(x.shape)
        xn = _clip(x - sched_ref[0, i] * grad + sched_ref[1, i] * eps, clamp)
        g = step0 + i + 1

        @pl.when(g % thin == 0)
        def _():
            k = g // thin - 1 - kept0
            scratch_ref[...] = xn
            dma = pltpu.make_async_copy(
                scratch_ref, traj_ref.at[k, pl.ds(row0, block_rows), :], sem_ref
            )
            dma.start()
            dma.wait()

        return xn

    out_ref[...] = jax.lax.fori_loop(0, n_steps, body, x_ref[...])


def _doublewell_chain_traj_sched_noise_kernel(meta_ref, sched_ref, x_ref,
                                              noise_ref, out_ref, traj_ref,
                                              scratch_ref, sem_ref, *, n_steps,
                                              thin, barrier_height, b,
                                              block_rows, clamp):
    """Injected-noise variant of :func:`_doublewell_chain_traj_sched_kernel`
    (exact-parity CI path); ``meta_ref`` = ``[step0, kept0]``."""
    step0 = meta_ref[0]
    kept0 = meta_ref[1]
    row0 = pl.program_id(0) * block_rows
    b2 = b * b
    coef = 4.0 * barrier_height

    def body(i, x):
        grad = coef * x * (x * x - b2)
        eps = noise_ref[pl.ds(i, 1)][0]
        xn = _clip(x - sched_ref[0, i] * grad + sched_ref[1, i] * eps, clamp)
        g = step0 + i + 1

        @pl.when(g % thin == 0)
        def _():
            k = g // thin - 1 - kept0
            scratch_ref[...] = xn
            dma = pltpu.make_async_copy(
                scratch_ref, traj_ref.at[k, pl.ds(row0, block_rows), :], sem_ref
            )
            dma.start()
            dma.wait()

        return xn

    out_ref[...] = jax.lax.fori_loop(0, n_steps, body, x_ref[...])


def doublewell_langevin_chain_trajectory(
    x0: Array,
    n_steps: int,
    step_size: Union[float, Array],
    noise_scale: Union[float, Array] = 1.0,
    *,
    thin: int = 1,
    barrier_height: float = 2.0,
    b: float = 1.0,
    seed: int = 0,
    clamp: Optional[Tuple[float, float]] = None,
    noise: Optional[Array] = None,
    block_rows: int = 256,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Double-well chain recording every ``thin``-th state.

    Returns ``(traj, final)``: ``traj`` has shape ``(n_steps//thin,
    *x0.shape)`` (kept slots match the library loop — states after steps
    ``thin, 2·thin, …``), ``final`` is the state after all ``n_steps`` steps
    (trailing ``n_steps % thin`` steps execute but are not recorded).
    ``step_size``/``noise_scale`` may each be a ``(n_steps,)`` per-step
    schedule — the SMEM schedule table and the trajectory DMA compose, so
    annealed R̂/ESS workloads stay on the kernel (see module docstring).
    """
    if thin < 1:
        raise ValueError("thin must be >= 1")
    n_kept = int(n_steps) // int(thin)
    if n_kept < 1:
        raise ValueError("n_steps // thin must be >= 1 for trajectory output")
    orig_shape = x0.shape
    flat = x0.reshape(-1)
    n = flat.shape[0]
    rows = _round_up(max(1, (n + _LANE - 1) // _LANE), 8)
    padded = rows * _LANE
    flat = jnp.pad(flat, (0, padded - n)).reshape(rows, _LANE)
    sched = _schedule_table(step_size, noise_scale, n_steps)
    if noise is not None:
        staged = int(n_steps) if sched is None else min(int(n_steps), _SCHED_CHUNK)
        budget_rows = max((4 << 20) // (_LANE * 4 * (7 + staged)), 8)
        block_rows = min(block_rows, budget_rows)
    block_rows = min(block_rows, rows)
    while rows % block_rows:
        block_rows //= 2
    block_rows = max(block_rows, 8) if rows % 8 == 0 else rows

    kw = dict(
        thin=int(thin),
        barrier_height=float(barrier_height),
        b=float(b),
        block_rows=int(block_rows),
        clamp=(float(clamp[0]), float(clamp[1])) if clamp is not None else None,
    )
    grid = (rows // block_rows,)
    state_spec = pl.BlockSpec((block_rows, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((block_rows, _LANE), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
    ]
    if noise is not None and noise.shape != (n_steps, *orig_shape):
        raise ValueError(
            f"noise must have shape {(n_steps, *orig_shape)}, got {noise.shape}"
        )

    def out_shapes(kept):
        return (
            jax.ShapeDtypeStruct((rows, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((kept, rows, _LANE), jnp.float32),
        )

    out_specs = (state_spec, pl.BlockSpec(memory_space=pl.ANY))
    if noise is not None:
        npad = jnp.pad(noise.reshape(n_steps, -1), ((0, 0), (0, padded - n)))
        npad = npad.reshape(n_steps, rows, _LANE)

    def noise_spec(steps):
        return pl.BlockSpec(
            (steps, block_rows, _LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )

    if sched is None:
        ckw = dict(
            n_steps=int(n_steps),
            step_size=float(step_size),
            noise_coef=float(noise_scale) * math.sqrt(2.0 * float(step_size)),
            **kw,
        )
        if noise is None:
            final, traj = pl.pallas_call(
                functools.partial(_doublewell_chain_traj_kernel, **ckw),
                out_shape=out_shapes(n_kept),
                grid=grid,
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), state_spec],
                out_specs=out_specs,
                scratch_shapes=scratch,
                interpret=interpret,
            )(jnp.asarray([seed], jnp.int32), flat)
        else:
            final, traj = pl.pallas_call(
                functools.partial(_doublewell_chain_traj_noise_kernel, **ckw),
                out_shape=out_shapes(n_kept),
                grid=grid,
                in_specs=[state_spec, noise_spec(int(n_steps))],
                out_specs=out_specs,
                scratch_shapes=scratch,
                interpret=interpret,
            )(flat, npad)
    else:
        cache_key = (
            "dw_traj_sched", _SCHED_CHUNK, int(n_steps), int(thin), rows, block_rows, grid,
            tuple(sorted(kw.items())), bool(interpret), noise is not None,
        )

        def make():
            def run(flat_a, sched_a, aux):
                final_a = flat_a
                parts = []
                for c, (s0, s1) in enumerate(_sched_chunks(n_steps)):
                    kept_c = s1 // int(thin) - s0 // int(thin)
                    if kept_c == 0:
                        # no kept slot in this chunk: plain scheduled advance
                        nkw = dict(
                            n_steps=s1 - s0,
                            barrier_height=kw["barrier_height"],
                            b=kw["b"],
                            clamp=kw["clamp"],
                        )
                        if noise is None:
                            final_a = pl.pallas_call(
                                functools.partial(
                                    _doublewell_chain_sched_kernel, **nkw
                                ),
                                out_shape=jax.ShapeDtypeStruct((rows, _LANE), jnp.float32),
                                grid=grid,
                                in_specs=[
                                    pl.BlockSpec(memory_space=pltpu.SMEM),
                                    pl.BlockSpec(memory_space=pltpu.SMEM),
                                    state_spec,
                                ],
                                out_specs=state_spec,
                                interpret=interpret,
                            )(aux + c * grid[0], sched_a[:, s0:s1], final_a)
                        else:
                            final_a = pl.pallas_call(
                                functools.partial(
                                    _doublewell_chain_sched_noise_kernel, **nkw
                                ),
                                out_shape=jax.ShapeDtypeStruct((rows, _LANE), jnp.float32),
                                grid=grid,
                                in_specs=[
                                    pl.BlockSpec(memory_space=pltpu.SMEM),
                                    state_spec,
                                    noise_spec(s1 - s0),
                                ],
                                out_specs=state_spec,
                                interpret=interpret,
                            )(sched_a[:, s0:s1], final_a, aux[s0:s1])
                        continue
                    ckw = dict(n_steps=s1 - s0, **kw)
                    chunk_meta = jnp.asarray([s0, s0 // int(thin)], jnp.int32)
                    if noise is None:
                        meta = jnp.concatenate([aux + c * grid[0], chunk_meta])
                        final_a, traj_c = pl.pallas_call(
                            functools.partial(
                                _doublewell_chain_traj_sched_kernel, **ckw
                            ),
                            out_shape=out_shapes(kept_c),
                            grid=grid,
                            in_specs=[
                                pl.BlockSpec(memory_space=pltpu.SMEM),
                                pl.BlockSpec(memory_space=pltpu.SMEM),
                                state_spec,
                            ],
                            out_specs=out_specs,
                            scratch_shapes=scratch,
                            interpret=interpret,
                        )(meta, sched_a[:, s0:s1], final_a)
                    else:
                        final_a, traj_c = pl.pallas_call(
                            functools.partial(
                                _doublewell_chain_traj_sched_noise_kernel, **ckw
                            ),
                            out_shape=out_shapes(kept_c),
                            grid=grid,
                            in_specs=[
                                pl.BlockSpec(memory_space=pltpu.SMEM),
                                pl.BlockSpec(memory_space=pltpu.SMEM),
                                state_spec,
                                noise_spec(s1 - s0),
                            ],
                            out_specs=out_specs,
                            scratch_shapes=scratch,
                            interpret=interpret,
                        )(chunk_meta, sched_a[:, s0:s1], final_a, aux[s0:s1])
                    parts.append(traj_c)
                traj_a = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
                return traj_a, final_a

            return run

        aux = jnp.asarray([seed], jnp.int32) if noise is None else npad
        traj, final = _cached_jit(cache_key, make)(flat, sched, aux)
    traj_out = traj.reshape(n_kept, -1)[:, :n].reshape(n_kept, *orig_shape)
    return traj_out, final.reshape(-1)[:n].reshape(orig_shape)


# -------------------------------------------------------- mixture chain (d-dim)


def _split_coords(x, d):
    return [x[8 * i : 8 * (i + 1), :] for i in range(d)]


def _mixture_chain_kernel(seed_ref, x_ref, means_ref, out_ref, *, n_steps,
                          step_size, noise_coef, inv_var, n_components, d,
                          clamp):
    """Whole-chain Langevin on a d-dim isotropic Gaussian mixture.

    State layout: ``(8·d, block_lanes)`` — rows ``8i:8(i+1)`` hold coordinate
    ``i`` of 8·block_lanes chains, so every VPU op runs with full (8, 128)
    sublane×lane utilization (a ``(d, chains)`` layout would idle most
    sublanes for small d). The analytic score is the responsibility-weighted
    pull toward the means via a numerically-stable softmax over the
    (unrolled) components; both Box–Muller outputs are used so each step
    costs ``ceil(d/2)·2`` ``prng_random_bits`` draws for all d coordinates.
    """
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    means = means_ref[...]  # (round8(d+1), K_pad): rows [m_0..m_{d-1}, logw]

    def body(_, x):
        coords = _split_coords(x, d)
        grads, _ = _tile_grad_logp(coords, means, inv_var, n_components, d)
        eps = _normal_tiles(coords[0].shape, d)
        new = [
            _clip(coords[i] - step_size * grads[i] + noise_coef * eps[i], clamp)
            for i in range(d)
        ]
        return jnp.concatenate(new, axis=0)

    out_ref[...] = jax.lax.fori_loop(0, n_steps, body, x_ref[...])


def _mixture_chain_noise_kernel(x_ref, means_ref, noise_ref, out_ref, *,
                                n_steps, step_size, noise_coef, inv_var,
                                n_components, d, clamp):
    """Injected-noise variant of :func:`_mixture_chain_kernel` (CI parity)."""
    means = means_ref[...]

    def body(i, x):
        coords = _split_coords(x, d)
        grads, _ = _tile_grad_logp(coords, means, inv_var, n_components, d)
        et = noise_ref[pl.ds(i, 1)][0]
        eps = _split_coords(et, d)
        new = [
            _clip(coords[i] - step_size * grads[i] + noise_coef * eps[i], clamp)
            for i in range(d)
        ]
        return jnp.concatenate(new, axis=0)

    out_ref[...] = jax.lax.fori_loop(0, n_steps, body, x_ref[...])


def _mixture_chain_sched_kernel(seed_ref, sched_ref, x_ref, means_ref, out_ref,
                                *, n_steps, inv_var, n_components, d, clamp):
    """Scheduled-chain mixture variant: per-step ``[η_t, noise_coef_t]`` from SMEM."""
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    means = means_ref[...]

    def body(i, x):
        h = sched_ref[0, i]
        nc = sched_ref[1, i]
        coords = _split_coords(x, d)
        grads, _ = _tile_grad_logp(coords, means, inv_var, n_components, d)
        eps = _normal_tiles(coords[0].shape, d)
        new = [_clip(coords[j] - h * grads[j] + nc * eps[j], clamp) for j in range(d)]
        return jnp.concatenate(new, axis=0)

    out_ref[...] = jax.lax.fori_loop(0, n_steps, body, x_ref[...])


def _mixture_chain_sched_noise_kernel(sched_ref, x_ref, means_ref, noise_ref,
                                      out_ref, *, n_steps, inv_var,
                                      n_components, d, clamp):
    """Scheduled + injected-noise mixture variant (exact-parity CI path)."""
    means = means_ref[...]

    def body(i, x):
        h = sched_ref[0, i]
        nc = sched_ref[1, i]
        coords = _split_coords(x, d)
        grads, _ = _tile_grad_logp(coords, means, inv_var, n_components, d)
        eps = _split_coords(noise_ref[pl.ds(i, 1)][0], d)
        new = [_clip(coords[j] - h * grads[j] + nc * eps[j], clamp) for j in range(d)]
        return jnp.concatenate(new, axis=0)

    out_ref[...] = jax.lax.fori_loop(0, n_steps, body, x_ref[...])


def _mixture_chain_traj_kernel(seed_ref, x_ref, means_ref, out_ref, traj_ref,
                               scratch_ref, sem_ref, *, n_steps, thin,
                               step_size, noise_coef, inv_var, n_components,
                               d, block, clamp):
    """Whole-chain mixture Langevin emitting every ``thin``-th state to HBM.

    ``traj_ref`` is the full ``(n_kept, 8d, lanes)`` array left in HBM
    (``memory_space=ANY``); kept states stage through a VMEM scratch tile and
    one async DMA per kept slot (~0.1 µs of HBM traffic per 10k-chain slot —
    negligible next to the step math, so trajectory recording keeps the
    whole-chain kernel's ~5x advantage over the scan path for R̂/ESS
    workloads). The chain state itself never round-trips HBM between steps.
    """
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    means = means_ref[...]
    col0 = pl.program_id(0) * block

    def body(i, x):
        coords = _split_coords(x, d)
        grads, _ = _tile_grad_logp(coords, means, inv_var, n_components, d)
        eps = _normal_tiles(coords[0].shape, d)
        new = [
            _clip(coords[j] - step_size * grads[j] + noise_coef * eps[j], clamp)
            for j in range(d)
        ]
        xn = jnp.concatenate(new, axis=0)

        @pl.when((i + 1) % thin == 0)
        def _():
            k = (i + 1) // thin - 1
            scratch_ref[...] = xn
            dma = pltpu.make_async_copy(
                scratch_ref, traj_ref.at[k, :, pl.ds(col0, block)], sem_ref
            )
            dma.start()
            dma.wait()

        return xn

    out_ref[...] = jax.lax.fori_loop(0, n_steps, body, x_ref[...])


def _mixture_chain_traj_noise_kernel(x_ref, means_ref, noise_ref, out_ref,
                                     traj_ref, scratch_ref, sem_ref, *,
                                     n_steps, thin, step_size, noise_coef,
                                     inv_var, n_components, d, block, clamp):
    """Injected-noise variant of :func:`_mixture_chain_traj_kernel` (CI parity)."""
    means = means_ref[...]
    col0 = pl.program_id(0) * block

    def body(i, x):
        coords = _split_coords(x, d)
        grads, _ = _tile_grad_logp(coords, means, inv_var, n_components, d)
        eps = _split_coords(noise_ref[pl.ds(i, 1)][0], d)
        new = [
            _clip(coords[j] - step_size * grads[j] + noise_coef * eps[j], clamp)
            for j in range(d)
        ]
        xn = jnp.concatenate(new, axis=0)

        @pl.when((i + 1) % thin == 0)
        def _():
            k = (i + 1) // thin - 1
            scratch_ref[...] = xn
            dma = pltpu.make_async_copy(
                scratch_ref, traj_ref.at[k, :, pl.ds(col0, block)], sem_ref
            )
            dma.start()
            dma.wait()

        return xn

    out_ref[...] = jax.lax.fori_loop(0, n_steps, body, x_ref[...])


def _mixture_chain_traj_sched_kernel(seed_ref, sched_ref, x_ref, means_ref,
                                     out_ref, traj_ref, scratch_ref, sem_ref,
                                     *, n_steps, thin, inv_var, n_components,
                                     d, block, clamp):
    """Scheduled + trajectory composition for the mixture chain: per-step
    ``[η_t, noise_coef_t]`` from SMEM *and* every ``thin``-th state DMA'd to
    HBM — the Energy-Matching annealed R̂/ESS workload
    (``TemperatureScheduler`` + ``return_trajectory``) in one kernel.
    ``seed_ref`` carries ``[seed, step0, kept0]`` (see the double-well
    variant)."""
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    step0 = seed_ref[1]
    kept0 = seed_ref[2]
    means = means_ref[...]
    col0 = pl.program_id(0) * block

    def body(i, x):
        h = sched_ref[0, i]
        nc = sched_ref[1, i]
        coords = _split_coords(x, d)
        grads, _ = _tile_grad_logp(coords, means, inv_var, n_components, d)
        eps = _normal_tiles(coords[0].shape, d)
        new = [_clip(coords[j] - h * grads[j] + nc * eps[j], clamp) for j in range(d)]
        xn = jnp.concatenate(new, axis=0)
        g = step0 + i + 1

        @pl.when(g % thin == 0)
        def _():
            k = g // thin - 1 - kept0
            scratch_ref[...] = xn
            dma = pltpu.make_async_copy(
                scratch_ref, traj_ref.at[k, :, pl.ds(col0, block)], sem_ref
            )
            dma.start()
            dma.wait()

        return xn

    out_ref[...] = jax.lax.fori_loop(0, n_steps, body, x_ref[...])


def _mixture_chain_traj_sched_noise_kernel(meta_ref, sched_ref, x_ref,
                                           means_ref, noise_ref, out_ref,
                                           traj_ref, scratch_ref, sem_ref, *,
                                           n_steps, thin, inv_var,
                                           n_components, d, block, clamp):
    """Injected-noise variant of :func:`_mixture_chain_traj_sched_kernel`
    (exact-parity CI path); ``meta_ref`` = ``[step0, kept0]``."""
    step0 = meta_ref[0]
    kept0 = meta_ref[1]
    means = means_ref[...]
    col0 = pl.program_id(0) * block

    def body(i, x):
        h = sched_ref[0, i]
        nc = sched_ref[1, i]
        coords = _split_coords(x, d)
        grads, _ = _tile_grad_logp(coords, means, inv_var, n_components, d)
        eps = _split_coords(noise_ref[pl.ds(i, 1)][0], d)
        new = [_clip(coords[j] - h * grads[j] + nc * eps[j], clamp) for j in range(d)]
        xn = jnp.concatenate(new, axis=0)
        g = step0 + i + 1

        @pl.when(g % thin == 0)
        def _():
            k = g // thin - 1 - kept0
            scratch_ref[...] = xn
            dma = pltpu.make_async_copy(
                scratch_ref, traj_ref.at[k, :, pl.ds(col0, block)], sem_ref
            )
            dma.start()
            dma.wait()

        return xn

    out_ref[...] = jax.lax.fori_loop(0, n_steps, body, x_ref[...])


def pack_mixture_params(
    means: Array, log_weights: Optional[Array], mass: Optional[Array] = None
) -> Array:
    """Pack (K, d) means + (K,) log-weights into the kernels' 2D tile.

    Layout: ``(round8(d+1), K_pad)`` — row ``i < d`` holds coordinate ``i`` of
    every mean, row ``d`` the log-weights, K padded to the 128-lane multiple.
    With ``mass`` (a (d,) diagonal mass matrix, HMC kernels), row ``d+1``
    carries the per-dimension masses in columns ``0..d-1``.
    """
    k, d = means.shape
    if log_weights is None:
        log_weights = jnp.full((k,), -math.log(k), jnp.float32)
    k_pad = _round_up(k, _LANE)
    rows = _round_up(d + 1 + (1 if mass is not None else 0), 8)
    packed = jnp.zeros((rows, k_pad), jnp.float32)
    packed = packed.at[:d, :k].set(means.T)
    packed = packed.at[d, :k].set(log_weights)
    if mass is not None:
        packed = packed.at[d + 1, :d].set(jnp.broadcast_to(mass, (d,)))
    return packed


def chains_to_tiles(x: Array) -> Tuple[Array, int]:
    """Re-lay (n_chains, d) states into the kernels' (8·d, lanes) tile form."""
    n_chains, d = x.shape
    padded = _round_up(n_chains, 8 * _LANE)
    lanes = padded // 8
    xpad = jnp.pad(x, ((0, padded - n_chains), (0, 0)))  # (padded, d)
    return (
        jnp.concatenate([xpad[:, i].reshape(8, lanes) for i in range(d)], axis=0),
        padded,
    )


def tiles_to_chains(t: Array, n_chains: int, d: int) -> Array:
    padded = t.shape[1] * 8
    return jnp.stack(
        [t[8 * i : 8 * (i + 1)].reshape(padded) for i in range(d)], axis=-1
    )[:n_chains]


def _mixture_block(lanes: int, d: int, block_chains: int, n_staged: int = 0) -> int:
    """Grid block width (lanes) fitting the (8d, block) state in VMEM.

    ``n_staged`` is the number of per-step noise tensors additionally staged
    as one ``(n_steps, 8d, block)`` VMEM block (the injected-noise CI path);
    0 for the in-kernel-PRNG kernels. The budget accounts for it so large
    ``n_steps × chains`` parity runs shrink the block instead of blowing the
    ~16 MB VMEM limit at compile time.
    """
    # ~6 live copies of the (8d, block) f32 state + the staged noise block;
    # stay well under ~16 MB VMEM
    budget = (4 << 20) // (8 * d * 4 * (6 + n_staged))
    block = min(max(min(block_chains // 8, budget), _LANE), lanes)
    while lanes % block:
        block //= 2
    return max(block, _LANE)


def mixture_langevin_chain(
    x0: Array,
    means: Array,
    n_steps: int,
    step_size: Union[float, Array],
    noise_scale: Union[float, Array] = 1.0,
    *,
    scale: float = 1.0,
    log_weights: Optional[Array] = None,
    precision: Optional[Array] = None,
    seed: int = 0,
    clamp: Optional[Tuple[float, float]] = None,
    noise: Optional[Array] = None,
    block_chains: int = 1 << 20,
    interpret: bool = False,
) -> Array:
    """Full n-step Langevin chain on a d-dim isotropic Gaussian mixture in one kernel.

    ``x0``: (n_chains, d); ``means``: (K, d). The benchmark-critical
    8gaussians workload (BASELINE config 1) with zero HBM round-trips between
    steps; a single-component mixture is an isotropic Gaussian (the
    ``GaussianEnergy`` fused route). Chains are re-laid-out as (8·d, lanes)
    blocks — 8 sublane rows per coordinate — so the per-component softmax math
    runs at full VPU utilization (see :func:`_mixture_chain_kernel`).
    ``noise`` (shape ``(n_steps, n_chains, d)``) replaces the in-kernel PRNG
    for exact-parity CI tests; ``clamp`` bounds the state per step.
    ``step_size``/``noise_scale`` may each be a ``(n_steps,)`` per-step
    schedule (see module docstring).
    """
    n_chains, dim = x0.shape
    k, kd = means.shape
    if kd != dim:
        raise ValueError(f"means dim {kd} != state dim {dim}")
    if dim > 64 or k * dim > 1024:
        raise ValueError(
            "mixture_langevin_chain unrolls K components x d dims in-kernel; "
            f"K*d={k * dim}, d={dim} exceeds the supported size (d<=64, K*d<=1024)"
        )

    xt, padded = chains_to_tiles(x0)
    lanes = padded // 8
    packed, n_comp = _pack_target(means, log_weights, precision)
    sched = _schedule_table(step_size, noise_scale, n_steps)
    staged = 0
    if noise is not None:
        staged = int(n_steps) if sched is None else min(int(n_steps), _SCHED_CHUNK)
    block = _mixture_block(lanes, dim, block_chains, n_staged=staged)

    kw = dict(
        inv_var=1.0 / float(scale) ** 2,
        n_components=n_comp,
        d=int(dim),
        clamp=(float(clamp[0]), float(clamp[1])) if clamp is not None else None,
    )
    rows = 8 * dim
    grid = (lanes // block,)
    out_shape = jax.ShapeDtypeStruct((rows, lanes), jnp.float32)
    state_spec = pl.BlockSpec((rows, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    means_spec = pl.BlockSpec(
        packed.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    if noise is not None:
        if noise.shape != (n_steps, n_chains, dim):
            raise ValueError(
                f"noise must have shape {(n_steps, n_chains, dim)}, got {noise.shape}"
            )
        nt = jnp.stack([chains_to_tiles(noise[t])[0] for t in range(n_steps)])

    def noise_spec(steps):
        return pl.BlockSpec(
            (steps, rows, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        )

    if sched is None:
        ckw = dict(
            n_steps=int(n_steps),
            step_size=float(step_size),
            noise_coef=float(noise_scale) * math.sqrt(2.0 * float(step_size)),
            **kw,
        )
        if noise is None:
            out = pl.pallas_call(
                functools.partial(_mixture_chain_kernel, **ckw),
                out_shape=out_shape,
                grid=grid,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    state_spec,
                    means_spec,
                ],
                out_specs=state_spec,
                interpret=interpret,
            )(jnp.asarray([seed], jnp.int32), xt, packed)
        else:
            out = pl.pallas_call(
                functools.partial(_mixture_chain_noise_kernel, **ckw),
                out_shape=out_shape,
                grid=grid,
                in_specs=[state_spec, means_spec, noise_spec(int(n_steps))],
                out_specs=state_spec,
                interpret=interpret,
            )(xt, packed, nt)
    else:
        cache_key = (
            "mix_chain_sched", _SCHED_CHUNK, int(n_steps), rows, lanes, block, grid,
            tuple(sorted(kw.items())), packed.shape, bool(interpret),
            noise is not None,
        )

        def make():
            def run(xt_a, packed_a, sched_a, aux):
                out_a = xt_a
                for c, (s0, s1) in enumerate(_sched_chunks(n_steps)):
                    ckw = dict(n_steps=s1 - s0, **kw)
                    if noise is None:
                        # per-(chunk, block) distinct seeds: offset by grid size
                        out_a = pl.pallas_call(
                            functools.partial(_mixture_chain_sched_kernel, **ckw),
                            out_shape=out_shape,
                            grid=grid,
                            in_specs=[
                                pl.BlockSpec(memory_space=pltpu.SMEM),
                                pl.BlockSpec(memory_space=pltpu.SMEM),
                                state_spec,
                                means_spec,
                            ],
                            out_specs=state_spec,
                            interpret=interpret,
                        )(aux + c * grid[0], sched_a[:, s0:s1], out_a, packed_a)
                    else:
                        out_a = pl.pallas_call(
                            functools.partial(
                                _mixture_chain_sched_noise_kernel, **ckw
                            ),
                            out_shape=out_shape,
                            grid=grid,
                            in_specs=[
                                pl.BlockSpec(memory_space=pltpu.SMEM),
                                state_spec,
                                means_spec,
                                noise_spec(s1 - s0),
                            ],
                            out_specs=state_spec,
                            interpret=interpret,
                        )(sched_a[:, s0:s1], out_a, packed_a, aux[s0:s1])
                return out_a

            return run

        aux = jnp.asarray([seed], jnp.int32) if noise is None else nt
        out = _cached_jit(cache_key, make)(xt, packed, sched, aux)
    return tiles_to_chains(out, n_chains, dim)


def mixture_langevin_chain_trajectory(
    x0: Array,
    means: Array,
    n_steps: int,
    step_size: Union[float, Array],
    noise_scale: Union[float, Array] = 1.0,
    *,
    thin: int = 1,
    scale: float = 1.0,
    log_weights: Optional[Array] = None,
    precision: Optional[Array] = None,
    seed: int = 0,
    clamp: Optional[Tuple[float, float]] = None,
    noise: Optional[Array] = None,
    block_chains: int = 1 << 20,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Whole-chain mixture Langevin recording every ``thin``-th state.

    Same chain as :func:`mixture_langevin_chain`, but every ``thin``-th state
    is DMA'd from VMEM to an HBM-resident trajectory while the chain itself
    stays VMEM-resident — the fused answer to ``return_trajectory=True``
    (kept slots match the library loop: states after steps ``thin, 2·thin,
    …``; trailing ``n_steps % thin`` steps still execute and land in
    ``final``). ``step_size``/``noise_scale`` may each be a ``(n_steps,)``
    per-step schedule — the SMEM schedule table composes with the trajectory
    DMA, so an annealed ``TemperatureScheduler`` sweep with trajectory
    recording (the Energy-Matching R̂/ESS workload) rides this kernel.
    Returns ``(traj, final)`` with ``traj`` of shape ``(n_steps//thin,
    n_chains, d)`` and ``final`` ``(n_chains, d)``.
    """
    n_chains, dim = x0.shape
    k, kd = means.shape
    if kd != dim:
        raise ValueError(f"means dim {kd} != state dim {dim}")
    if dim > 64 or k * dim > 1024:
        raise ValueError(
            "mixture_langevin_chain_trajectory unrolls K components x d dims "
            f"in-kernel; K*d={k * dim}, d={dim} exceeds the supported size "
            "(d<=64, K*d<=1024)"
        )
    if thin < 1:
        raise ValueError("thin must be >= 1")
    n_kept = int(n_steps) // int(thin)
    if n_kept < 1:
        raise ValueError("n_steps // thin must be >= 1 for trajectory output")

    xt, padded = chains_to_tiles(x0)
    lanes = padded // 8
    packed, n_comp = _pack_target(means, log_weights, precision)
    sched = _schedule_table(step_size, noise_scale, n_steps)
    staged = 0
    if noise is not None:
        staged = int(n_steps) if sched is None else min(int(n_steps), _SCHED_CHUNK)
    # +1 staged copy for the DMA scratch tile
    block = _mixture_block(lanes, dim, block_chains, n_staged=staged + 1)
    rows = 8 * dim
    grid = (lanes // block,)
    kw = dict(
        thin=int(thin),
        inv_var=1.0 / float(scale) ** 2,
        n_components=n_comp,
        d=int(dim),
        block=int(block),
        clamp=(float(clamp[0]), float(clamp[1])) if clamp is not None else None,
    )
    state_spec = pl.BlockSpec((rows, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    means_spec = pl.BlockSpec(packed.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_specs = (state_spec, pl.BlockSpec(memory_space=pl.ANY))
    scratch = [
        pltpu.VMEM((rows, block), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
    ]

    def out_shapes(kept):
        return (
            jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
            jax.ShapeDtypeStruct((kept, rows, lanes), jnp.float32),
        )

    def noise_spec(steps):
        return pl.BlockSpec(
            (steps, rows, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        )

    if noise is not None:
        if noise.shape != (n_steps, n_chains, dim):
            raise ValueError(
                f"noise must have shape {(n_steps, n_chains, dim)}, got {noise.shape}"
            )
        nt = jnp.stack([chains_to_tiles(noise[t])[0] for t in range(n_steps)])

    if sched is None:
        ckw = dict(
            n_steps=int(n_steps),
            step_size=float(step_size),
            noise_coef=float(noise_scale) * math.sqrt(2.0 * float(step_size)),
            **kw,
        )
        if noise is None:
            final, traj = pl.pallas_call(
                functools.partial(_mixture_chain_traj_kernel, **ckw),
                out_shape=out_shapes(n_kept),
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
            final, traj = pl.pallas_call(
                functools.partial(_mixture_chain_traj_noise_kernel, **ckw),
                out_shape=out_shapes(n_kept),
                grid=grid,
                in_specs=[state_spec, means_spec, noise_spec(int(n_steps))],
                out_specs=out_specs,
                scratch_shapes=scratch,
                interpret=interpret,
            )(xt, packed, nt)
    else:
        cache_key = (
            "mix_traj_sched", _SCHED_CHUNK, int(n_steps), int(thin), rows, lanes, block, grid,
            tuple(sorted(kw.items())), packed.shape, bool(interpret),
            noise is not None,
        )

        def make():
            def run(xt_a, packed_a, sched_a, aux):
                final_a = xt_a
                parts = []
                for c, (s0, s1) in enumerate(_sched_chunks(n_steps)):
                    kept_c = s1 // int(thin) - s0 // int(thin)
                    if kept_c == 0:
                        # no kept slot in this chunk: plain scheduled advance
                        nkw = dict(
                            n_steps=s1 - s0,
                            inv_var=kw["inv_var"],
                            n_components=n_comp,
                            d=int(dim),
                            clamp=kw["clamp"],
                        )
                        if noise is None:
                            final_a = pl.pallas_call(
                                functools.partial(_mixture_chain_sched_kernel, **nkw),
                                out_shape=jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
                                grid=grid,
                                in_specs=[
                                    pl.BlockSpec(memory_space=pltpu.SMEM),
                                    pl.BlockSpec(memory_space=pltpu.SMEM),
                                    state_spec,
                                    means_spec,
                                ],
                                out_specs=state_spec,
                                interpret=interpret,
                            )(aux + c * grid[0], sched_a[:, s0:s1], final_a, packed_a)
                        else:
                            final_a = pl.pallas_call(
                                functools.partial(
                                    _mixture_chain_sched_noise_kernel, **nkw
                                ),
                                out_shape=jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
                                grid=grid,
                                in_specs=[
                                    pl.BlockSpec(memory_space=pltpu.SMEM),
                                    state_spec,
                                    means_spec,
                                    noise_spec(s1 - s0),
                                ],
                                out_specs=state_spec,
                                interpret=interpret,
                            )(sched_a[:, s0:s1], final_a, packed_a, aux[s0:s1])
                        continue
                    ckw = dict(n_steps=s1 - s0, **kw)
                    chunk_meta = jnp.asarray([s0, s0 // int(thin)], jnp.int32)
                    if noise is None:
                        meta = jnp.concatenate([aux + c * grid[0], chunk_meta])
                        final_a, traj_c = pl.pallas_call(
                            functools.partial(_mixture_chain_traj_sched_kernel, **ckw),
                            out_shape=out_shapes(kept_c),
                            grid=grid,
                            in_specs=[
                                pl.BlockSpec(memory_space=pltpu.SMEM),
                                pl.BlockSpec(memory_space=pltpu.SMEM),
                                state_spec,
                                means_spec,
                            ],
                            out_specs=out_specs,
                            scratch_shapes=scratch,
                            interpret=interpret,
                        )(meta, sched_a[:, s0:s1], final_a, packed_a)
                    else:
                        final_a, traj_c = pl.pallas_call(
                            functools.partial(
                                _mixture_chain_traj_sched_noise_kernel, **ckw
                            ),
                            out_shape=out_shapes(kept_c),
                            grid=grid,
                            in_specs=[
                                pl.BlockSpec(memory_space=pltpu.SMEM),
                                pl.BlockSpec(memory_space=pltpu.SMEM),
                                state_spec,
                                means_spec,
                                noise_spec(s1 - s0),
                            ],
                            out_specs=out_specs,
                            scratch_shapes=scratch,
                            interpret=interpret,
                        )(chunk_meta, sched_a[:, s0:s1], final_a, packed_a, aux[s0:s1])
                    parts.append(traj_c)
                traj_a = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
                return traj_a, final_a

            return run

        aux = jnp.asarray([seed], jnp.int32) if noise is None else nt
        traj, final = _cached_jit(cache_key, make)(xt, packed, sched, aux)
    traj_chains = jax.vmap(lambda t: tiles_to_chains(t, n_chains, dim))(traj)
    return traj_chains, tiles_to_chains(final, n_chains, dim)


# ---------------------------------------------------------------------------
# self-test / benchmark (mirrors reference fused_langevin.py:183-266)
# ---------------------------------------------------------------------------


def _selftest():  # pragma: no cover - exercised via `python -m`
    import time

    from ..core.energies import DoubleWellEnergy, GaussianMixtureEnergy
    from ..samplers import LangevinDynamics

    key = jax.random.PRNGKey(0)
    n, d, steps = 4096, 32, 1000
    x = jax.random.normal(key, (n, d))
    dw = DoubleWellEnergy()

    # correctness 1: fused step vs eager update under injected noise
    g = dw.gradient(x)
    eps = jax.random.normal(jax.random.fold_in(key, 1), x.shape)
    fused = fused_langevin_step(x, g, 0.01, 1.0, noise=eps)
    eager = x - 0.01 * g + math.sqrt(2 * 0.01) * eps
    err = float(jnp.max(jnp.abs(fused - eager)))
    print(f"fused step max-abs-err vs eager: {err:.2e}")
    assert err < 1e-6

    # correctness 2: stationary moment sanity for the chain kernel
    chain = doublewell_langevin_chain(x, 2000, 0.01, 1.0, seed=7)
    m = float(jnp.mean(jnp.abs(chain)))
    print(f"double-well chain E|x| = {m:.3f} (expect ~0.8-1.1)")

    def timeit(fn, iters=10):
        jax.block_until_ready(fn())
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    sampler = LangevinDynamics(dw, step_size=0.01)
    t_lib = timeit(lambda: sampler.sample(key, x=x, n_steps=steps))
    t_chain = timeit(lambda: doublewell_langevin_chain(x, steps, 0.01, 1.0))

    mix = GaussianMixtureEnergy.eight_gaussians()
    x2 = jax.random.normal(key, (10_000, 2))
    s2 = LangevinDynamics(mix, step_size=0.05)
    t_lib_mix = timeit(lambda: s2.sample(key, x=x2, n_steps=steps))
    t_mix = timeit(
        lambda: mixture_langevin_chain(x2, mix.means, steps, 0.05, scale=float(mix.scale))
    )

    ups = lambda t, nn: nn * steps / t
    print(f"[doublewell {n}x{d}x{steps}] library scan: {ups(t_lib, n*d):.3e} u/s | "
          f"pallas chain: {ups(t_chain, n*d):.3e} u/s | speedup {t_lib/t_chain:.2f}x")
    print(f"[8gaussians 10000x2x{steps}] library scan: {ups(t_lib_mix, 10_000):.3e} u/s | "
          f"pallas chain: {ups(t_mix, 10_000):.3e} u/s | speedup {t_lib_mix/t_mix:.2f}x")


if __name__ == "__main__":  # pragma: no cover
    _selftest()

"""Exact-parity CI tests for the whole-chain Pallas kernels.

VERDICT round-1 gap: the chain kernels (`doublewell_langevin_chain`,
`mixture_langevin_chain`, `mixture_hmc_chain`) only ran on real TPU. Round 2
adds injected-noise variants — the reference's correctness pattern
(``torchebm/cuda/fused_langevin.py:90-138``: same noise ⇒ max-abs-err vs the
eager update) — which run here step-for-step against plain-jnp reference
loops in interpret mode on CPU (compiled on TPU).

The reference loops below mirror the kernels' accumulation order (explicit
loops over components and coordinates) so float32 parity is tight.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchebm_tpu.ops import (
    doublewell_langevin_chain,
    mixture_hmc_chain,
    mixture_langevin_chain,
)
from torchebm_tpu.ops.fused_langevin import chains_to_tiles, tiles_to_chains

INTERPRET = jax.default_backend() != "tpu"


def _clip(x, clamp):
    return x if clamp is None else jnp.clip(x, clamp[0], clamp[1])


def _mix_grad_logp(x, means, logw, inv_var):
    """Plain-jnp mirror of the kernels' mixture math (same op order)."""
    k, d = means.shape
    logits = []
    for j in range(k):
        sq = None
        for i in range(d):
            diff = x[:, i] - means[j, i]
            sq = diff * diff if sq is None else sq + diff * diff
        logits.append(logw[j] - 0.5 * inv_var * sq)
    m = logits[0]
    for j in range(1, k):
        m = jnp.maximum(m, logits[j])
    nums = [jnp.zeros_like(x[:, 0]) for _ in range(d)]
    den = jnp.zeros_like(x[:, 0])
    for j in range(k):
        w = jnp.exp(logits[j] - m)
        den = den + w
        for i in range(d):
            nums[i] = nums[i] + w * means[j, i]
    inv_den = 1.0 / den
    grad = jnp.stack([(x[:, i] - nums[i] * inv_den) * inv_var for i in range(d)], -1)
    return grad, m + jnp.log(den)


# ---------------------------------------------------------------- double well


@pytest.mark.parametrize("clamp", [None, (-1.5, 1.5)])
def test_doublewell_chain_noise_parity(key, clamp):
    n_steps, shape = 17, (37, 3)  # non-aligned on purpose
    h, ns, bh, b = 0.01, 0.8, 2.0, 1.0
    x0 = jax.random.normal(key, shape)
    noise = jax.random.normal(jax.random.fold_in(key, 1), (n_steps, *shape))

    out = doublewell_langevin_chain(
        x0, n_steps, h, ns, barrier_height=bh, b=b, clamp=clamp,
        noise=noise, interpret=INTERPRET,
    )

    coef = ns * math.sqrt(2 * h)
    x = x0
    for t in range(n_steps):
        grad = 4.0 * bh * x * (x * x - b * b)
        x = _clip(x - h * grad + coef * noise[t], clamp)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


@pytest.mark.parametrize("clamp", [None, (-1.5, 1.5)])
def test_doublewell_chain_scheduled_noise_parity(key, clamp):
    """Round-3: per-step (n_steps,) step/noise schedules ride the SMEM-table
    kernels — parity vs a plain-jnp loop with the same per-step values."""
    n_steps, shape = 13, (29, 2)
    bh, b = 2.0, 1.0
    hs = jnp.linspace(0.02, 0.005, n_steps)
    nss = jnp.linspace(0.0, 1.0, n_steps)  # annealed-in noise (EM profile shape)
    x0 = jax.random.normal(key, shape)
    noise = jax.random.normal(jax.random.fold_in(key, 1), (n_steps, *shape))

    out = doublewell_langevin_chain(
        x0, n_steps, hs, nss, barrier_height=bh, b=b, clamp=clamp,
        noise=noise, interpret=INTERPRET,
    )

    x = x0
    for t in range(n_steps):
        grad = 4.0 * bh * x * (x * x - b * b)
        coef = nss[t] * jnp.sqrt(2.0 * hs[t])
        x = _clip(x - hs[t] * grad + coef * noise[t], clamp)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_doublewell_scheduled_constant_table_matches_constant_kernel(key):
    """A constant-valued schedule table must reproduce the baked-constant
    kernel bit-for-bit under the same injected noise."""
    n_steps, shape = 9, (24, 2)
    h, ns = 0.01, 0.8
    x0 = jax.random.normal(key, shape)
    noise = jax.random.normal(jax.random.fold_in(key, 1), (n_steps, *shape))
    const = doublewell_langevin_chain(
        x0, n_steps, h, ns, noise=noise, interpret=INTERPRET
    )
    sched = doublewell_langevin_chain(
        x0, n_steps, jnp.full((n_steps,), h), jnp.full((n_steps,), ns),
        noise=noise, interpret=INTERPRET,
    )
    np.testing.assert_allclose(np.asarray(sched), np.asarray(const), atol=1e-6)


def test_doublewell_scheduled_chunking_parity(key, monkeypatch):
    """Chains longer than _SCHED_CHUNK split into several launches; the state
    hand-off across chunk boundaries must be exact."""
    import torchebm_tpu.ops.fused_langevin as fl

    monkeypatch.setattr(fl, "_SCHED_CHUNK", 4)
    n_steps, shape = 11, (16, 2)  # 3 launches: 4 + 4 + 3
    hs = jnp.linspace(0.02, 0.005, n_steps)
    x0 = jax.random.normal(key, shape)
    noise = jax.random.normal(jax.random.fold_in(key, 1), (n_steps, *shape))

    out = doublewell_langevin_chain(
        x0, n_steps, hs, 0.7, noise=noise, interpret=INTERPRET
    )

    x = x0
    for t in range(n_steps):
        grad = 4.0 * 2.0 * x * (x * x - 1.0)
        x = x - hs[t] * grad + 0.7 * jnp.sqrt(2.0 * hs[t]) * noise[t]
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_schedule_shape_guard(key):
    x0 = jax.random.normal(key, (8, 2))
    with pytest.raises(ValueError, match="per-step schedule"):
        doublewell_langevin_chain(
            x0, 5, jnp.ones((3,)), 1.0, interpret=INTERPRET
        )


def test_doublewell_chain_noise_shape_guard(key):
    x0 = jax.random.normal(key, (8, 2))
    with pytest.raises(ValueError, match="noise must have shape"):
        doublewell_langevin_chain(
            x0, 5, 0.01, noise=jnp.zeros((4, 8, 2)), interpret=INTERPRET
        )


# ------------------------------------------------------------------- mixture


@pytest.mark.parametrize("d,k,clamp", [(2, 8, None), (5, 4, None), (3, 3, (-6.0, 6.0))])
def test_mixture_chain_noise_parity(key, d, k, clamp):
    n, n_steps = 53, 11
    h, ns, scale = 0.05, 0.9, 0.7
    means = 3.0 * jax.random.normal(jax.random.fold_in(key, 2), (k, d))
    logw = jax.nn.log_softmax(jax.random.normal(jax.random.fold_in(key, 3), (k,)))
    x0 = jax.random.normal(key, (n, d))
    noise = jax.random.normal(jax.random.fold_in(key, 4), (n_steps, n, d))

    out = mixture_langevin_chain(
        x0, means, n_steps, h, ns, scale=scale, log_weights=logw,
        clamp=clamp, noise=noise, interpret=INTERPRET,
    )

    coef = ns * math.sqrt(2 * h)
    inv_var = 1.0 / scale**2
    x = x0
    for t in range(n_steps):
        grad, _ = _mix_grad_logp(x, means, logw, inv_var)
        x = _clip(x - h * grad + coef * noise[t], clamp)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_mixture_chain_default_weights_parity(key):
    """log_weights=None means uniform — same as passing them explicitly."""
    means = jnp.array([[0.0, 2.0], [1.0, -1.0], [-2.0, 0.5]])
    x0 = jax.random.normal(key, (16, 2))
    noise = jax.random.normal(jax.random.fold_in(key, 1), (4, 16, 2))
    a = mixture_langevin_chain(x0, means, 4, 0.05, noise=noise, interpret=INTERPRET)
    b = mixture_langevin_chain(
        x0, means, 4, 0.05, log_weights=jnp.full((3,), -math.log(3)),
        noise=noise, interpret=INTERPRET,
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.parametrize("d,k,clamp", [(2, 8, None), (3, 3, (-6.0, 6.0))])
def test_mixture_chain_scheduled_noise_parity(key, d, k, clamp):
    """Round-3: scheduled step/noise on the mixture chain kernel (the
    annealed Energy-Matching workload shape)."""
    n, n_steps = 47, 10
    scale = 0.7
    hs = jnp.linspace(0.08, 0.02, n_steps)
    nss = jnp.linspace(0.2, 1.0, n_steps)
    means = 3.0 * jax.random.normal(jax.random.fold_in(key, 2), (k, d))
    logw = jax.nn.log_softmax(jax.random.normal(jax.random.fold_in(key, 3), (k,)))
    x0 = jax.random.normal(key, (n, d))
    noise = jax.random.normal(jax.random.fold_in(key, 4), (n_steps, n, d))

    out = mixture_langevin_chain(
        x0, means, n_steps, hs, nss, scale=scale, log_weights=logw,
        clamp=clamp, noise=noise, interpret=INTERPRET,
    )

    inv_var = 1.0 / scale**2
    x = x0
    for t in range(n_steps):
        grad, _ = _mix_grad_logp(x, means, logw, inv_var)
        coef = nss[t] * jnp.sqrt(2.0 * hs[t])
        x = _clip(x - hs[t] * grad + coef * noise[t], clamp)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_mixture_scheduled_chunking_parity(key, monkeypatch):
    import torchebm_tpu.ops.fused_langevin as fl

    monkeypatch.setattr(fl, "_SCHED_CHUNK", 3)
    n, d, k, n_steps = 21, 2, 4, 8  # 3 launches: 3 + 3 + 2
    hs = jnp.linspace(0.08, 0.02, n_steps)
    means = 2.0 * jax.random.normal(jax.random.fold_in(key, 2), (k, d))
    x0 = jax.random.normal(key, (n, d))
    noise = jax.random.normal(jax.random.fold_in(key, 4), (n_steps, n, d))

    out = mixture_langevin_chain(
        x0, means, n_steps, hs, 0.9, noise=noise, interpret=INTERPRET
    )

    logw = jnp.full((k,), -math.log(k))
    x = x0
    for t in range(n_steps):
        grad, _ = _mix_grad_logp(x, means, logw, 1.0)
        x = x - hs[t] * grad + 0.9 * jnp.sqrt(2.0 * hs[t]) * noise[t]
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


@pytest.mark.parametrize("thin", [1, 3])
def test_doublewell_trajectory_noise_parity(key, thin):
    """Round-3 stretch: every thin-th state is DMA'd to the HBM trajectory;
    kept slots and the final state must match the plain-jnp loop exactly."""
    from torchebm_tpu.ops import doublewell_langevin_chain_trajectory

    n_steps, shape = 11, (21, 2)  # thin=3 -> 3 kept + 2 remainder steps
    h, ns, bh, b = 0.01, 0.8, 2.0, 1.0
    x0 = jax.random.normal(key, shape)
    noise = jax.random.normal(jax.random.fold_in(key, 1), (n_steps, *shape))

    traj, final = doublewell_langevin_chain_trajectory(
        x0, n_steps, h, ns, thin=thin, barrier_height=bh, b=b,
        noise=noise, interpret=INTERPRET,
    )

    coef = ns * math.sqrt(2 * h)
    x, kept = x0, []
    for t in range(n_steps):
        grad = 4.0 * bh * x * (x * x - b * b)
        x = x - h * grad + coef * noise[t]
        if (t + 1) % thin == 0:
            kept.append(x)
    assert traj.shape == (n_steps // thin, *shape)
    np.testing.assert_allclose(np.asarray(traj), np.asarray(jnp.stack(kept)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(final), np.asarray(x), atol=1e-5)


@pytest.mark.parametrize("d,k,thin", [(2, 8, 1), (3, 3, 4)])
def test_mixture_trajectory_noise_parity(key, d, k, thin):
    from torchebm_tpu.ops import mixture_langevin_chain_trajectory

    n, n_steps = 37, 9
    h, ns, scale = 0.05, 0.9, 0.7
    means = 3.0 * jax.random.normal(jax.random.fold_in(key, 2), (k, d))
    logw = jax.nn.log_softmax(jax.random.normal(jax.random.fold_in(key, 3), (k,)))
    x0 = jax.random.normal(key, (n, d))
    noise = jax.random.normal(jax.random.fold_in(key, 4), (n_steps, n, d))

    traj, final = mixture_langevin_chain_trajectory(
        x0, means, n_steps, h, ns, thin=thin, scale=scale, log_weights=logw,
        noise=noise, interpret=INTERPRET,
    )

    coef = ns * math.sqrt(2 * h)
    inv_var = 1.0 / scale**2
    x, kept = x0, []
    for t in range(n_steps):
        grad, _ = _mix_grad_logp(x, means, logw, inv_var)
        x = x - h * grad + coef * noise[t]
        if (t + 1) % thin == 0:
            kept.append(x)
    assert traj.shape == (n_steps // thin, n, d)
    np.testing.assert_allclose(np.asarray(traj), np.asarray(jnp.stack(kept)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(final), np.asarray(x), atol=1e-5)


@pytest.mark.parametrize("thin", [1, 3])
def test_doublewell_sched_trajectory_noise_parity(key, thin):
    """Round-4: the SMEM schedule table and the trajectory DMA compose —
    an annealed chain with trajectory recording must match the plain-jnp
    loop at every kept slot."""
    from torchebm_tpu.ops import doublewell_langevin_chain_trajectory

    n_steps, shape = 11, (21, 2)
    bh, b = 2.0, 1.0
    hs = jnp.linspace(0.05, 0.01, n_steps)
    nss = jnp.linspace(0.2, 1.0, n_steps)
    x0 = jax.random.normal(key, shape)
    noise = jax.random.normal(jax.random.fold_in(key, 1), (n_steps, *shape))

    traj, final = doublewell_langevin_chain_trajectory(
        x0, n_steps, hs, nss, thin=thin, barrier_height=bh, b=b,
        noise=noise, interpret=INTERPRET,
    )

    x, kept = x0, []
    for t in range(n_steps):
        grad = 4.0 * bh * x * (x * x - b * b)
        x = x - hs[t] * grad + nss[t] * jnp.sqrt(2.0 * hs[t]) * noise[t]
        if (t + 1) % thin == 0:
            kept.append(x)
    assert traj.shape == (n_steps // thin, *shape)
    np.testing.assert_allclose(np.asarray(traj), np.asarray(jnp.stack(kept)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(final), np.asarray(x), atol=1e-5)


@pytest.mark.parametrize("d,k,thin", [(2, 4, 2)])
def test_mixture_sched_trajectory_noise_parity(key, d, k, thin):
    from torchebm_tpu.ops import mixture_langevin_chain_trajectory

    n, n_steps = 37, 9
    scale = 0.7
    hs = jnp.linspace(0.08, 0.02, n_steps)
    nss = jnp.linspace(0.0, 1.0, n_steps)  # TemperatureScheduler-like ramp
    means = 3.0 * jax.random.normal(jax.random.fold_in(key, 2), (k, d))
    logw = jax.nn.log_softmax(jax.random.normal(jax.random.fold_in(key, 3), (k,)))
    x0 = jax.random.normal(key, (n, d))
    noise = jax.random.normal(jax.random.fold_in(key, 4), (n_steps, n, d))

    traj, final = mixture_langevin_chain_trajectory(
        x0, means, n_steps, hs, nss, thin=thin, scale=scale, log_weights=logw,
        noise=noise, interpret=INTERPRET,
    )

    inv_var = 1.0 / scale**2
    x, kept = x0, []
    for t in range(n_steps):
        grad, _ = _mix_grad_logp(x, means, logw, inv_var)
        x = x - hs[t] * grad + nss[t] * jnp.sqrt(2.0 * hs[t]) * noise[t]
        if (t + 1) % thin == 0:
            kept.append(x)
    assert traj.shape == (n_steps // thin, n, d)
    np.testing.assert_allclose(np.asarray(traj), np.asarray(jnp.stack(kept)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(final), np.asarray(x), atol=1e-5)


def test_sched_trajectory_chunked_parity(key, monkeypatch):
    """Chunked scheduled-trajectory chains: kept slots line up across
    launches (meta [step0, kept0] plumbing), including chunks that keep
    nothing (thin > chunk length exercises the plain-advance branch)."""
    import torchebm_tpu.ops.fused_langevin as fl
    from torchebm_tpu.ops import mixture_langevin_chain_trajectory

    monkeypatch.setattr(fl, "_SCHED_CHUNK", 2)
    n, d, k, n_steps, thin = 21, 2, 3, 10, 5  # kept at steps 5, 10 only
    hs = jnp.linspace(0.08, 0.02, n_steps)
    means = 2.0 * jax.random.normal(jax.random.fold_in(key, 2), (k, d))
    x0 = jax.random.normal(key, (n, d))
    noise = jax.random.normal(jax.random.fold_in(key, 4), (n_steps, n, d))

    traj, final = mixture_langevin_chain_trajectory(
        x0, means, n_steps, hs, 0.9, thin=thin, noise=noise, interpret=INTERPRET
    )

    logw = jnp.full((k,), -math.log(k))
    x, kept = x0, []
    for t in range(n_steps):
        grad, _ = _mix_grad_logp(x, means, logw, 1.0)
        x = x - hs[t] * grad + 0.9 * jnp.sqrt(2.0 * hs[t]) * noise[t]
        if (t + 1) % thin == 0:
            kept.append(x)
    assert traj.shape == (2, n, d)
    np.testing.assert_allclose(np.asarray(traj), np.asarray(jnp.stack(kept)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(final), np.asarray(x), atol=1e-5)


def test_trajectory_thin_guard(key):
    from torchebm_tpu.ops import doublewell_langevin_chain_trajectory

    with pytest.raises(ValueError, match="thin"):
        doublewell_langevin_chain_trajectory(
            jnp.zeros((8, 2)), 5, 0.01, thin=0, interpret=INTERPRET
        )
    with pytest.raises(ValueError, match="n_steps // thin"):
        doublewell_langevin_chain_trajectory(
            jnp.zeros((8, 2)), 3, 0.01, thin=5, interpret=INTERPRET
        )


def test_mixture_chain_size_guard(key):
    means = jnp.zeros((64, 32))  # K*d = 2048 > 1024
    with pytest.raises(ValueError, match="K\\*d"):
        mixture_langevin_chain(jnp.zeros((8, 32)), means, 3, 0.01, interpret=INTERPRET)


def test_tiles_round_trip(key):
    x = jax.random.normal(key, (1234, 7))
    t, padded = chains_to_tiles(x)
    assert t.shape == (8 * 7, padded // 8)
    np.testing.assert_array_equal(np.asarray(tiles_to_chains(t, 1234, 7)), np.asarray(x))


# ----------------------------------------------- full-covariance Gaussian


def _gauss_grad_logp(x, mean, prec):
    """Plain-jnp mirror of the kernels' full-covariance math (same op order)."""
    d = x.shape[1]
    diffs = [x[:, j] - mean[j] for j in range(d)]
    grads = []
    for i in range(d):
        g = None
        for j in range(d):
            t = prec[i, j] * diffs[j]
            g = t if g is None else g + t
        grads.append(g)
    quad = None
    for i in range(d):
        t = diffs[i] * grads[i]
        quad = t if quad is None else quad + t
    return jnp.stack(grads, -1), -0.5 * quad


def _corr_gauss(key, d):
    mean = jax.random.normal(key, (d,))
    a = jax.random.normal(jax.random.fold_in(key, 1), (d, d)) / math.sqrt(d)
    cov = a @ a.T + 0.5 * jnp.eye(d)
    return mean, jnp.linalg.inv(cov)


@pytest.mark.parametrize("d", [2, 4])
def test_gaussian_langevin_chain_noise_parity(key, d):
    """Round-3: precision= switches the chain kernels to the full-covariance
    Gaussian evaluator (grad = P(x-mu)) — the correlated-Gaussian ESS workload."""
    n, n_steps = 41, 9
    h, ns = 0.05, 0.9
    mean, prec = _corr_gauss(jax.random.fold_in(key, 2), d)
    x0 = jax.random.normal(key, (n, d))
    noise = jax.random.normal(jax.random.fold_in(key, 4), (n_steps, n, d))

    out = mixture_langevin_chain(
        x0, mean[None, :], n_steps, h, ns, precision=prec,
        noise=noise, interpret=INTERPRET,
    )

    coef = ns * math.sqrt(2 * h)
    x = x0
    for t in range(n_steps):
        grad, _ = _gauss_grad_logp(x, mean, prec)
        x = x - h * grad + coef * noise[t]
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_gaussian_precision_matches_isotropic_mixture(key):
    """precision = I/sigma^2 must reproduce the 1-component isotropic kernel
    bit-for-bit under the same injected noise (gradients are identical)."""
    n, d, n_steps, sigma = 24, 3, 6, 0.7
    mean = jax.random.normal(key, (d,))
    x0 = jax.random.normal(jax.random.fold_in(key, 1), (n, d))
    noise = jax.random.normal(jax.random.fold_in(key, 2), (n_steps, n, d))
    iso = mixture_langevin_chain(
        x0, mean[None, :], n_steps, 0.05, scale=sigma, noise=noise,
        interpret=INTERPRET,
    )
    full = mixture_langevin_chain(
        x0, mean[None, :], n_steps, 0.05, precision=jnp.eye(d) / sigma**2,
        noise=noise, interpret=INTERPRET,
    )
    np.testing.assert_allclose(np.asarray(full), np.asarray(iso), atol=1e-5)


@pytest.mark.parametrize("d", [2, 3])
def test_gaussian_mala_chain_noise_parity(key, d):
    from torchebm_tpu.ops import mixture_mala_chain

    n, n_steps = 33, 7
    eta = 0.2
    mean, prec = _corr_gauss(jax.random.fold_in(key, 2), d)
    x0 = jax.random.normal(key, (n, d))
    noise = jax.random.normal(jax.random.fold_in(key, 4), (n_steps, n, d))
    unif = jax.random.uniform(jax.random.fold_in(key, 5), (n_steps, n))

    samples, acc = mixture_mala_chain(
        x0, mean[None, :], n_steps, eta, precision=prec,
        noise=noise, uniforms=unif, interpret=INTERPRET,
    )

    coef = math.sqrt(2 * eta)
    x = x0
    acc_sum = jnp.zeros((n,))
    for t in range(n_steps):
        gx, lp_x = _gauss_grad_logp(x, mean, prec)
        y = x - eta * gx + coef * noise[t]
        gy, lp_y = _gauss_grad_logp(y, mean, prec)
        sq_xy = jnp.zeros((n,))
        sq_yx = jnp.zeros((n,))
        for i in range(d):
            dxy = x[:, i] - y[:, i] + eta * gy[:, i]
            dyx = y[:, i] - x[:, i] + eta * gx[:, i]
            sq_xy = sq_xy + dxy * dxy
            sq_yx = sq_yx + dyx * dyx
        log_ratio = (lp_y - lp_x) + (sq_yx - sq_xy) / (4.0 * eta)
        accept_prob = jnp.minimum(jnp.exp(jnp.clip(log_ratio, -50.0, 50.0)), 1.0)
        take = unif[t] < accept_prob
        x = jnp.where(take[:, None], y, x)
        acc_sum = acc_sum + accept_prob
    np.testing.assert_allclose(np.asarray(samples), np.asarray(x), atol=2e-4)
    np.testing.assert_allclose(np.asarray(acc), np.asarray(acc_sum / n_steps), atol=1e-5)


def test_gaussian_hmc_chain_noise_parity(key):
    from torchebm_tpu.ops import mixture_hmc_chain

    n, n_draws, n_lf, d = 29, 5, 4, 3
    h = 0.25
    mean, prec = _corr_gauss(jax.random.fold_in(key, 2), d)
    x0 = jax.random.normal(key, (n, d))
    noise = jax.random.normal(jax.random.fold_in(key, 4), (n_draws, n, d))
    unif = jax.random.uniform(jax.random.fold_in(key, 5), (n_draws, n))

    samples, acc = mixture_hmc_chain(
        x0, mean[None, :], n_draws, h, n_lf, precision=prec,
        noise=noise, uniforms=unif, interpret=INTERPRET,
    )

    x = x0
    acc_sum = jnp.zeros((n,))
    for t in range(n_draws):
        p = noise[t]
        g, lp0 = _gauss_grad_logp(x, mean, prec)
        k0 = p[:, 0] * p[:, 0]
        for i in range(1, d):
            k0 = k0 + p[:, i] * p[:, i]
        h0 = -lp0 + 0.5 * k0
        q, mom = x, p
        for _ in range(n_lf):
            mom = mom - 0.5 * h * g
            q = q + h * mom
            g, _ = _gauss_grad_logp(q, mean, prec)
            mom = mom - 0.5 * h * g
        _, lp1 = _gauss_grad_logp(q, mean, prec)
        k1 = mom[:, 0] * mom[:, 0]
        for i in range(1, d):
            k1 = k1 + mom[:, i] * mom[:, i]
        h1 = -lp1 + 0.5 * k1
        accept_prob = jnp.minimum(jnp.exp(jnp.clip(h0 - h1, -50.0, 50.0)), 1.0)
        take = unif[t] < accept_prob
        x = jnp.where(take[:, None], q, x)
        g, _ = _gauss_grad_logp(x, mean, prec)
        acc_sum = acc_sum + accept_prob
    np.testing.assert_allclose(np.asarray(samples), np.asarray(x), atol=2e-4)
    np.testing.assert_allclose(np.asarray(acc), np.asarray(acc_sum / n_draws), atol=1e-5)


def test_gaussian_precision_guards(key):
    means2 = jnp.zeros((2, 2))
    with pytest.raises(ValueError, match="single"):
        mixture_langevin_chain(
            jnp.zeros((8, 2)), means2, 3, 0.01, precision=jnp.eye(2),
            interpret=INTERPRET,
        )
    d = 33
    with pytest.raises(ValueError, match="d=33"):
        mixture_langevin_chain(
            jnp.zeros((8, d)), jnp.zeros((1, d)), 3, 0.01,
            precision=jnp.eye(d), interpret=INTERPRET,
        )


# ----------------------------------------------------------------------- HMC


@pytest.mark.parametrize("d,k", [(2, 8), (3, 4)])
def test_hmc_chain_noise_parity(key, d, k):
    n, n_draws, n_lf = 41, 6, 4
    h, scale = 0.25, 0.8
    means = 3.0 * jax.random.normal(jax.random.fold_in(key, 2), (k, d))
    logw = jax.nn.log_softmax(jax.random.normal(jax.random.fold_in(key, 3), (k,)))
    x0 = jax.random.normal(key, (n, d))
    noise = jax.random.normal(jax.random.fold_in(key, 4), (n_draws, n, d))
    unif = jax.random.uniform(jax.random.fold_in(key, 5), (n_draws, n))

    samples, acc = mixture_hmc_chain(
        x0, means, n_draws, h, n_lf, scale=scale, log_weights=logw,
        noise=noise, uniforms=unif, interpret=INTERPRET,
    )

    inv_var = 1.0 / scale**2
    x = x0
    acc_sum = jnp.zeros((n,))
    for t in range(n_draws):
        p = noise[t]
        g, lp0 = _mix_grad_logp(x, means, logw, inv_var)
        k0 = p[:, 0] * p[:, 0]
        for i in range(1, d):
            k0 = k0 + p[:, i] * p[:, i]
        h0 = -lp0 + 0.5 * k0
        q, mom = x, p
        for _ in range(n_lf):
            mom = mom - 0.5 * h * g
            q = q + h * mom
            g, _ = _mix_grad_logp(q, means, logw, inv_var)
            mom = mom - 0.5 * h * g
        _, lp1 = _mix_grad_logp(q, means, logw, inv_var)
        k1 = mom[:, 0] * mom[:, 0]
        for i in range(1, d):
            k1 = k1 + mom[:, i] * mom[:, i]
        h1 = -lp1 + 0.5 * k1
        accept_prob = jnp.minimum(jnp.exp(jnp.clip(h0 - h1, -50.0, 50.0)), 1.0)
        take = unif[t] < accept_prob
        x = jnp.where(take[:, None], q, x)
        # re-derive the current gradient for the next draw (kernel recomputes)
        g, _ = _mix_grad_logp(x, means, logw, inv_var)
        acc_sum = acc_sum + accept_prob
    np.testing.assert_allclose(np.asarray(samples), np.asarray(x), atol=2e-4)
    np.testing.assert_allclose(np.asarray(acc), np.asarray(acc_sum / n_draws), atol=1e-5)


def test_hmc_chain_diag_mass_parity(key):
    """Diagonal-mass HMC kernel vs the plain-jnp reference with library
    semantics: p = ε√m, K = ½Σp²/m, q += h·p/m."""
    n, n_draws, n_lf, d, k = 33, 5, 3, 3, 4
    h, scale = 0.2, 0.8
    mass = jnp.array([1.0, 4.0, 0.25])
    means = 2.5 * jax.random.normal(jax.random.fold_in(key, 2), (k, d))
    logw = jax.nn.log_softmax(jax.random.normal(jax.random.fold_in(key, 3), (k,)))
    x0 = jax.random.normal(key, (n, d))
    noise = jax.random.normal(jax.random.fold_in(key, 4), (n_draws, n, d))
    unif = jax.random.uniform(jax.random.fold_in(key, 5), (n_draws, n))

    samples, acc = mixture_hmc_chain(
        x0, means, n_draws, h, n_lf, scale=scale, log_weights=logw, mass=mass,
        noise=noise, uniforms=unif, interpret=INTERPRET,
    )

    inv_var = 1.0 / scale**2
    minv = 1.0 / mass
    x = x0
    acc_sum = jnp.zeros((n,))
    for t in range(n_draws):
        p = noise[t] * jnp.sqrt(mass)
        g, lp0 = _mix_grad_logp(x, means, logw, inv_var)
        k0 = p[:, 0] * p[:, 0] * minv[0]
        for i in range(1, d):
            k0 = k0 + p[:, i] * p[:, i] * minv[i]
        h0 = -lp0 + 0.5 * k0
        q, mom = x, p
        for _ in range(n_lf):
            mom = mom - 0.5 * h * g
            q = q + h * mom * minv
            g, _ = _mix_grad_logp(q, means, logw, inv_var)
            mom = mom - 0.5 * h * g
        _, lp1 = _mix_grad_logp(q, means, logw, inv_var)
        k1 = mom[:, 0] * mom[:, 0] * minv[0]
        for i in range(1, d):
            k1 = k1 + mom[:, i] * mom[:, i] * minv[i]
        h1 = -lp1 + 0.5 * k1
        accept_prob = jnp.minimum(jnp.exp(jnp.clip(h0 - h1, -50.0, 50.0)), 1.0)
        take = unif[t] < accept_prob
        x = jnp.where(take[:, None], q, x)
        g, _ = _mix_grad_logp(x, means, logw, inv_var)
        acc_sum = acc_sum + accept_prob
    np.testing.assert_allclose(np.asarray(samples), np.asarray(x), atol=2e-4)
    np.testing.assert_allclose(np.asarray(acc), np.asarray(acc_sum / n_draws), atol=1e-5)


def test_hmc_noise_requires_uniforms(key):
    x0 = jnp.zeros((8, 2))
    means = jnp.zeros((1, 2))
    with pytest.raises(ValueError, match="together"):
        mixture_hmc_chain(
            x0, means, 2, 0.1, noise=jnp.zeros((2, 8, 2)), interpret=INTERPRET
        )


# ---------------------------------------------------------------------- MALA


@pytest.mark.parametrize("d,k", [(2, 8), (4, 3)])
def test_mala_chain_noise_parity(key, d, k):
    from torchebm_tpu.ops import mixture_mala_chain

    n, n_steps = 37, 7
    eta, scale = 0.08, 0.7
    means = 3.0 * jax.random.normal(jax.random.fold_in(key, 2), (k, d))
    logw = jax.nn.log_softmax(jax.random.normal(jax.random.fold_in(key, 3), (k,)))
    x0 = jax.random.normal(key, (n, d))
    noise = jax.random.normal(jax.random.fold_in(key, 4), (n_steps, n, d))
    unif = jax.random.uniform(jax.random.fold_in(key, 5), (n_steps, n))

    samples, acc = mixture_mala_chain(
        x0, means, n_steps, eta, scale=scale, log_weights=logw,
        noise=noise, uniforms=unif, interpret=INTERPRET,
    )

    inv_var = 1.0 / scale**2
    coef = math.sqrt(2 * eta)
    x = x0
    acc_sum = jnp.zeros((n,))
    for t in range(n_steps):
        gx, lp_x = _mix_grad_logp(x, means, logw, inv_var)
        y = x - eta * gx + coef * noise[t]
        gy, lp_y = _mix_grad_logp(y, means, logw, inv_var)
        sq_xy = jnp.zeros((n,))
        sq_yx = jnp.zeros((n,))
        for i in range(d):  # kernel accumulation order
            dxy = x[:, i] - y[:, i] + eta * gy[:, i]
            dyx = y[:, i] - x[:, i] + eta * gx[:, i]
            sq_xy = sq_xy + dxy * dxy
            sq_yx = sq_yx + dyx * dyx
        log_ratio = (lp_y - lp_x) + (sq_yx - sq_xy) / (4.0 * eta)
        accept_prob = jnp.minimum(jnp.exp(jnp.clip(log_ratio, -50.0, 50.0)), 1.0)
        take = unif[t] < accept_prob
        x = jnp.where(take[:, None], y, x)
        acc_sum = acc_sum + accept_prob
    np.testing.assert_allclose(np.asarray(samples), np.asarray(x), atol=2e-4)
    np.testing.assert_allclose(np.asarray(acc), np.asarray(acc_sum / n_steps), atol=1e-5)


@pytest.mark.parametrize("thin", [1, 3])
def test_mala_trajectory_noise_parity(key, thin):
    """Round-3: MALA trajectory kernel — kept post-MH states, final state and
    overall acceptance must all match the plain-jnp loop."""
    from torchebm_tpu.ops import mixture_mala_chain_trajectory

    n, d, k, n_steps = 29, 2, 4, 9
    eta, scale = 0.08, 0.7
    means = 3.0 * jax.random.normal(jax.random.fold_in(key, 2), (k, d))
    logw = jax.nn.log_softmax(jax.random.normal(jax.random.fold_in(key, 3), (k,)))
    x0 = jax.random.normal(key, (n, d))
    noise = jax.random.normal(jax.random.fold_in(key, 4), (n_steps, n, d))
    unif = jax.random.uniform(jax.random.fold_in(key, 5), (n_steps, n))

    traj, final, acc = mixture_mala_chain_trajectory(
        x0, means, n_steps, eta, thin=thin, scale=scale, log_weights=logw,
        noise=noise, uniforms=unif, interpret=INTERPRET,
    )

    inv_var = 1.0 / scale**2
    coef = math.sqrt(2 * eta)
    x, kept = x0, []
    acc_sum = jnp.zeros((n,))
    for t in range(n_steps):
        gx, lp_x = _mix_grad_logp(x, means, logw, inv_var)
        y = x - eta * gx + coef * noise[t]
        gy, lp_y = _mix_grad_logp(y, means, logw, inv_var)
        sq_xy = jnp.zeros((n,))
        sq_yx = jnp.zeros((n,))
        for i in range(d):
            dxy = x[:, i] - y[:, i] + eta * gy[:, i]
            dyx = y[:, i] - x[:, i] + eta * gx[:, i]
            sq_xy = sq_xy + dxy * dxy
            sq_yx = sq_yx + dyx * dyx
        log_ratio = (lp_y - lp_x) + (sq_yx - sq_xy) / (4.0 * eta)
        accept_prob = jnp.minimum(jnp.exp(jnp.clip(log_ratio, -50.0, 50.0)), 1.0)
        x = jnp.where((unif[t] < accept_prob)[:, None], y, x)
        acc_sum = acc_sum + accept_prob
        if (t + 1) % thin == 0:
            kept.append(x)
    assert traj.shape == (n_steps // thin, n, d)
    np.testing.assert_allclose(np.asarray(traj), np.asarray(jnp.stack(kept)), atol=2e-4)
    np.testing.assert_allclose(np.asarray(final), np.asarray(x), atol=2e-4)
    np.testing.assert_allclose(np.asarray(acc), np.asarray(acc_sum / n_steps), atol=1e-5)


def test_hmc_trajectory_noise_parity(key):
    from torchebm_tpu.ops import mixture_hmc_chain_trajectory

    n, n_draws, n_lf, d, k, thin = 25, 6, 3, 2, 4, 2
    h, scale = 0.25, 0.8
    means = 3.0 * jax.random.normal(jax.random.fold_in(key, 2), (k, d))
    logw = jax.nn.log_softmax(jax.random.normal(jax.random.fold_in(key, 3), (k,)))
    x0 = jax.random.normal(key, (n, d))
    noise = jax.random.normal(jax.random.fold_in(key, 4), (n_draws, n, d))
    unif = jax.random.uniform(jax.random.fold_in(key, 5), (n_draws, n))

    traj, final, acc = mixture_hmc_chain_trajectory(
        x0, means, n_draws, h, n_lf, thin=thin, scale=scale, log_weights=logw,
        noise=noise, uniforms=unif, interpret=INTERPRET,
    )

    inv_var = 1.0 / scale**2
    x, kept = x0, []
    acc_sum = jnp.zeros((n,))
    for t in range(n_draws):
        p = noise[t]
        g, lp0 = _mix_grad_logp(x, means, logw, inv_var)
        k0 = jnp.sum(p * p, axis=1)
        h0 = -lp0 + 0.5 * k0
        q, mom = x, p
        for _ in range(n_lf):
            mom = mom - 0.5 * h * g
            q = q + h * mom
            g, _ = _mix_grad_logp(q, means, logw, inv_var)
            mom = mom - 0.5 * h * g
        _, lp1 = _mix_grad_logp(q, means, logw, inv_var)
        h1 = -lp1 + 0.5 * jnp.sum(mom * mom, axis=1)
        accept_prob = jnp.minimum(jnp.exp(jnp.clip(h0 - h1, -50.0, 50.0)), 1.0)
        x = jnp.where((unif[t] < accept_prob)[:, None], q, x)
        g, _ = _mix_grad_logp(x, means, logw, inv_var)
        acc_sum = acc_sum + accept_prob
        if (t + 1) % thin == 0:
            kept.append(x)
    assert traj.shape == (n_draws // thin, n, d)
    np.testing.assert_allclose(np.asarray(traj), np.asarray(jnp.stack(kept)), atol=2e-4)
    np.testing.assert_allclose(np.asarray(final), np.asarray(x), atol=2e-4)
    np.testing.assert_allclose(np.asarray(acc), np.asarray(acc_sum / n_draws), atol=1e-5)


def test_mala_mh_ratio_is_exact_detailed_balance(key):
    """With the exact mixture logp the kernel's MH chain must preserve the
    target: start chains AT exact draws, run, and check moments stay put
    (interpret mode on CPU, n small so this is a smoke-level invariance
    check; the statistical version runs on TPU via the sampler dispatch)."""
    from torchebm_tpu.core import GaussianMixtureEnergy
    from torchebm_tpu.ops import mixture_mala_chain

    mix = GaussianMixtureEnergy.create(jnp.array([[0.0, 1.5], [0.0, -1.5]]), scale=0.5)
    x0 = mix.sample(key, 512)
    n_steps = 20
    noise = jax.random.normal(jax.random.fold_in(key, 1), (n_steps, 512, 2))
    unif = jax.random.uniform(jax.random.fold_in(key, 2), (n_steps, 512))
    samples, acc = mixture_mala_chain(
        x0, mix.means, n_steps, 0.1, scale=0.5, noise=noise, uniforms=unif,
        interpret=INTERPRET,
    )
    assert 0.3 < float(jnp.mean(acc)) <= 1.0
    np.testing.assert_allclose(
        np.asarray(jnp.mean(samples, 0)), np.asarray(jnp.mean(x0, 0)), atol=0.15
    )
    np.testing.assert_allclose(
        np.asarray(jnp.var(samples, 0)), np.asarray(jnp.var(x0, 0)), rtol=0.25
    )

"""Exact-parity CI tests for the whole-run AIS kernel.

Injected proposal noise + MH uniforms vs a plain-jnp reference loop that
mirrors the kernel's math staging (blended endpoint evaluators with the
kernels' unnormalized logps; the target's normalization constant enters the
weight update only). Interpret mode on CPU, like every other chain kernel.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchebm_tpu.ops.fused_ais import mixture_ais_run

from test_chain_parity import _mix_grad_logp

INTERPRET = jax.default_backend() != "tpu"


def _ref_ais(x0, mu0, s0, means, logw_mix, s_t, betas, eta, n_transitions,
             noise, unif, log_norm_t):
    """Plain-jnp AIS with the kernel's staging."""
    inv0 = 1.0 / s0**2
    inv_t = 1.0 / s_t**2
    base_means = mu0[None, :]
    base_logw = jnp.zeros((1,))

    def lp0_g(x):
        g, lp = _mix_grad_logp(x, base_means, base_logw, inv0)
        return g, lp

    def lpt_g(x):
        g, lp = _mix_grad_logp(x, means, logw_mix, inv_t)
        return g, lp

    x = x0
    logw = jnp.zeros(x0.shape[0])
    n_rungs = betas.shape[0] - 1
    for r in range(n_rungs):
        bp, b = float(betas[r]), float(betas[r + 1])
        _, lp0 = lp0_g(x)
        _, lpt = lpt_g(x)
        logw = logw + (b - bp) * (lpt - lp0 - log_norm_t)
        for j in range(n_transitions):
            t = r * n_transitions + j
            g0x, lp0x = lp0_g(x)
            gtx, lptx = lpt_g(x)
            gx = (1.0 - b) * g0x + b * gtx
            lpx = (1.0 - b) * lp0x + b * lptx
            y = x - eta * gx + jnp.sqrt(2.0 * eta) * noise[t]
            g0y, lp0y = lp0_g(y)
            gty, lpty = lpt_g(y)
            gy = (1.0 - b) * g0y + b * gty
            lpy = (1.0 - b) * lp0y + b * lpty
            dxy = x - y + eta * gy
            dyx = y - x + eta * gx
            log_ratio = (lpy - lpx) + (
                jnp.sum(dyx * dyx, -1) - jnp.sum(dxy * dxy, -1)
            ) / (4.0 * eta)
            p = jnp.minimum(jnp.exp(jnp.clip(log_ratio, -50.0, 50.0)), 1.0)
            take = unif[t] < p
            x = jnp.where(take[:, None], y, x)
    return x, logw


@pytest.mark.parametrize("n_transitions", [1, 2])
def test_ais_run_noise_parity(key, n_transitions):
    n, d = 37, 2  # non-aligned batch on purpose
    mu0 = jnp.array([0.5, -0.5])
    s0 = 1.3
    means = jnp.array([[2.0, 0.0], [-2.0, 0.0], [0.0, 2.0]])
    logw_mix = jnp.log(jnp.array([0.5, 0.3, 0.2]))
    s_t = 0.7
    betas = jnp.linspace(0.0, 1.0, 9)
    eta = 0.05
    n_steps = 8 * n_transitions
    x0 = mu0 + s0 * jax.random.normal(key, (n, d))
    noise = jax.random.normal(jax.random.fold_in(key, 1), (n_steps, n, d))
    unif = jax.random.uniform(jax.random.fold_in(key, 2), (n_steps, n))
    log_norm_t = d * math.log(s_t) + 0.5 * d * math.log(2 * math.pi)

    samples, logw, acc = mixture_ais_run(
        x0, mu0, s0, means, betas, eta, n_transitions=n_transitions,
        scale=s_t, log_weights=logw_mix, noise=noise, uniforms=unif,
        interpret=INTERPRET,
    )
    want_x, want_logw = _ref_ais(
        x0, mu0, s0, means, logw_mix, s_t, betas, eta, n_transitions,
        noise, unif, log_norm_t,
    )
    np.testing.assert_allclose(np.asarray(samples), np.asarray(want_x), atol=2e-5)
    np.testing.assert_allclose(np.asarray(logw), np.asarray(want_logw),
                               atol=5e-5, rtol=1e-5)
    assert acc.shape == (n,)


def test_ais_run_logz_on_normalized_mixture(key):
    """Statistical pin with injected randomness (interpret-safe): on a
    NORMALIZED mixture (E = -log p so Z = 1), the kernel's Neal estimator
    must recover log Z = 0 within Monte-Carlo error — this is exactly where
    a wrong normalization constant in the weight update would show."""
    mu0 = jnp.zeros(2)
    s0 = 2.0
    means = jnp.array([[1.5, 0.0], [-1.5, 0.0]])
    logw_mix = jnp.log(jnp.array([0.5, 0.5]))
    s_t = 0.6
    n, n_rungs, eta = 512, 60, 0.15
    betas = jnp.linspace(0.0, 1.0, n_rungs + 1)
    x0 = mu0 + s0 * jax.random.normal(key, (n, 2))
    noise = jax.random.normal(jax.random.fold_in(key, 1), (n_rungs, n, 2))
    unif = jax.random.uniform(jax.random.fold_in(key, 2), (n_rungs, n))

    _, logw, acc = mixture_ais_run(
        x0, mu0, s0, means, betas, eta, scale=s_t, log_weights=logw_mix,
        noise=noise, uniforms=unif, interpret=INTERPRET,
    )
    # base is N(0, s0^2 I) with energy 0.5 quad/s0^2 -> log Z0 = log(2 pi s0^2)
    log_z0 = math.log(2 * math.pi * s0**2)
    log_z = log_z0 + float(
        jax.scipy.special.logsumexp(logw) - math.log(n)
    )
    assert abs(log_z) < 0.25, log_z
    assert 0.2 < float(jnp.mean(acc)) <= 1.0


def test_ais_run_gaussian_precision_target(key):
    """Full-covariance Gaussian target (log_norm constant = 0): the log-Z of
    a Gaussian e^{-E} is known in closed form, pinning the precision-packed
    evaluator inside the anneal."""
    mu0 = jnp.zeros(2)
    s0 = math.sqrt(2.0)
    cov = jnp.array([[1.0, 0.4], [0.4, 0.8]])
    prec = jnp.linalg.inv(cov)
    mean_t = jnp.array([0.5, -0.5])
    n, n_rungs, eta = 512, 80, 0.1
    betas = jnp.linspace(0.0, 1.0, n_rungs + 1)
    x0 = mu0 + s0 * jax.random.normal(key, (n, 2))
    noise = jax.random.normal(jax.random.fold_in(key, 1), (n_rungs, n, 2))
    unif = jax.random.uniform(jax.random.fold_in(key, 2), (n_rungs, n))

    _, logw, _ = mixture_ais_run(
        x0, mu0, s0, mean_t[None, :], betas, eta, precision=prec,
        noise=noise, uniforms=unif, interpret=INTERPRET,
    )
    log_z0 = math.log(2 * math.pi * s0**2)
    log_z = log_z0 + float(jax.scipy.special.logsumexp(logw) - math.log(n))
    want = math.log(2 * math.pi) + 0.5 * float(jnp.linalg.slogdet(cov)[1])
    np.testing.assert_allclose(log_z, want, atol=0.2)


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="in-kernel PRNG requires TPU hardware",
)
def test_ais_dispatch_end_to_end_tpu(key):
    """On real TPU the public entry point dispatches the kernel and its
    log-Z estimate matches the scan path within MC error."""
    from torchebm_tpu.core import GaussianEnergy, GaussianMixtureEnergy
    from torchebm_tpu.samplers import annealed_importance_sampling

    mix = GaussianMixtureEnergy.create(jnp.array([[1.5, 0.0], [-1.5, 0.0]]), scale=0.6)
    base = GaussianEnergy.create(jnp.zeros(2), 4.0 * jnp.eye(2))
    fused_res = annealed_importance_sampling(
        key, mix, base=base, n_samples=512, n_rungs=60, step_size=0.15,
    )
    scan_res = annealed_importance_sampling(
        key, mix, base=base, n_samples=512, n_rungs=60, step_size=0.15,
        fused="off",
    )
    assert abs(float(fused_res.log_z)) < 0.25
    assert abs(float(fused_res.log_z) - float(scan_res.log_z)) < 0.3


def test_ais_run_validation():
    x0 = jnp.zeros((8, 2))
    means = jnp.zeros((1, 2))
    with pytest.raises(ValueError, match="betas"):
        mixture_ais_run(x0, jnp.zeros(2), 1.0, means, jnp.zeros((1,)), 0.1,
                        interpret=True)
    with pytest.raises(ValueError, match="together"):
        mixture_ais_run(
            x0, jnp.zeros(2), 1.0, means, jnp.linspace(0, 1, 3), 0.1,
            noise=jnp.zeros((2, 8, 2)), interpret=True,
        )


def test_ais_rung_cap_raises():
    """The SMEM beta table bounds the anneal length; past the cap the error
    says so instead of failing in the Mosaic allocator."""
    x0 = jnp.zeros((8, 2))
    with pytest.raises(ValueError, match="SMEM"):
        mixture_ais_run(
            x0, jnp.zeros(2), 1.0, jnp.zeros((1, 2)),
            jnp.linspace(0, 1, 60_002), 0.1, interpret=True,
        )

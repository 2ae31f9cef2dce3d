r"""SDE integrator convergence tests on the Ornstein–Uhlenbeck process.

Reference pattern: ``tests/integrators/test_euler_maruyama.py`` (1,178 LoC)
checks the SDE family statistically and by convergence order. Here:

- **strong order**: Euler–Maruyama (and the stochastic Heun variant) have
  strong order 1.0 for *additive* noise. Brownian paths are refined
  consistently — the coarse increments are sums of the fine ones scaled to
  unit variance — and the endpoint RMS error against a fine-grid reference
  solution must halve when the step halves.
- **weak correctness**: the transient mean/variance of
  :math:`dx = -x\,dt + \sqrt2\,dW` match the analytic
  :math:`m(t) = x_0 e^{-t}`, :math:`v(t) = 1 - e^{-2t}` at finite ``t``
  (not just the stationary limit).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchebm_tpu.integrators import get_integrator

T = 1.0
BATCH = 4096


def _integrate_with_path(integ, x0, eps, h):
    """Drive n steps with injected per-step standard-normal noise blocks."""
    x = x0
    for i in range(eps.shape[0]):
        out = integ.step(
            {"x": x}, h, drift=lambda x, t: -x, noise=eps[i], noise_scale=1.0
        )
        x = out["x"]
    return x


def _coarsen(eps, factor):
    """Aggregate fine standard-normal step noise into coarse step noise.

    With the library's update ``x += noise_scale*sqrt(2h)*eps``, the Brownian
    increment over a step is ``sqrt(h)*eps`` (times sqrt(2)); summing
    ``factor`` fine increments and renormalizing to unit variance gives
    ``eps_coarse = sum(eps_fine) / sqrt(factor)``.
    """
    n, b, d = eps.shape
    return eps.reshape(n // factor, factor, b, d).sum(axis=1) / math.sqrt(factor)


@pytest.mark.slow
@pytest.mark.parametrize("name", ["euler", "heun"])
def test_strong_order_one_additive_noise(name, key):
    integ = get_integrator(name)
    x0 = jnp.ones((BATCH, 1))
    n_fine = 256
    eps = jax.random.normal(key, (n_fine, BATCH, 1))

    ref = _integrate_with_path(integ, x0, eps, T / n_fine)
    errs = []
    for n in (16, 32):
        e = _coarsen(eps, n_fine // n)
        xt = _integrate_with_path(integ, x0, e, T / n)
        errs.append(float(jnp.sqrt(jnp.mean((xt - ref) ** 2))))
    observed = math.log2(errs[0] / errs[1])
    assert observed > 0.65, f"{name}: strong order {observed:.2f}, expected ~1"


@pytest.mark.parametrize("name", ["euler", "heun", "backward_euler"])
def test_ou_transient_moments(name, key):
    r"""Mean/variance at t=1 match the analytic OU transient, not just the
    stationary limit — catches drift/noise coefficient mix-ups that the
    stationary test cannot."""
    integ = get_integrator(name)
    x0 = jnp.full((BATCH, 2), 2.0)
    n = 200
    out = integ.integrate(
        {"x": x0},
        T / n,
        n,
        drift=lambda x, t: -x,
        key=key,
        noise_scale=1.0,
    )
    m = float(jnp.mean(out["x"]))
    v = float(jnp.var(out["x"]))
    np.testing.assert_allclose(m, 2.0 * math.exp(-T), atol=0.06)
    np.testing.assert_allclose(v, 1.0 - math.exp(-2 * T), atol=0.08)


def test_noise_scale_scales_variance(key):
    """Doubling noise_scale quadruples the stationary variance (var = ns^2)."""
    integ = get_integrator("euler")
    x0 = jnp.zeros((BATCH, 2))
    out1 = integ.integrate(
        {"x": x0}, 0.01, 1500, drift=lambda x, t: -x, key=key, noise_scale=1.0
    )
    out2 = integ.integrate(
        {"x": x0}, 0.01, 1500, drift=lambda x, t: -x, key=key, noise_scale=2.0
    )
    r = float(jnp.var(out2["x"]) / jnp.var(out1["x"]))
    assert abs(r - 4.0) < 0.5, r


def test_zero_steps_rejected(key):
    """n_steps must be positive — the contract raises rather than no-ops."""
    integ = get_integrator("euler")
    x0 = jnp.ones((4, 2))
    with pytest.raises(ValueError, match="n_steps"):
        integ.integrate({"x": x0}, 0.01, 0, drift=lambda x, t: -x, key=key)

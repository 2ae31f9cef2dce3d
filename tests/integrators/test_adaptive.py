"""Adaptive step-size controller tests (on-device while_loop path)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchebm_tpu.integrators import get_integrator

ADAPTIVE = ["adaptive_heun", "bosh3", "dopri5", "dopri8"]


@pytest.mark.parametrize("name", ADAPTIVE)
def test_adaptive_accuracy(name):
    integ = get_integrator(name, atol=1e-7, rtol=1e-7)
    out = integ.integrate(
        {"x": jnp.ones((4, 3))}, 0.1, 10, drift=lambda x, t: -x
    )
    np.testing.assert_allclose(out["x"], math.exp(-1.0), rtol=1e-5)


@pytest.mark.parametrize("name", ADAPTIVE)
def test_adaptive_stats(name):
    integ = get_integrator(name, atol=1e-6, rtol=1e-6)
    out, stats = integ.integrate(
        {"x": jnp.ones((2, 2))}, 0.1, 10, drift=lambda x, t: -x, return_stats=True
    )
    assert int(stats.n_accepted) >= 1
    assert int(stats.n_attempted) >= int(stats.n_accepted)
    assert not bool(stats.exhausted)


def test_tight_tolerance_uses_more_steps():
    loose = get_integrator("dopri5", atol=1e-3, rtol=1e-3)
    tight = get_integrator("dopri5", atol=1e-9, rtol=1e-9)
    drift = lambda x, t: jnp.sin(3.0 * t) * x  # time-varying to force adaptation
    _, s_loose = loose.integrate({"x": jnp.ones((2, 2))}, 0.5, 4, drift=drift, return_stats=True)
    _, s_tight = tight.integrate({"x": jnp.ones((2, 2))}, 0.5, 4, drift=drift, return_stats=True)
    assert int(s_tight.n_accepted) > int(s_loose.n_accepted)


def test_max_steps_exhaustion_flag():
    integ = get_integrator("dopri5", atol=1e-12, rtol=1e-12, max_steps=3)
    _, stats = integ.integrate(
        {"x": jnp.ones((2, 2))}, 0.1, 100, drift=lambda x, t: -x, return_stats=True
    )
    assert bool(stats.exhausted)


def test_time_grid_endpoints_only():
    """Adaptive mode only consumes t[0] and t[-1] of a provided grid."""
    integ = get_integrator("dopri5", atol=1e-8, rtol=1e-8)
    t = jnp.linspace(0.0, 2.0, 7)
    out = integ.integrate({"x": jnp.ones((1, 1))}, 0.1, None, drift=lambda x, t: -x, t=t)
    np.testing.assert_allclose(float(out["x"][0, 0]), math.exp(-2.0), rtol=1e-5)


def test_adaptive_under_jit():
    integ = get_integrator("dopri5")
    f = jax.jit(
        lambda x0: integ.integrate({"x": x0}, 0.1, 10, drift=lambda x, t: -x)["x"]
    )
    np.testing.assert_allclose(f(jnp.ones((2, 2))), math.exp(-1.0), rtol=1e-4)


def test_non_adaptive_rejects_without_pair():
    integ = get_integrator("rk4")
    with pytest.raises(ValueError):
        integ.integrate({"x": jnp.ones((1, 1))}, 0.1, 10, drift=lambda x, t: -x, adaptive=True)

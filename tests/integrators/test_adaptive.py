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


# ----------------------------------------------------------------------------
# round-2 controller behavioral suite (VERDICT item 3)
# ----------------------------------------------------------------------------

_OSC = lambda x, t: jnp.cos(4.0 * t) * x  # smooth, time-varying: forces adaptation
_OSC_SOL = lambda t: math.exp(math.sin(4.0 * t) / 4.0)  # x(0)=1


def _solve(name, rtol, **kw):
    integ = get_integrator(name, atol=1e-14, rtol=rtol, **kw)
    out, stats = integ.integrate(
        {"x": jnp.ones((1, 1))}, 0.5, None, drift=_OSC,
        t=jnp.array([0.0, 2.0]), return_stats=True,
    )
    err = abs(float(out["x"][0, 0]) - _OSC_SOL(2.0))
    return err, stats


@pytest.mark.parametrize("name", ["bosh3", "dopri5"])
def test_error_scales_with_rtol(name):
    """Tightening rtol by 10^2 must tighten the achieved error accordingly.

    The controller equidistributes local error ∝ rtol, so the global error
    should fall by ~10^2 per 10^2 of rtol (allow a decade of slack each way).
    """
    with jax.enable_x64(True):
        errs = {r: _solve(name, r)[0] for r in (1e-3, 1e-5, 1e-7)}
    assert errs[1e-5] < errs[1e-3]
    assert errs[1e-7] < errs[1e-5]
    ratio_a = errs[1e-3] / errs[1e-5]
    ratio_b = errs[1e-5] / errs[1e-7]
    assert 10 < ratio_a < 1e4, f"{name}: err(1e-3)/err(1e-5) = {ratio_a:.1f}"
    assert 10 < ratio_b < 1e4, f"{name}: err(1e-5)/err(1e-7) = {ratio_b:.1f}"
    # achieved error should be in the neighborhood of the requested tolerance
    for r, e in errs.items():
        assert e < 100 * r, f"{name}: rtol={r} achieved err {e}"


@pytest.mark.parametrize("name", ["bosh3", "dopri5", "dopri8"])
def test_step_count_scales_as_rtol_power(name):
    """Accepted steps grow like rtol^(-1/(p+1)) for the local-extrapolation
    controller — check monotone growth and that the exponent is in range."""
    p = get_integrator(name).order
    with jax.enable_x64(True):
        _, s_loose = _solve(name, 1e-3)
        _, s_tight = _solve(name, 1e-9)
    n_loose, n_tight = int(s_loose.n_accepted), int(s_tight.n_accepted)
    assert n_tight > n_loose
    observed_exp = math.log(n_tight / n_loose) / math.log(1e6)
    # theoretical 1/(p+1); wide bounds (initial-h transient, clamping)
    lo, hi = 0.4 / (p + 1), 2.5 / (p + 1)
    assert lo < observed_exp < hi, (
        f"{name}: step-count exponent {observed_exp:.3f} outside "
        f"[{lo:.3f}, {hi:.3f}] (n {n_loose}->{n_tight})"
    )


def test_no_rejections_on_gentle_problem():
    """A small initial h on a smooth problem should never reject a step."""
    integ = get_integrator("dopri5", atol=1e-6, rtol=1e-6)
    _, stats = integ.integrate(
        {"x": jnp.ones((2, 2))}, 1e-3, None, drift=lambda x, t: -x,
        t=jnp.array([0.0, 0.5]), return_stats=True,
    )
    assert int(stats.n_attempted) == int(stats.n_accepted)
    assert not bool(stats.exhausted)


def test_oversized_initial_h_rejects_then_recovers():
    """A huge initial step must be rejected (n_att > n_acc) yet still land on
    the exact solution — exercising the FSAL stale-k1 path under rejection."""
    integ = get_integrator("dopri5", atol=1e-9, rtol=1e-9)
    out, stats = integ.integrate(
        {"x": jnp.ones((1, 1))}, 2.0, None, drift=_OSC,
        t=jnp.array([0.0, 2.0]), return_stats=True,
    )
    assert int(stats.n_attempted) > int(stats.n_accepted)
    np.testing.assert_allclose(float(out["x"][0, 0]), _OSC_SOL(2.0), rtol=1e-6)


def test_fsal_k1_not_stale_after_rejection():
    """Regression guard for FSAL bookkeeping: with a strongly time-dependent
    drift, a wrong (stale or wrongly-advanced) first stage after a rejection
    shifts the solution; compare against the non-FSAL dopri8 ground truth."""
    drift = lambda x, t: jnp.where(t < 1.0, -5.0 * x, 5.0 * x)  # kink at t=1
    with jax.enable_x64(True):
        a = get_integrator("dopri5", atol=1e-10, rtol=1e-10).integrate(
            {"x": jnp.ones((1, 1))}, 1.5, None, drift=drift, t=jnp.array([0.0, 2.0])
        )
        b = get_integrator("dopri8", atol=1e-10, rtol=1e-10).integrate(
            {"x": jnp.ones((1, 1))}, 1.5, None, drift=drift, t=jnp.array([0.0, 2.0])
        )
    np.testing.assert_allclose(float(a["x"][0, 0]), float(b["x"][0, 0]), rtol=1e-5)


def test_max_step_size_respected():
    integ = get_integrator("dopri5", atol=1e-3, rtol=1e-3, max_step_size=0.01)
    _, stats = integ.integrate(
        {"x": jnp.ones((1, 1))}, 0.005, None, drift=lambda x, t: -x,
        t=jnp.array([0.0, 1.0]), return_stats=True,
    )
    # 1.0 of time at h <= 0.01 needs >= 100 accepted steps
    assert int(stats.n_accepted) >= 100
    assert float(stats.final_h) <= 0.01 + 1e-9


def test_adaptive_f64_state():
    """The controller must run in float64 when the state is f64 (dtype
    threading through scale/err/while_loop carries)."""
    with jax.enable_x64(True):
        integ = get_integrator("dopri5", atol=1e-12, rtol=1e-12)
        out = integ.integrate(
            {"x": jnp.ones((1, 1), jnp.float64)}, 0.1, None,
            drift=lambda x, t: -x, t=jnp.array([0.0, 1.0]),
        )
        assert out["x"].dtype == jnp.float64
        np.testing.assert_allclose(float(out["x"][0, 0]), math.exp(-1.0), rtol=1e-10)

r"""Hand-computed single-step checks, one per integrator.

Reference pattern (``tests/integrators/test_rk4.py:339-457`` and siblings):
pin each method's one-step update on a closed-form problem by evaluating the
stages *in the test*, independently of the library's tableau machinery — a
transcription error in a tableau coefficient that still satisfies the
consistency sums (Σb=1, row sums = c) is caught here.

The nonlinear test ODE is :math:`\dot x = x^2` from ``x0 = 1`` with
``h = 0.1`` — nonlinearity makes every stage value distinct, so mis-wired
stage weights cannot cancel.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchebm_tpu.integrators import get_integrator

H = 0.1
X0 = 1.0


def _f(x):
    return x * x


def _lib_one_step(name, drift):
    integ = get_integrator(name)
    kwargs = dict(drift=lambda x, t: drift(x))
    if integ.family == "sde":
        kwargs.update(key=jax.random.PRNGKey(0), noise_scale=0.0)
    out = integ.step({"x": jnp.full((1, 1), X0)}, H, **kwargs)
    return float(out["x"][0, 0])


# --- expected values, stages evaluated by hand -------------------------------


def _expected_euler():
    return X0 + H * _f(X0)


def _expected_heun():
    k1 = _f(X0)
    k2 = _f(X0 + H * k1)
    return X0 + H / 2 * (k1 + k2)


def _expected_midpoint():
    k2 = _f(X0 + H / 2 * _f(X0))
    return X0 + H * k2


def _expected_rk4():
    k1 = _f(X0)
    k2 = _f(X0 + H / 2 * k1)
    k3 = _f(X0 + H / 2 * k2)
    k4 = _f(X0 + H * k3)
    return X0 + H / 6 * (k1 + 2 * k2 + 2 * k3 + k4)


def _expected_rk438():
    # Kutta 3/8 rule: c = [0, 1/3, 2/3, 1], b = [1/8, 3/8, 3/8, 1/8]
    k1 = _f(X0)
    k2 = _f(X0 + H / 3 * k1)
    k3 = _f(X0 + H * (-k1 / 3 + k2))
    k4 = _f(X0 + H * (k1 - k2 + k3))
    return X0 + H / 8 * (k1 + 3 * k2 + 3 * k3 + k4)


def _expected_bosh3():
    # Bogacki–Shampine: c = [0, 1/2, 3/4], b = [2/9, 1/3, 4/9]
    k1 = _f(X0)
    k2 = _f(X0 + H / 2 * k1)
    k3 = _f(X0 + 3 * H / 4 * k2)
    return X0 + H * (2 / 9 * k1 + 1 / 3 * k2 + 4 / 9 * k3)


def _expected_dopri5():
    # published Dormand–Prince 5(4) coefficients (Hairer, Nørsett & Wanner)
    k1 = _f(X0)
    k2 = _f(X0 + H * (1 / 5 * k1))
    k3 = _f(X0 + H * (3 / 40 * k1 + 9 / 40 * k2))
    k4 = _f(X0 + H * (44 / 45 * k1 - 56 / 15 * k2 + 32 / 9 * k3))
    k5 = _f(
        X0 + H * (19372 / 6561 * k1 - 25360 / 2187 * k2 + 64448 / 6561 * k3 - 212 / 729 * k4)
    )
    k6 = _f(
        X0
        + H
        * (9017 / 3168 * k1 - 355 / 33 * k2 + 46732 / 5247 * k3 + 49 / 176 * k4 - 5103 / 18656 * k5)
    )
    return X0 + H * (
        35 / 384 * k1 + 500 / 1113 * k3 + 125 / 192 * k4 - 2187 / 6784 * k5 + 11 / 84 * k6
    )


CASES = {
    "euler": _expected_euler,
    "heun": _expected_heun,
    "midpoint": _expected_midpoint,
    "rk4": _expected_rk4,
    "rk438": _expected_rk438,
    "bosh3": _expected_bosh3,
    "dopri5": _expected_dopri5,
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_single_step_matches_hand_computed(name):
    got = _lib_one_step(name, _f)
    want = CASES[name]()
    np.testing.assert_allclose(got, want, rtol=2e-6, err_msg=name)


def test_backward_euler_solves_implicit_equation():
    r"""Drift-implicit Euler on :math:`\dot x = -\lambda x`:
    :math:`x_1 = x_0 / (1 + \lambda h)` exactly (Picard fixed point)."""
    lam = 3.0
    # default solver_max_iter=8 leaves ~(λh)^8 residual; converge fully here
    integ = get_integrator("backward_euler", solver_max_iter=40)
    out = integ.step(
        {"x": jnp.full((1, 1), X0)},
        H,
        drift=lambda x, t: -lam * x,
        key=jax.random.PRNGKey(0),
        noise_scale=0.0,
    )
    np.testing.assert_allclose(float(out["x"][0, 0]), X0 / (1 + lam * H), rtol=1e-5)


def test_leapfrog_single_step_manual():
    r"""Störmer–Verlet on the harmonic oscillator (force :math:`-x`),
    ``x0=1, p0=0, h=0.1``: half-kick, drift, half-kick by hand."""
    integ = get_integrator("leapfrog")
    out = integ.step(
        {"x": jnp.full((1, 1), 1.0), "p": jnp.zeros((1, 1))},
        H,
        drift=lambda x, t: -x,
    )
    p_half = 0.0 + H / 2 * (-1.0)  # -0.05
    x1 = 1.0 + H * p_half  # 0.995
    p1 = p_half + H / 2 * (-x1)  # -0.09975
    np.testing.assert_allclose(float(out["x"][0, 0]), x1, rtol=1e-6)
    np.testing.assert_allclose(float(out["p"][0, 0]), p1, rtol=1e-6)


def test_leapfrog_mass_scales_drift():
    """With mass m, the drift uses p/m: x1 = x0 + h * p_half / m."""
    integ = get_integrator("leapfrog")
    m = 4.0
    out = integ.step(
        {"x": jnp.full((1, 1), 1.0), "p": jnp.zeros((1, 1))},
        H,
        mass=m,
        drift=lambda x, t: -x,
    )
    p_half = -H / 2
    np.testing.assert_allclose(float(out["x"][0, 0]), 1.0 + H * p_half / m, rtol=1e-6)


def test_dopri5_stability_function():
    r"""One dopri5 step on :math:`\dot x = -x` equals the method's stability
    polynomial :math:`R(z) = \sum_{k\le5} z^k/k! + z^6/600` at ``z = -h``
    (Hairer & Wanner, DOPRI5): an independent linear-problem pin."""
    integ = get_integrator("dopri5")
    h = 0.5  # large h so the z^6 term is well above float32 noise
    out = integ.step({"x": jnp.ones((1, 1))}, h, drift=lambda x, t: -x)
    z = -h
    r = sum(z**k / math.factorial(k) for k in range(6)) + z**6 / 600.0
    np.testing.assert_allclose(float(out["x"][0, 0]), r, rtol=1e-6)


@pytest.mark.parametrize("name", sorted(CASES))
def test_batch_and_dim_broadcast(name):
    """A (B, D) batch steps every element independently and identically."""
    integ = get_integrator(name)
    kwargs = dict(drift=lambda x, t: x * x)
    if integ.family == "sde":
        kwargs.update(key=jax.random.PRNGKey(0), noise_scale=0.0)
    x = jnp.full((5, 3), X0)
    out = integ.step({"x": x}, H, **kwargs)
    assert out["x"].shape == (5, 3)
    np.testing.assert_allclose(np.asarray(out["x"]), CASES[name](), rtol=2e-6)


def test_adaptive_heun_single_step_is_trapezoid():
    """The 2(1) pair's PROPAGATED solution is the trapezoidal (2nd-order)
    combination — identical to plain Heun on the same problem; the embedded
    1st-order estimate only drives the controller."""
    got = _lib_one_step("adaptive_heun", _f)
    np.testing.assert_allclose(got, _expected_heun(), rtol=2e-6)


def test_dopri8_single_step_closed_forms():
    r"""DP8(7)'s local error is :math:`O(h^9)`: at ``h = 0.1`` one step on
    :math:`\dot x = x^2` must reproduce the EXACT solution ``1/(1-h)`` to
    float32 rounding (truncation ~1e-8, far below f32 resolution) — any
    mis-transcribed stage weight of magnitude ≥ 1e-4 shifts the result by
    ~1e-5 and fails. A linear pin vs ``exp(-h)`` cross-checks at larger h,
    where dopri5's own truncation (~4e-6 at h=0.4) is measurably WORSE."""
    integ = get_integrator("dopri8")
    out = integ.step({"x": jnp.full((1, 1), X0)}, H, drift=lambda x, t: x * x)
    np.testing.assert_allclose(float(out["x"][0, 0]), 1.0 / (1.0 - H), atol=2e-6)

    h = 0.4
    out8 = integ.step({"x": jnp.ones((1, 1))}, h, drift=lambda x, t: -x)
    err8 = abs(float(out8["x"][0, 0]) - math.exp(-h))
    out5 = get_integrator("dopri5").step(
        {"x": jnp.ones((1, 1))}, h, drift=lambda x, t: -x
    )
    err5 = abs(float(out5["x"][0, 0]) - math.exp(-h))
    assert err8 < 1e-6, err8
    assert err8 < err5, (err8, err5)  # 8th order beats 5th at one step


def test_generalised_leapfrog_reduces_to_leapfrog_when_separable():
    """With a separable Hamiltonian (force(x), velocity(p)) both Picard
    stages converge in one iteration and the generalised step equals the
    hand-computed Stormer-Verlet composition."""
    integ = get_integrator("generalised_leapfrog")
    out = integ.step(
        {"x": jnp.full((1, 1), 1.0), "p": jnp.zeros((1, 1))},
        H,
        force=lambda x, p, t: -x,
        velocity=lambda x, p, t: p,
    )
    p_half = 0.0 + H / 2 * (-1.0)
    x1 = 1.0 + H * p_half
    p1 = p_half + H / 2 * (-x1)
    np.testing.assert_allclose(float(out["x"][0, 0]), x1, rtol=1e-6)
    np.testing.assert_allclose(float(out["p"][0, 0]), p1, rtol=1e-6)


def test_generalised_leapfrog_implicit_fixed_point_manual():
    r"""Non-separable pin with a CLOSED-FORM implicit solution: with
    ``force(x, p) = -x·p`` the momentum half-step equation
    :math:`p_{1/2} = p + \tfrac h2(-x\,p_{1/2})` solves to
    :math:`p_{1/2} = p/(1 + hx/2)`; velocity ``p`` keeps the position stage
    explicit. Pins that the Picard solver iterates the momentum stage to the
    true fixed point (a solver that stopped after one sweep would miss it)."""
    x0, p0 = 1.0, 0.7
    integ = get_integrator("generalised_leapfrog", solver_max_iter=60)
    out = integ.step(
        {"x": jnp.full((1, 1), x0), "p": jnp.full((1, 1), p0)},
        H,
        force=lambda x, p, t: -x * p,
        velocity=lambda x, p, t: p,
    )
    p_half = p0 / (1.0 + H * x0 / 2.0)
    x1 = x0 + H * p_half
    p1 = p_half + H / 2.0 * (-x1 * p_half)
    np.testing.assert_allclose(float(out["x"][0, 0]), x1, rtol=1e-6)
    np.testing.assert_allclose(float(out["p"][0, 0]), p1, rtol=1e-6)


def test_euler_maruyama_noise_term_manual():
    r"""SDE pin: with injected noise ε the EM update is exactly
    :math:`x + h f(x) + \text{noise\_scale}\,\sqrt{2h}\,\varepsilon`
    (the reference's noise convention, ``base_integrator.py:627-817``)."""
    integ = get_integrator("euler_maruyama")
    eps = jnp.full((1, 1), 0.37)
    ns = 1.3
    out = integ.step(
        {"x": jnp.full((1, 1), X0)},
        H,
        drift=lambda x, t: x * x,
        noise=eps,
        noise_scale=ns,
    )
    want = X0 + H * _f(X0) + ns * math.sqrt(2 * H) * 0.37
    np.testing.assert_allclose(float(out["x"][0, 0]), want, rtol=1e-6)

    # and the key path draws jax.random.normal(key, shape) exactly
    key = jax.random.PRNGKey(7)
    out_k = integ.step(
        {"x": jnp.full((1, 1), X0)}, H, drift=lambda x, t: x * x,
        key=key, noise_scale=ns,
    )
    drawn = float(jax.random.normal(key, (1, 1))[0, 0])
    want_k = X0 + H * _f(X0) + ns * math.sqrt(2 * H) * drawn
    np.testing.assert_allclose(float(out_k["x"][0, 0]), want_k, rtol=1e-6)


def test_backward_euler_noise_term_manual():
    r"""Drift-implicit, noise-explicit: :math:`x_1 = x_0/(1+\lambda h) +
    \text{noise\_scale}\sqrt{2h}\,\varepsilon` on :math:`\dot x=-\lambda x`."""
    lam, ns = 3.0, 0.9
    eps = jnp.full((1, 1), -0.21)
    integ = get_integrator("backward_euler", solver_max_iter=40)
    out = integ.step(
        {"x": jnp.full((1, 1), X0)}, H, drift=lambda x, t: -lam * x,
        noise=eps, noise_scale=ns,
    )
    want = X0 / (1 + lam * H) + ns * math.sqrt(2 * H) * (-0.21)
    np.testing.assert_allclose(float(out["x"][0, 0]), want, rtol=1e-5)


def test_all_registry_methods_have_a_manual_pin():
    """Every distinct integrator class in the registry is pinned by a
    hand-computed test in this module (VERDICT r4 #4a)."""
    from torchebm_tpu.integrators.registry import INTEGRATOR_REGISTRY

    pinned = {
        "EulerMaruyamaIntegrator",
        "BackwardEulerMaruyamaIntegrator",
        "HeunIntegrator",
        "MidpointIntegrator",
        "RK4Integrator",
        "RK438Integrator",
        "AdaptiveHeunIntegrator",
        "Bosh3Integrator",
        "Dopri5Integrator",
        "Dopri8Integrator",
        "LeapfrogIntegrator",
        "GeneralisedLeapfrogIntegrator",
    }
    registry_classes = {cls.__name__ for cls in INTEGRATOR_REGISTRY.values()}
    assert registry_classes == pinned, registry_classes ^ pinned

"""Symplectic integrator tests: energy conservation, reversibility, mass, safe mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchebm_tpu.integrators import GeneralisedLeapfrogIntegrator, LeapfrogIntegrator


def hamiltonian(x, p, mass=1.0):
    return 0.5 * jnp.sum(x**2) + 0.5 * jnp.sum(p**2) / mass


def test_energy_conservation_harmonic(key):
    lf = LeapfrogIntegrator()
    x = jax.random.normal(key, (64, 2))
    p = jax.random.normal(jax.random.fold_in(key, 1), (64, 2))
    out = lf.integrate({"x": x, "p": p}, 0.01, 2000, drift=lambda x, t: -x)
    h0, h1 = float(hamiltonian(x, p)), float(hamiltonian(out["x"], out["p"]))
    assert abs(h1 - h0) / abs(h0) < 1e-3


def test_reversibility(key):
    """Integrating forward then with negated momentum returns to the start."""
    lf = LeapfrogIntegrator()
    x = jax.random.normal(key, (16, 3))
    p = jax.random.normal(jax.random.fold_in(key, 1), (16, 3))
    fwd = lf.integrate({"x": x, "p": p}, 0.05, 100, drift=lambda x, t: -x)
    back = lf.integrate({"x": fwd["x"], "p": -fwd["p"]}, 0.05, 100, drift=lambda x, t: -x)
    np.testing.assert_allclose(back["x"], x, atol=1e-4)
    np.testing.assert_allclose(-back["p"], p, atol=1e-4)


def test_scalar_and_vector_mass(key):
    lf = LeapfrogIntegrator()
    x = jax.random.normal(key, (8, 2))
    p = jax.random.normal(jax.random.fold_in(key, 1), (8, 2))
    out_s = lf.integrate({"x": x, "p": p}, 0.01, 50, 2.0, drift=lambda x, t: -x)
    out_v = lf.integrate({"x": x, "p": p}, 0.01, 50, jnp.array([2.0, 2.0]), drift=lambda x, t: -x)
    np.testing.assert_allclose(out_s["x"], out_v["x"], rtol=1e-6)
    # heavier mass → slower motion
    out_heavy = lf.integrate({"x": x, "p": p}, 0.01, 50, 100.0, drift=lambda x, t: -x)
    assert float(jnp.mean(jnp.abs(out_heavy["x"] - x))) < float(jnp.mean(jnp.abs(out_s["x"] - x)))


def test_single_step_matches_manual(key):
    lf = LeapfrogIntegrator()
    x = jax.random.normal(key, (4, 2))
    p = jax.random.normal(jax.random.fold_in(key, 1), (4, 2))
    h = 0.1
    out = lf.step({"x": x, "p": p}, h, drift=lambda x, t: -x)
    p_half = p + 0.5 * h * (-x)
    x_new = x + h * p_half
    p_new = p_half + 0.5 * h * (-x_new)
    np.testing.assert_allclose(out["x"], x_new, rtol=1e-6)
    np.testing.assert_allclose(out["p"], p_new, rtol=1e-6)


def test_safe_mode_sanitizes():
    lf = LeapfrogIntegrator()
    x = jnp.array([[jnp.inf, 1.0]])
    p = jnp.zeros((1, 2))
    out = lf.integrate({"x": x, "p": p}, 0.1, 3, drift=lambda x, t: -x, safe=True)
    assert bool(jnp.all(jnp.isfinite(out["x"])))
    assert bool(jnp.all(jnp.isfinite(out["p"])))


def test_generalised_reduces_to_separable(key):
    gl = GeneralisedLeapfrogIntegrator()
    lf = LeapfrogIntegrator()
    x = jax.random.normal(key, (8, 2))
    p = jax.random.normal(jax.random.fold_in(key, 1), (8, 2))
    a = lf.integrate({"x": x, "p": p}, 0.02, 50, drift=lambda x, t: -x)
    b = gl.integrate(
        {"x": x, "p": p}, 0.02, 50,
        force=lambda x, p, t: -x, velocity=lambda x, p, t: p,
    )
    np.testing.assert_allclose(a["x"], b["x"], atol=1e-5)
    np.testing.assert_allclose(a["p"], b["p"], atol=1e-5)


def test_generalised_nonseparable_conserves_H(key):
    r"""1-D toy non-separable Hamiltonian with metric M(x) = 1 + x² (reference
    ``leapfrog.py:264-280``)."""
    gl = GeneralisedLeapfrogIntegrator(solver_max_iter=12)

    def force(x, p, t):
        inv_m = 1.0 / (1.0 + x**2)
        return -(x + 0.5 * p**2 * (-2.0 * x * inv_m**2) + 0.5 * 2.0 * x * inv_m)

    def velocity(x, p, t):
        return p / (1.0 + x**2)

    def H(x, p):
        return float(jnp.sum(0.5 * x**2 + 0.5 * p**2 / (1.0 + x**2) + 0.5 * jnp.log(1.0 + x**2)))

    x = jax.random.normal(key, (32, 1)) * 0.5
    p = jax.random.normal(jax.random.fold_in(key, 1), (32, 1)) * 0.5
    out = gl.integrate({"x": x, "p": p}, 0.01, 500, force=force, velocity=velocity)
    assert abs(H(out["x"], out["p"]) - H(x, p)) / abs(H(x, p)) < 5e-3


def test_n_steps_validation():
    lf = LeapfrogIntegrator()
    with pytest.raises(ValueError):
        lf.integrate({"x": jnp.ones((1, 1)), "p": jnp.ones((1, 1))}, 0.1, 0, drift=lambda x, t: -x)

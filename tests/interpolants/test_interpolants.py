"""Interpolant path + conversion tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchebm_tpu.interpolants import (
    CosineInterpolant,
    LinearInterpolant,
    VariancePreservingInterpolant,
    expand_t_like_x,
    get_interpolant,
    resolve_interpolant,
)

ALL = [LinearInterpolant(), CosineInterpolant(), VariancePreservingInterpolant()]
IDS = [type(i).__name__ for i in ALL]


@pytest.mark.parametrize("interp", ALL, ids=IDS)
def test_endpoints(interp):
    """α(1)≈1, σ(1)≈0 — the path reaches the data at t=1."""
    a1, _ = interp.compute_alpha_t(jnp.float32(1.0))
    s1, _ = interp.compute_sigma_t(jnp.float32(1.0))
    np.testing.assert_allclose(float(a1), 1.0, atol=1e-5)
    np.testing.assert_allclose(float(s1), 0.0, atol=1e-3)


def test_linear_exact_path(key):
    interp = LinearInterpolant()
    x0 = jax.random.normal(key, (4, 3))
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (4, 3))
    t = jnp.full((4,), 0.25)
    xt, ut = interp.interpolate(x0, x1, t)
    np.testing.assert_allclose(xt, 0.25 * x1 + 0.75 * x0, rtol=1e-6)
    np.testing.assert_allclose(ut, x1 - x0, rtol=1e-6)


def test_cosine_variance_preserving():
    t = jnp.linspace(0.0, 1.0, 11)
    interp = CosineInterpolant()
    a, _ = interp.compute_alpha_t(t)
    s, _ = interp.compute_sigma_t(t)
    np.testing.assert_allclose(a**2 + s**2, jnp.ones_like(t), atol=1e-6)


@pytest.mark.parametrize("interp", ALL, ids=IDS)
def test_ut_is_time_derivative(interp, key):
    x0 = jax.random.normal(key, (8, 2))
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (8, 2))
    t = jnp.clip(jax.random.uniform(jax.random.fold_in(key, 2), (8,)), 0.1, 0.9)
    xt, ut = interp.interpolate(x0, x1, t)
    # central finite difference
    eps = 1e-2
    xp, _ = interp.interpolate(x0, x1, t + eps)
    xm, _ = interp.interpolate(x0, x1, t - eps)
    np.testing.assert_allclose((xp - xm) / (2 * eps), ut, atol=5e-2, rtol=1e-2)


@pytest.mark.parametrize("interp", ALL, ids=IDS)
def test_conversion_roundtrips(interp, key):
    x = jax.random.normal(key, (8, 2))
    t = jnp.full((8,), 0.5)
    v = jax.random.normal(jax.random.fold_in(key, 1), (8, 2))
    score = interp.velocity_to_score(v, x, t)
    v_back = interp.score_to_velocity(score, x, t)
    np.testing.assert_allclose(v, v_back, atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("interp", ALL, ids=IDS)
def test_gaussian_score_identity(interp, key):
    r"""With x1 ~ N(0,I) and x0 ~ N(0,I), x_t ~ N(0, (α²+σ²)I) and the true
    score is -x/(α²+σ²); converting the true conditional-expected velocity
    must be consistent for the marginal-preserving cosine path (α²+σ²=1)."""
    if not isinstance(interp, CosineInterpolant):
        pytest.skip("closed-form marginal only for the cosine path here")
    t = jnp.full((512,), 0.3)
    x0 = jax.random.normal(key, (512, 2))
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (512, 2))
    xt, ut = interp.interpolate(x0, x1, t)
    # E[score | xt] estimated from the conversion of the conditional velocity
    score = interp.velocity_to_score(ut, xt, t)
    # regression of score on xt should give slope ~ -1 (score = -x for N(0,I))
    slope = float(jnp.sum(score * xt) / jnp.sum(xt * xt))
    assert abs(slope + 1.0) < 0.15, slope


def test_diffusion_forms(key):
    interp = LinearInterpolant()
    x = jax.random.normal(key, (4, 2))
    t = jnp.full((4,), 0.5)
    for form in ("constant", "SBDM", "sigma", "linear", "decreasing", "increasing-decreasing"):
        d = interp.compute_diffusion(x, t, form=form)
        # broadcastable against x (the reference also returns (B, 1)-shaped coefficients)
        assert jnp.broadcast_shapes(d.shape, x.shape) == x.shape
    with pytest.raises(ValueError):
        interp.compute_diffusion(x, t, form="bogus")


def test_expand_t_like_x(key):
    t = jnp.arange(4.0)
    x = jnp.zeros((4, 3, 2))
    assert expand_t_like_x(t, x).shape == (4, 1, 1)
    assert expand_t_like_x(jnp.float32(0.5), x).shape == ()


def test_registry():
    assert isinstance(get_interpolant("linear"), LinearInterpolant)
    assert isinstance(get_interpolant("vp", sigma_min=0.2), VariancePreservingInterpolant)
    assert get_interpolant("vp", sigma_min=0.2).sigma_min == 0.2
    with pytest.raises(ValueError):
        get_interpolant("bogus")
    inst = CosineInterpolant()
    assert resolve_interpolant(inst) is inst
    assert isinstance(resolve_interpolant(None, default="cosine"), CosineInterpolant)
    with pytest.raises(TypeError):
        resolve_interpolant(3.0)

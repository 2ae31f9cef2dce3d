r"""Prediction-conversion identity matrix (reference ``base_interpolant.py:177-244``).

For a Gaussian path :math:`x_t = \alpha(t) x_1 + \sigma(t) x_0` with
:math:`x_0 \sim N(0, I)`, the three prediction parameterizations are linked by
closed-form identities. Conditioning on a KNOWN pair ``(x0, x1)``:

- true velocity:  :math:`u_t = \dot\alpha x_1 + \dot\sigma x_0`
- true noise:     :math:`x_0` itself
- true conditional score: :math:`-x_0 / \sigma`

Every conversion must map each true quantity onto the corresponding one,
and roundtrips must be identity — per interpolant, per t, tested on random
pairs. This pins the exact algebra the FlowSampler drift builders and
Eq/EnergyMatching targets rely on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchebm_tpu.interpolants import (
    CosineInterpolant,
    LinearInterpolant,
    VariancePreservingInterpolant,
)
from torchebm_tpu.interpolants.base import expand_t_like_x

ALL = [LinearInterpolant(), CosineInterpolant(), VariancePreservingInterpolant()]
IDS = [type(i).__name__ for i in ALL]
# interior t values — conversions have clamped denominators at the endpoints
TS = [0.2, 0.5, 0.8]


def _pair(key, n=16, d=3):
    x0 = jax.random.normal(key, (n, d))
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (n, d))
    return x0, x1


def _truths(interp, x0, x1, tval):
    t = jnp.full((x0.shape[0],), tval)
    xt, ut = interp.interpolate(x0, x1, t)
    a, _ = interp.compute_alpha_t(t)
    s, _ = interp.compute_sigma_t(t)
    s_b = expand_t_like_x(s, x0)
    score = -x0 / s_b
    return t, xt, ut, x0, score


@pytest.mark.parametrize("tval", TS)
@pytest.mark.parametrize("interp", ALL, ids=IDS)
def test_velocity_to_score(interp, tval, key):
    x0, x1 = _pair(key)
    t, xt, ut, noise, score = _truths(interp, x0, x1, tval)
    got = interp.velocity_to_score(ut, xt, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(score), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("tval", TS)
@pytest.mark.parametrize("interp", ALL, ids=IDS)
def test_velocity_to_noise(interp, tval, key):
    x0, x1 = _pair(key)
    t, xt, ut, noise, _ = _truths(interp, x0, x1, tval)
    got = interp.velocity_to_noise(ut, xt, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(noise), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("tval", TS)
@pytest.mark.parametrize("interp", ALL, ids=IDS)
def test_score_to_velocity(interp, tval, key):
    x0, x1 = _pair(key)
    t, xt, ut, _, score = _truths(interp, x0, x1, tval)
    got = interp.score_to_velocity(score, xt, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ut), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("tval", TS)
@pytest.mark.parametrize("interp", ALL, ids=IDS)
def test_velocity_score_roundtrip(interp, tval, key):
    """score_to_velocity ∘ velocity_to_score = identity on arbitrary fields."""
    x0, x1 = _pair(key)
    t = jnp.full((x0.shape[0],), tval)
    xt, _ = interp.interpolate(x0, x1, t)
    v = jax.random.normal(jax.random.fold_in(key, 9), xt.shape)  # any field
    back = interp.score_to_velocity(interp.velocity_to_score(v, xt, t), xt, t)
    np.testing.assert_allclose(np.asarray(back), np.asarray(v), rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("interp", ALL, ids=IDS)
def test_drift_consistent_with_score_parameterization(interp, key):
    r"""compute_drift returns (−drift_mean, drift_var) — the reference's
    negated convention (``base_interpolant.py:107-130``) — so the true
    conditional velocity is :math:`u = -f(x,t) + g(x,t)\,\nabla\log p`."""
    x0, x1 = _pair(key)
    for tval in TS:
        t, xt, ut, _, score = _truths(interp, x0, x1, tval)
        f, g = interp.compute_drift(xt, t)
        np.testing.assert_allclose(
            np.asarray(-f + g * score), np.asarray(ut), rtol=5e-4, atol=5e-4,
            err_msg=f"{type(interp).__name__} at t={tval}",
        )


@pytest.mark.parametrize("form", ["constant", "SBDM", "sigma", "linear",
                                  "decreasing", "increasing-decreasing"])
@pytest.mark.parametrize("interp", ALL, ids=IDS)
def test_diffusion_forms_nonnegative_and_shaped(interp, form, key):
    x0, x1 = _pair(key)
    t = jnp.full((x0.shape[0],), 0.5)
    xt, _ = interp.interpolate(x0, x1, t)
    d = interp.compute_diffusion(xt, t, form=form, norm=1.7)
    assert d.shape in ((x0.shape[0],), xt.shape, (x0.shape[0], 1))
    assert bool(jnp.all(d >= 0.0))


def test_vp_beta_drift_matches_generic(key):
    """VP's β-parameterized drift override must agree with the generic
    α/σ-ratio formula (reference ``variance_preserving.py:75-118``)."""
    vp = VariancePreservingInterpolant()
    x0, x1 = _pair(key)
    for tval in TS:
        t, xt, ut, _, score = _truths(vp, x0, x1, tval)
        f, g = vp.compute_drift(xt, t)
        # independent reconstruction from α'/α and σ (note f is negated)
        a, da = vp.compute_alpha_t(t)
        s, ds = vp.compute_sigma_t(t)
        ratio = expand_t_like_x(da / a, xt)
        f_ref = -ratio * xt
        g_ref = expand_t_like_x((da / a) * s * s - s * ds, xt)
        np.testing.assert_allclose(
            np.asarray(f), np.broadcast_to(np.asarray(f_ref), f.shape),
            rtol=2e-4, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(g), np.broadcast_to(np.asarray(g_ref), g.shape),
            rtol=2e-4, atol=2e-4,
        )

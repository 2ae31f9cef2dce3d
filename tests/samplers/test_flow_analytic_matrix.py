r"""FlowSampler end-to-end matrix: interpolant × prediction with the exact
optimal field.

For Gaussian endpoints :math:`x_0 \sim N(0, I)`, :math:`x_1 \sim N(\mu, s^2 I)`
every interpolant :math:`x_t = \alpha(t) x_1 + \sigma(t) x_0` has a
closed-form optimal field (jointly Gaussian conditionals):

.. math::
    v(t) &= \alpha^2 s^2 + \sigma^2 \\
    E[x_1 | x_t] &= \mu + \tfrac{\alpha s^2}{v}(x_t - \alpha\mu), \quad
    E[x_0 | x_t] = \tfrac{\sigma}{v}(x_t - \alpha\mu) \\
    u(x_t, t) &= \dot\alpha\,E[x_1|x_t] + \dot\sigma\,E[x_0|x_t], \quad
    \nabla\log p_t = -\tfrac{x_t - \alpha\mu}{v}, \quad
    \hat\varepsilon = \tfrac{\sigma (x_t - \alpha\mu)}{v}

Feeding these as the "trained" model, generation from :math:`N(0, I)` noise
must land on :math:`N(\mu, s^2 I)` for every (interpolant, prediction) pair —
the strongest single test of the interpolant algebra, the prediction
conversions (``base_interpolant.py:177-244`` in the reference) and the ODE
path at once.
"""

import jax
import jax.numpy as jnp
import pytest

from torchebm_tpu.interpolants import get_interpolant
from torchebm_tpu.samplers import FlowSampler

MU = jnp.array([1.5, -0.5])
S = 0.7


def _ab(interp, t, x):
    a, da = interp.compute_alpha_t(t)
    sg, dsg = interp.compute_sigma_t(t)
    expand = lambda v: jnp.broadcast_to(jnp.reshape(v, (-1, 1)), x.shape)
    return map(expand, (a, da, sg, dsg))


def optimal_field(interpolant_name, prediction):
    interp = get_interpolant(interpolant_name)

    def field(x, t):
        a, da, sg, dsg = _ab(interp, t, x)
        v = a * a * S * S + sg * sg
        xc = x - a * MU
        if prediction == "velocity":
            e_x1 = MU + (a * S * S / v) * xc
            e_x0 = (sg / v) * xc
            return da * e_x1 + dsg * e_x0
        if prediction == "score":
            return -xc / v
        if prediction == "noise":
            return sg * xc / v
        raise AssertionError(prediction)

    return field


@pytest.mark.slow
@pytest.mark.parametrize("interpolant", ["linear", "cosine", "vp"])
@pytest.mark.parametrize("prediction", ["velocity", "score", "noise"])
def test_generation_hits_target_gaussian(interpolant, prediction, key):
    eps = 0.0 if prediction == "velocity" else 0.01
    fs = FlowSampler(
        model=optimal_field(interpolant, prediction),
        interpolant=interpolant,
        prediction=prediction,
        sample_eps=eps,
        integrator="rk4",
    )
    out = fs.sample(key, dim=2, n_samples=4000, n_steps=100)
    mean = jnp.mean(out, axis=0)
    var = jnp.var(out, axis=0)
    assert float(jnp.max(jnp.abs(mean - MU))) < 0.12, (interpolant, prediction, mean)
    assert float(jnp.max(jnp.abs(var - S**2))) < 0.12, (interpolant, prediction, var)


@pytest.mark.parametrize("interpolant", ["linear", "cosine", "vp"])
def test_prediction_conversions_are_consistent(interpolant, key):
    """velocity_to_score / velocity_to_noise / score_to_velocity agree with
    the closed-form fields at interior times."""
    interp = get_interpolant(interpolant)
    x = jax.random.normal(key, (64, 2))
    t = jnp.full((64,), 0.45)
    u = optimal_field(interpolant, "velocity")(x, t)
    score = optimal_field(interpolant, "score")(x, t)
    noise = optimal_field(interpolant, "noise")(x, t)
    got_score = interp.velocity_to_score(u, x, t)
    got_noise = interp.velocity_to_noise(u, x, t)
    got_u = interp.score_to_velocity(score, x, t)
    assert float(jnp.max(jnp.abs(got_score - score))) < 1e-4
    assert float(jnp.max(jnp.abs(got_noise - noise))) < 1e-4
    assert float(jnp.max(jnp.abs(got_u - u))) < 1e-4


@pytest.mark.slow
def test_sde_matches_ode_marginal(key):
    """SDE generation with the exact score lands on the same target marginal
    as the probability-flow ODE (different paths, same law)."""
    kw = dict(
        model=optimal_field("linear", "score"),
        interpolant="linear",
        prediction="score",
        sample_eps=0.01,
    )
    ode = FlowSampler(mode="ode", integrator="rk4", **kw)
    sde = FlowSampler(mode="sde", integrator="euler", **kw)
    a = ode.sample(key, dim=2, n_samples=4000, n_steps=100)
    b = sde.sample(jax.random.fold_in(key, 1), dim=2, n_samples=4000, n_steps=250)
    assert float(jnp.max(jnp.abs(jnp.mean(a, 0) - jnp.mean(b, 0)))) < 0.15
    assert float(jnp.max(jnp.abs(jnp.var(a, 0) - jnp.var(b, 0)))) < 0.15


@pytest.mark.slow
@pytest.mark.parametrize(
    "form", ["constant", "SBDM", "sigma", "linear", "decreasing", "increasing-decreasing"]
)
def test_sde_every_diffusion_form_preserves_marginal(form, key):
    """ALL six diffusion forms inject-and-remove noise consistently: with the
    exact score, each must land on the same N(μ, s²I) target (the drift
    compensation ``drift = PF-drift + D·score`` is form-dependent, so a wrong
    D shows up as a variance bias). Quantitative upgrade of the shape-only
    form coverage in test_flow.py."""
    fs = FlowSampler(
        model=optimal_field("linear", "score"),
        interpolant="linear",
        prediction="score",
        mode="sde",
        integrator="euler",
        diffusion_form=form,
        diffusion_norm=0.6,
        sample_eps=0.01,
    )
    out = fs.sample(key, dim=2, n_samples=4000, n_steps=300)
    mean = jnp.mean(out, axis=0)
    var = jnp.var(out, axis=0)
    assert float(jnp.max(jnp.abs(mean - MU))) < 0.15, (form, mean)
    assert float(jnp.max(jnp.abs(var - S**2))) < 0.2, (form, var)


@pytest.mark.slow
def test_sde_last_step_corrections_fix_terminal_mean(key):
    """With a LARGE last-step gap (SDE integration stops at t = 1 − 0.15,
    where the marginal mean is only α(1−0.15)·μ = 0.85μ), every correction
    strategy must close most of the 0.15·‖μ‖ mean bias an uncorrected stop
    leaves behind. (Variance is NOT asserted for Tweedie: jumping to
    E[x₁|x_t] under-disperses by construction — Jensen.)"""
    lss = 0.15
    base = dict(
        model=optimal_field("linear", "score"),
        interpolant="linear",
        prediction="score",
        mode="sde",
        integrator="euler",
    )

    def terminal_mean(**kw):
        fs = FlowSampler(**base, **kw)
        out = fs.sample(key, dim=2, n_samples=6000, n_steps=100)
        return jnp.mean(out, axis=0)

    # uncorrected stop at t1 = 1 - lss (via sample_eps, no last_step)
    m_stop = terminal_mean(sample_eps=lss, last_step=None)
    bias_stop = float(jnp.linalg.norm(m_stop - MU))
    assert bias_stop > 0.5 * lss * float(jnp.linalg.norm(MU)), bias_stop

    for strategy in ("Mean", "Euler", "Tweedie"):
        m = terminal_mean(sample_eps=0.01, last_step=strategy, last_step_size=lss)
        bias = float(jnp.linalg.norm(m - MU))
        assert bias < 0.5 * bias_stop, (strategy, bias, bias_stop)

    # Tweedie's exact-denoising jump should land essentially ON the mean
    m_tw = terminal_mean(sample_eps=0.01, last_step="Tweedie", last_step_size=lss)
    assert float(jnp.linalg.norm(m_tw - MU)) < 0.05

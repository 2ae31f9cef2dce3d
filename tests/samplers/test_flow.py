"""FlowSampler tests: ODE exactness, reverse mode, SDE generation, config validation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchebm_tpu.samplers import FlowSampler, PredictionType
from torchebm_tpu.samplers.flow import WrappedField


def const_velocity(c):
    return lambda x, t: jnp.broadcast_to(c, x.shape)


def gaussian_score(x, t):
    # true score of the linear-path marginal with x0, x1 ~ N(0, I)
    var = (t**2 + (1 - t) ** 2)[:, None]
    return -x / var


def test_constant_velocity_transport(key):
    c = jnp.array([2.0, -1.0])
    fs = FlowSampler(model=const_velocity(c), integrator="euler")
    x0 = jax.random.normal(key, (32, 2))
    np.testing.assert_allclose(fs.sample(key, x=x0, n_steps=50), x0 + c, atol=1e-4)


def test_adaptive_dopri5_default(key):
    c = jnp.array([1.0, 1.0])
    fs = FlowSampler(model=const_velocity(c))  # dopri5 default for ODE
    x0 = jax.random.normal(key, (8, 2))
    np.testing.assert_allclose(fs.sample(key, x=x0), x0 + c, atol=1e-4)


def test_reverse_mode(key):
    c = jnp.array([3.0, 0.0])
    fs = FlowSampler(model=const_velocity(c), reverse=True, integrator="rk4")
    x0 = jax.random.normal(key, (8, 2))
    np.testing.assert_allclose(fs.sample(key, x=x0, n_steps=20), x0 - c, atol=1e-4)


def test_negate_velocity(key):
    c = jnp.array([1.0, 0.0])
    fs = FlowSampler(model=const_velocity(c), negate_velocity=True, integrator="euler")
    x0 = jnp.zeros((4, 2))
    np.testing.assert_allclose(fs.sample(key, x=x0, n_steps=10), x0 - c, atol=1e-4)


def test_trajectory_and_time_diagnostics(key):
    fs = FlowSampler(model=const_velocity(jnp.ones(2)), integrator="euler")
    traj, diag = fs.sample(
        key, dim=2, n_samples=4, n_steps=50, thin=10,
        return_trajectory=True, return_diagnostics=True,
    )
    assert traj.shape == (4, 5, 2)
    assert set(diag) == {"mean", "var", "t"}
    np.testing.assert_allclose(diag["t"], jnp.array([0.2, 0.4, 0.6, 0.8, 1.0]), atol=1e-5)


def test_score_prediction_ode(key):
    """PF-ODE with the exact score transports N(0,I) noise to ~N(0,I) data."""
    fs = FlowSampler(
        model=gaussian_score, prediction="score", sample_eps=0.01, integrator="rk4"
    )
    out = fs.sample(key, dim=2, n_samples=4000, n_steps=100)
    assert abs(float(jnp.var(out)) - 1.0) < 0.15
    assert abs(float(jnp.mean(out))) < 0.05


def test_sde_generation(key):
    fs = FlowSampler(
        model=gaussian_score, mode="sde", prediction="score",
        sample_eps=0.01, integrator="euler",
    )
    out = fs.sample(key, dim=2, n_samples=4000, n_steps=250)
    assert abs(float(jnp.var(out)) - 1.0) < 0.2


@pytest.mark.parametrize("last_step", ["Mean", "Euler", "Tweedie", None])
def test_sde_last_steps_run(key, last_step):
    fs = FlowSampler(
        model=gaussian_score, mode="sde", prediction="score", sample_eps=0.01,
        integrator="euler", last_step=last_step, last_step_size=0.04 if last_step else None,
    )
    out = fs.sample(key, dim=2, n_samples=128, n_steps=50)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_default_n_steps():
    assert FlowSampler(model=const_velocity(jnp.ones(2))).default_n_steps == 50
    assert (
        FlowSampler(model=gaussian_score, mode="sde", prediction="score", integrator="euler").default_n_steps
        == 250
    )


def test_config_validation():
    m = const_velocity(jnp.ones(2))
    with pytest.raises(ValueError, match="mode"):
        FlowSampler(model=m, mode="both")
    with pytest.raises(ValueError, match="prediction"):
        FlowSampler(model=m, prediction="speed")
    with pytest.raises(ValueError, match="sde"):
        FlowSampler(model=m, diffusion_form="sigma")  # ODE mode offender
    with pytest.raises(ValueError, match="reverse"):
        FlowSampler(model=m, mode="sde", reverse=True)
    with pytest.raises(ValueError, match="family|Adaptive"):
        # dopri5 is ODE-family (and adaptive) — rejected for SDE mode either way
        FlowSampler(model=m, mode="sde", integrator="dopri5")
    with pytest.raises(ValueError, match="last_step"):
        FlowSampler(model=m, mode="sde", integrator="euler", last_step="Jump")


def test_adaptive_rejects_trajectory(key):
    fs = FlowSampler(model=const_velocity(jnp.ones(2)))
    with pytest.raises(NotImplementedError):
        fs.sample(key, dim=2, n_steps=10, return_trajectory=True)
    with pytest.raises(NotImplementedError):
        fs.sample(key, dim=2, n_steps=10, thin=2)


def test_wrapped_field_params_are_leaves(key):
    """Param updates through WrappedField must not retrigger compilation."""
    from torchebm_tpu.samplers.flow import _flow_sample_impl

    def fn(params, x, t):
        return params * jnp.ones_like(x)

    fs1 = FlowSampler(model=WrappedField(fn, jnp.float32(1.0)), integrator="euler")
    fs2 = FlowSampler(model=WrappedField(fn, jnp.float32(2.0)), integrator="euler")
    x0 = jnp.zeros((4, 2))
    a = fs1.sample(key, x=x0, n_steps=10)
    n = _flow_sample_impl._cache_size()
    b = fs2.sample(key, x=x0, n_steps=10)
    assert _flow_sample_impl._cache_size() == n
    np.testing.assert_allclose(a, jnp.ones_like(a), atol=1e-5)
    np.testing.assert_allclose(b, 2 * jnp.ones_like(b), atol=1e-5)


def test_prior_logp():
    fs = FlowSampler(model=const_velocity(jnp.ones(2)))
    import math

    np.testing.assert_allclose(
        fs.prior_logp(jnp.zeros((2, 3))), -1.5 * math.log(2 * math.pi), rtol=1e-6
    )


def test_prediction_type_enum():
    assert PredictionType.VELOCITY != PredictionType.SCORE
    assert FlowSampler(model=gaussian_score, prediction="score").prediction_type is PredictionType.SCORE

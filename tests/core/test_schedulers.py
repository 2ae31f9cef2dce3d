"""Scheduler formula tests (reference semantics: value(step), value(0)=start)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from torchebm_tpu.core import (
    ConstantScheduler,
    CosineScheduler,
    ExponentialDecayScheduler,
    LinearScheduler,
    MultiStepScheduler,
    TemperatureScheduler,
    WarmupScheduler,
    sched_init,
    sched_value,
)


def vals(s, n):
    return [float(s.value(i)) for i in range(n)]


def test_constant():
    np.testing.assert_allclose(vals(ConstantScheduler(0.01), 5), [0.01] * 5, rtol=1e-6)


def test_exponential_decay():
    s = ExponentialDecayScheduler(1.0, 0.9, min_value=0.5)
    expected = [max(0.5, 0.9**t) for t in range(10)]
    np.testing.assert_allclose(vals(s, 10), expected, rtol=1e-5)


def test_exponential_decay_validation():
    with pytest.raises(ValueError):
        ExponentialDecayScheduler(1.0, 1.5)
    with pytest.raises(ValueError):
        ExponentialDecayScheduler(1.0, 0.9, min_value=-1.0)


def test_linear():
    s = LinearScheduler(1.0, 0.0, 5)
    np.testing.assert_allclose(vals(s, 8), [1.0, 0.8, 0.6, 0.4, 0.2, 0.0, 0.0, 0.0], atol=1e-6)
    with pytest.raises(ValueError):
        LinearScheduler(1.0, 0.0, 0)


def test_cosine():
    s = CosineScheduler(0.1, 0.001, 100)
    assert abs(float(s.value(0)) - 0.1) < 1e-7
    assert abs(float(s.value(100)) - 0.001) < 1e-7
    assert abs(float(s.value(200)) - 0.001) < 1e-7
    # midpoint is the average
    assert abs(float(s.value(50)) - 0.0505) < 1e-6
    expected = 0.001 + (0.1 - 0.001) * 0.5 * (1 + math.cos(math.pi * 0.25))
    np.testing.assert_allclose(float(s.value(25)), expected, rtol=1e-5)


def test_multistep():
    s = MultiStepScheduler(0.1, (30, 60, 90), gamma=0.1)
    assert abs(float(s.value(29)) - 0.1) < 1e-8
    assert abs(float(s.value(30)) - 0.01) < 1e-8
    assert abs(float(s.value(60)) - 0.001) < 1e-9
    assert abs(float(s.value(95)) - 0.0001) < 1e-10
    with pytest.raises(ValueError):
        MultiStepScheduler(0.1, (30, 20))
    with pytest.raises(ValueError):
        MultiStepScheduler(0.1, (-1, 5))


def test_warmup():
    main = CosineScheduler(0.1, 0.001, 100)
    s = WarmupScheduler(main, warmup_steps=10, warmup_init_factor=0.01)
    assert abs(float(s.value(0)) - 0.001) < 1e-7  # 0.1 * 0.01
    assert abs(float(s.value(10)) - 0.1) < 1e-6  # reaches target at T
    # post warmup mirrors main at shifted step
    np.testing.assert_allclose(float(s.value(35)), float(main.value(25)), rtol=1e-6)


def test_temperature_scheduler():
    s = TemperatureScheduler(epsilon_max=0.15, tau_star=0.8, n_steps=10, t_end=1.0, sqrt=False)
    v = vals(s, 11)
    assert v[:8] == [0.0] * 8  # t < tau*: zero temperature
    np.testing.assert_allclose(v[9], 0.15 * (0.9 - 0.8) / 0.2, rtol=1e-5)
    np.testing.assert_allclose(v[10], 0.15, rtol=1e-6)
    # sqrt mode returns sqrt(eps)
    s2 = TemperatureScheduler(epsilon_max=0.15, tau_star=0.8, n_steps=10, t_end=1.0)
    np.testing.assert_allclose(float(s2.value(10)), math.sqrt(0.15), rtol=1e-6)
    # plateau beyond t=1 (t_end > 1)
    s3 = TemperatureScheduler(epsilon_max=0.15, tau_star=0.8, n_steps=325, t_end=3.25, sqrt=False)
    np.testing.assert_allclose(float(s3.value(325)), 0.15, rtol=1e-6)


def test_temperature_validation():
    with pytest.raises(ValueError):
        TemperatureScheduler(-1.0)
    with pytest.raises(ValueError):
        TemperatureScheduler(0.1, tau_star=1.0)
    with pytest.raises(ValueError):
        TemperatureScheduler(0.1, n_steps=0)
    with pytest.raises(ValueError):
        TemperatureScheduler(0.1, t_start=1.0, t_end=0.5)


def test_sched_value_accepts_floats_and_schedulers():
    assert float(sched_value(0.5, 3)) == 0.5
    s = LinearScheduler(1.0, 0.0, 2)
    assert float(sched_value(s, 1)) == 0.5
    assert sched_init(s) == 1.0
    assert sched_init(0.25) == 0.25


def test_scheduler_traced_step():
    """Schedulers evaluate under jit with a traced step (scan-carry form)."""
    import jax

    s = WarmupScheduler(CosineScheduler(0.1, 0.0, 50), 5)
    f = jax.jit(lambda i: s.value(i))
    np.testing.assert_allclose(float(f(jnp.int32(20))), float(s.value(20)), rtol=1e-6)

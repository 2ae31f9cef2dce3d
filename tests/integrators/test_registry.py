"""Integrator registry and resolution tests (reference ``integrator_utils.py``)."""

import pytest

from torchebm_tpu.integrators import (
    Dopri5Integrator,
    EulerMaruyamaIntegrator,
    LeapfrogIntegrator,
    get_integrator,
    resolve_integrator,
)


def test_get_by_name_and_aliases():
    assert isinstance(get_integrator("euler"), EulerMaruyamaIntegrator)
    assert isinstance(get_integrator("euler_maruyama"), EulerMaruyamaIntegrator)
    assert isinstance(get_integrator("DOPRI5"), Dopri5Integrator)


def test_kwargs_forwarding():
    d = get_integrator("dopri5", atol=1e-9)
    assert d.atol == 1e-9


def test_unknown_name():
    with pytest.raises(ValueError, match="Unknown integrator"):
        get_integrator("rk99")
    with pytest.raises(TypeError):
        get_integrator(5)


def test_resolve_default_and_instance():
    r = resolve_integrator(None, default="euler_maruyama")
    assert isinstance(r, EulerMaruyamaIntegrator)
    inst = Dopri5Integrator()
    assert resolve_integrator(inst, default="euler") is inst


def test_resolve_family_validation():
    with pytest.raises(ValueError, match="family"):
        resolve_integrator("leapfrog", default="euler", families=("sde",))
    r = resolve_integrator("leapfrog", default="euler", families=("symplectic",))
    assert isinstance(r, LeapfrogIntegrator)


def test_resolve_type_error():
    with pytest.raises(TypeError):
        resolve_integrator(3.14, default="euler")

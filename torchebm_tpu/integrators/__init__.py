"""Numerical integrators (ODE / SDE / symplectic) for TPU-native EBM dynamics.

Mirrors the capability surface of ``torchebm/integrators/`` (13 integrators +
registry, reference ``integrators/__init__.py:8-24``) with all stepping loops
expressed as fused XLA programs.
"""

from .adaptive_heun import AdaptiveHeunIntegrator
from .base import (
    AdaptiveStats,
    BaseIntegrator,
    BaseRungeKuttaIntegrator,
    BaseSDERungeKuttaIntegrator,
    BaseSymplecticIntegrator,
)
from .bosh3 import Bosh3Integrator
from .dopri import Dopri5Integrator, Dopri8Integrator
from .euler_maruyama import BackwardEulerMaruyamaIntegrator, EulerMaruyamaIntegrator
from .heun import HeunIntegrator
from .leapfrog import GeneralisedLeapfrogIntegrator, LeapfrogIntegrator
from .midpoint import MidpointIntegrator
from .registry import INTEGRATOR_REGISTRY, get_integrator, resolve_integrator
from .rk4 import RK438Integrator, RK4Integrator

__all__ = [
    "AdaptiveStats",
    "BaseIntegrator",
    "BaseRungeKuttaIntegrator",
    "BaseSDERungeKuttaIntegrator",
    "BaseSymplecticIntegrator",
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
    "INTEGRATOR_REGISTRY",
    "get_integrator",
    "resolve_integrator",
]

r"""Langevin dynamics sampler.

Reference: ``torchebm/samplers/langevin_dynamics.py:16-188``. Update rule

.. math::
    x_{t+1} = x_t - \eta\, \nabla_x U(x_t)
    + \text{noise\_scale}\cdot\sqrt{2\eta}\,\varepsilon_t

via a pluggable SDE integrator (default Euler–Maruyama). ``step_size`` and
``noise_scale`` are schedulable; optional ``clamp`` bounds the state per step
(image-EBM stabilization). The whole chain compiles to one XLA program through
:class:`~torchebm_tpu.samplers.base.BaseSampler`.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import struct

from ..core.energies import Energy
from ..core.schedulers import BaseScheduler, sched_value
from ..integrators import BaseSDERungeKuttaIntegrator, resolve_integrator
from .base import BaseSampler

Array = jax.Array

__all__ = ["LangevinDynamics"]


@struct.dataclass
class LangevinDynamics(BaseSampler):
    """Overdamped Langevin MCMC over a pluggable SDE integrator."""

    model: Energy
    step_size: Union[float, BaseScheduler] = 1e-3
    noise_scale: Union[float, BaseScheduler] = 1.0
    clamp: Optional[Tuple[float, float]] = struct.field(pytree_node=False, default=None)
    integrator: BaseSDERungeKuttaIntegrator = None

    def __post_init__(self):
        if self.clamp is not None and self.clamp[0] >= self.clamp[1]:
            raise ValueError(f"clamp min must be < max, got {self.clamp}")
        integ = resolve_integrator(
            self.integrator, default="euler_maruyama", families=("sde",)
        )
        object.__setattr__(self, "integrator", integ)

    def step(self, carry, i, key, model_kwargs):
        x = carry["x"]
        out = self.integrator.step(
            {"x": x},
            sched_value(self.step_size, i),
            drift=lambda x_, t_: -self.gradient_of(x_, model_kwargs, step=i),
            key=key,
            noise_scale=sched_value(self.noise_scale, i),
        )
        x = out["x"]
        if self.clamp is not None:
            x = jnp.clip(x, self.clamp[0], self.clamp[1])
        return {"x": x}

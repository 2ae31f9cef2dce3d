r"""Deterministic mode-seeking samplers: gradient descent and Nesterov.

Reference: ``torchebm/samplers/gradient_descent.py:16-275``.
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp
from flax import struct

from ..core.energies import Energy
from ..core.schedulers import BaseScheduler, sched_value
from .base import BaseSampler

Array = jax.Array

__all__ = ["GradientDescentSampler", "NesterovSampler"]


@struct.dataclass
class GradientDescentSampler(BaseSampler):
    r"""Deterministic energy minimization :math:`x_{k+1} = x_k - \eta \nabla E(x_k)`
    (reference ``gradient_descent.py:16-137``)."""

    model: Energy
    step_size: Union[float, BaseScheduler] = 1e-3

    def step(self, carry, i, key, model_kwargs):
        del key
        eta = sched_value(self.step_size, i)
        x = carry["x"]
        return {"x": x - eta * self.gradient_of(x, model_kwargs, step=i)}


@struct.dataclass
class NesterovSampler(BaseSampler):
    r"""Nesterov accelerated gradient descent (reference ``gradient_descent.py:141-275``).

    .. math::
        v_{k+1} = \mu v_k - \eta \nabla E(x_k + \mu v_k), \qquad
        x_{k+1} = x_k + v_{k+1}
    """

    model: Energy
    step_size: Union[float, BaseScheduler] = 1e-3
    momentum: float = struct.field(pytree_node=False, default=0.9)

    def __post_init__(self):
        if not (0 <= self.momentum < 1):
            raise ValueError("momentum must be in [0, 1)")

    def init_carry(self, x0, key, model_kwargs):
        return {"x": x0, "v": jnp.zeros_like(x0)}

    def step(self, carry, i, key, model_kwargs):
        del key
        eta = sched_value(self.step_size, i)
        x, v = carry["x"], carry["v"]
        lookahead = x + self.momentum * v
        grad = self.gradient_of(lookahead, model_kwargs, step=i)
        v = self.momentum * v - eta * grad
        return {"x": x + v, "v": v}

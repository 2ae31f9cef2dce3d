"""Pallas TPU kernels (the reference's ``torchebm/cuda`` layer, TPU-native).

Like the reference (``cuda/__init__.py:8``, ``__all__ = []``), the kernels are
hand-wired where wanted, not auto-dispatched: import them explicitly from
:mod:`torchebm_tpu.ops.fused_langevin`.
"""

from .fused_langevin import (
    doublewell_langevin_chain,
    fused_langevin_step,
    mixture_langevin_chain,
)

__all__ = [
    "fused_langevin_step",
    "doublewell_langevin_chain",
    "mixture_langevin_chain",
]

"""MCMC and generative samplers, all compiled to single XLA programs.

Mirrors ``torchebm/samplers/__init__.py:10-21`` plus build additions
(dual-averaging warmup, R̂/ESS diagnostics).
"""

from .ais import AISResult, annealed_importance_sampling
from .base import BaseSampler
from .diagnostics import (
    effective_sample_size,
    potential_scale_reduction,
    summarize_chains,
    tail_effective_sample_size,
)
from .gradient_descent import GradientDescentSampler, NesterovSampler
from .hmc import DualAveragingState, HamiltonianMonteCarlo, dual_averaging_update
from .langevin import LangevinDynamics
from .mala import MetropolisAdjustedLangevin
from .nuts import NoUTurnSampler
from .parallel_tempering import ParallelTemperingLangevin
from .rmhmc import RiemannianManifoldHMC
from .tuning import TrajectoryTuning, tune_trajectory_length

__all__ = [
    "TrajectoryTuning",
    "tune_trajectory_length",
    "AISResult",
    "annealed_importance_sampling",
    "BaseSampler",
    "FlowSampler",
    "PredictionType",
    "LangevinDynamics",
    "MetropolisAdjustedLangevin",
    "NoUTurnSampler",
    "ParallelTemperingLangevin",
    "HamiltonianMonteCarlo",
    "RiemannianManifoldHMC",
    "GradientDescentSampler",
    "NesterovSampler",
    "DualAveragingState",
    "dual_averaging_update",
    "potential_scale_reduction",
    "effective_sample_size",
    "tail_effective_sample_size",
    "summarize_chains",
]


def __getattr__(name):
    # FlowSampler lives in its own module with interpolant dependencies;
    # lazy-load to keep the MCMC path import-light.
    if name in ("FlowSampler", "PredictionType"):
        from . import flow

        return getattr(flow, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

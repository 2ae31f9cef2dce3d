"""Pallas TPU kernels (the reference's ``torchebm/cuda`` layer, TPU-native).

The whole-chain kernels are auto-dispatched by the samplers on eager TPU
calls with supported analytic energies (``LangevinDynamics(fused="auto")``,
``HamiltonianMonteCarlo(fused="auto")``, ``MetropolisAdjustedLangevin(fused="auto")``,
``ParallelTemperingLangevin(fused="auto")``); everything is also importable
directly for hand-wired use, mirroring the reference's explicit-import stance
(``cuda/__init__.py:8``).
"""

from .fused_hmc import mixture_hmc_chain, mixture_hmc_chain_trajectory
from .fused_mala import mixture_mala_chain, mixture_mala_chain_trajectory
from .fused_langevin import (
    doublewell_langevin_chain,
    doublewell_langevin_chain_trajectory,
    fused_langevin_step,
    mixture_langevin_chain,
    mixture_langevin_chain_trajectory,
)
from .fused_mlp_langevin import extract_mlp_layers, mlp_langevin_chain
from .fused_pt import pt_langevin_chain, pt_langevin_chain_trajectory
from .fused_ais import mixture_ais_run
from .fused_sinkhorn import sinkhorn_log_fused

__all__ = [
    "sinkhorn_log_fused",
    "mlp_langevin_chain",
    "extract_mlp_layers",
    "fused_langevin_step",
    "doublewell_langevin_chain",
    "doublewell_langevin_chain_trajectory",
    "mixture_langevin_chain",
    "mixture_langevin_chain_trajectory",
    "mixture_hmc_chain",
    "mixture_hmc_chain_trajectory",
    "mixture_mala_chain",
    "mixture_mala_chain_trajectory",
    "pt_langevin_chain",
    "pt_langevin_chain_trajectory",
    "mixture_ais_run",
]

"""API-contract table for every sampler (reference ``tests/samplers/test_api_contract.py:1-48``).

Pins the shared ``sample()`` signature prefix, return types, and
trajectory/thin/diagnostics shapes. New samplers must register a Case here.
"""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from torchebm_tpu.core import GaussianEnergy
from torchebm_tpu.samplers import (
    GradientDescentSampler,
    HamiltonianMonteCarlo,
    LangevinDynamics,
    MetropolisAdjustedLangevin,
    NesterovSampler,
    NoUTurnSampler,
    ParallelTemperingLangevin,
    RiemannianManifoldHMC,
)

DIM = 2
ENERGY = GaussianEnergy.standard(DIM)


@dataclasses.dataclass
class Case:
    name: str
    make: object
    diag_keys: tuple


def _identity_metric(x):
    return jnp.broadcast_to(jnp.eye(DIM), (x.shape[0], DIM, DIM))


CASES = [
    Case("langevin", lambda: LangevinDynamics(ENERGY, step_size=0.01), ("mean", "var", "energy")),
    Case("hmc", lambda: HamiltonianMonteCarlo(ENERGY, step_size=0.1, n_leapfrog_steps=3),
         ("mean", "var", "energy", "acceptance_rate")),
    Case("rmhmc", lambda: RiemannianManifoldHMC(ENERGY, metric_fn=_identity_metric, step_size=0.1, n_leapfrog_steps=2),
         ("mean", "var", "energy", "acceptance_rate")),
    Case("mala", lambda: MetropolisAdjustedLangevin(ENERGY, step_size=0.05),
         ("mean", "var", "energy", "acceptance_rate")),
    Case("nuts", lambda: NoUTurnSampler(ENERGY, step_size=0.3, max_tree_depth=5),
         ("mean", "var", "energy", "acceptance_rate", "tree_depth", "divergence_rate")),
    Case("gd", lambda: GradientDescentSampler(ENERGY, step_size=0.1), ("mean", "var", "energy")),
    Case("nesterov", lambda: NesterovSampler(ENERGY, step_size=0.1), ("mean", "var", "energy")),
    Case("pt_langevin",
         lambda: ParallelTemperingLangevin(ENERGY, temperatures=(1.0, 2.0), step_size=0.01),
         ("mean", "var", "energy", "swap_acceptance_rate")),
]


@pytest.mark.parametrize("case", CASES, ids=lambda c: c.name)
def test_plain_sample_shape(case, key):
    sampler = case.make()
    out = sampler.sample(key, dim=DIM, n_samples=7, n_steps=5)
    assert out.shape == (7, DIM)
    assert out.dtype == jnp.float32


@pytest.mark.parametrize("case", CASES, ids=lambda c: c.name)
def test_trajectory_thin_shapes(case, key):
    sampler = case.make()
    traj = sampler.sample(key, dim=DIM, n_samples=4, n_steps=10, thin=3, return_trajectory=True)
    assert traj.shape == (4, 10 // 3, DIM)


@pytest.mark.parametrize("case", CASES, ids=lambda c: c.name)
def test_diagnostics_contract(case, key):
    sampler = case.make()
    out, diag = sampler.sample(
        key, dim=DIM, n_samples=4, n_steps=6, thin=2, return_diagnostics=True
    )
    assert out.shape == (4, DIM)
    n_kept = 3
    assert set(diag) == set(case.diag_keys)
    assert diag["energy"].shape == (n_kept,)
    assert diag["mean"].shape == (n_kept, DIM)
    assert diag["var"].shape == (n_kept, DIM)
    if "acceptance_rate" in diag:
        assert diag["acceptance_rate"].shape == (n_kept,)
        assert bool(jnp.all((diag["acceptance_rate"] >= 0) & (diag["acceptance_rate"] <= 1)))


@pytest.mark.parametrize("case", CASES, ids=lambda c: c.name)
def test_x_init_used(case, key):
    sampler = case.make()
    x0 = 100.0 * jnp.ones((3, DIM))
    out = sampler.sample(key, x=x0, n_steps=1)
    # one step from a far-out start stays far out (no silent re-init)
    assert float(jnp.min(jnp.abs(out))) > 10.0


@pytest.mark.parametrize("case", CASES, ids=lambda c: c.name)
def test_validation_errors(case, key):
    sampler = case.make()
    with pytest.raises(ValueError):
        sampler.sample(key, dim=DIM, n_steps=5, thin=0)
    with pytest.raises(ValueError):
        sampler.sample(key, n_steps=5)  # no x, no dim
    with pytest.raises(ValueError):
        sampler.sample(key, dim=DIM, n_steps=0)


@pytest.mark.parametrize("case", CASES, ids=lambda c: c.name)
def test_tuple_dim(case, key):
    sampler = case.make()
    out = sampler.sample(key, dim=(DIM,), n_samples=3, n_steps=2)
    assert out.shape == (3, DIM)

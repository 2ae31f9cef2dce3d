"""Cross-cutting PRNG-key contract suite (reference ``tests/test_generator.py:75-227``).

For every stochastic component: the same key reproduces bit-for-bit, different
keys decorrelate, and rank-folding decorrelates chains (the distributed RNG
contract). JAX's explicit key threading IS the reference's explicit-generator
contract; the "None uses the global RNG" leg has no analogue (keys are
mandatory), which this suite documents by asserting keys are required.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchebm_tpu.core import GaussianEnergy, GaussianMixtureEnergy, WrappedEnergy
from torchebm_tpu.couplings import SinkhornCoupling, UnbalancedSinkhornCoupling
from torchebm_tpu.losses import ContrastiveDivergence, DenoisingScoreMatching
from torchebm_tpu.models import MLPEnergy
from torchebm_tpu.samplers import (
    FlowSampler,
    GradientDescentSampler,
    HamiltonianMonteCarlo,
    LangevinDynamics,
    MetropolisAdjustedLangevin,
    NesterovSampler,
    NoUTurnSampler,
    ParallelTemperingLangevin,
    RiemannianManifoldHMC,
    annealed_importance_sampling,
)

ENERGY = GaussianEnergy.standard(2)


def _samplers():
    return [
        LangevinDynamics(ENERGY, step_size=0.01),
        HamiltonianMonteCarlo(ENERGY, step_size=0.1, n_leapfrog_steps=3),
        RiemannianManifoldHMC(
            ENERGY,
            metric_fn=lambda x: jnp.broadcast_to(jnp.eye(2), (x.shape[0], 2, 2)),
            step_size=0.1,
            n_leapfrog_steps=2,
        ),
        FlowSampler(model=lambda x, t: -x, mode="sde", prediction="score",
                    sample_eps=0.01, integrator="euler"),
        ParallelTemperingLangevin(ENERGY, temperatures=(1.0, 2.0), step_size=0.01),
        MetropolisAdjustedLangevin(ENERGY, step_size=0.1),
        NoUTurnSampler(ENERGY, step_size=0.3, max_tree_depth=3),
    ]


@pytest.mark.parametrize("sampler", _samplers(), ids=lambda s: type(s).__name__)
def test_same_key_reproduces_different_key_decorrelates(sampler, key):
    a = sampler.sample(key, dim=2, n_samples=16, n_steps=10)
    b = sampler.sample(key, dim=2, n_samples=16, n_steps=10)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = sampler.sample(jax.random.fold_in(key, 1), dim=2, n_samples=16, n_steps=10)
    assert float(jnp.max(jnp.abs(a - c))) > 1e-6


def test_rank_folding_decorrelates_chains(key):
    """The distributed contract: rank-folded keys give independent chains while
    a shared key gives identical ones (reference ``tests/distributed/test_generator_ranks.py``)."""
    sampler = LangevinDynamics(GaussianMixtureEnergy.eight_gaussians(), step_size=0.05)
    shared_a = sampler.sample(key, dim=2, n_samples=32, n_steps=20)
    shared_b = sampler.sample(key, dim=2, n_samples=32, n_steps=20)
    np.testing.assert_array_equal(np.asarray(shared_a), np.asarray(shared_b))

    rank0 = sampler.sample(jax.random.fold_in(key, 0), dim=2, n_samples=32, n_steps=20)
    rank1 = sampler.sample(jax.random.fold_in(key, 1), dim=2, n_samples=32, n_steps=20)
    corr = float(jnp.mean(rank0 * rank1)) - float(jnp.mean(rank0)) * float(jnp.mean(rank1))
    assert float(jnp.max(jnp.abs(rank0 - rank1))) > 1e-3
    assert abs(corr) < 1.0  # not identical streams


@pytest.mark.parametrize(
    "make",
    [
        lambda: GradientDescentSampler(ENERGY, step_size=0.1),
        lambda: NesterovSampler(ENERGY, step_size=0.1),
    ],
    ids=["gd", "nesterov"],
)
def test_deterministic_sampler_ignores_key_for_updates(key, make):
    """GD/Nesterov are deterministic given x: the key only seeds the init."""
    sampler = make()
    x0 = jnp.ones((8, 2))
    a = sampler.sample(key, x=x0, n_steps=10)
    b = sampler.sample(jax.random.fold_in(key, 5), x=x0, n_steps=10)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ais_key_contract(key):
    target = GaussianEnergy.create(mean=jnp.ones(2), cov=0.5 * jnp.eye(2))
    a = annealed_importance_sampling(key, target, dim=2, n_samples=64,
                                     n_rungs=10, step_size=0.1)
    b = annealed_importance_sampling(key, target, dim=2, n_samples=64,
                                     n_rungs=10, step_size=0.1)
    np.testing.assert_array_equal(np.asarray(a.samples), np.asarray(b.samples))
    assert float(a.log_z) == float(b.log_z)
    c = annealed_importance_sampling(jax.random.fold_in(key, 1), target, dim=2,
                                     n_samples=64, n_rungs=10, step_size=0.1)
    assert float(jnp.max(jnp.abs(a.samples - c.samples))) > 1e-6


def test_coupling_key_contract(key):
    x0 = jax.random.normal(key, (32, 2))
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (32, 2))
    for coupling in (SinkhornCoupling(), UnbalancedSinkhornCoupling()):
        a = coupling(x0, x1, key=key)
        b = coupling(x0, x1, key=key)
        np.testing.assert_array_equal(np.asarray(a.x1), np.asarray(b.x1))
        c = coupling(x0, x1, key=jax.random.fold_in(key, 2))
        assert float(jnp.max(jnp.abs(a.x1 - c.x1))) > 1e-6
        with pytest.raises(ValueError):
            coupling(x0, x1)  # keys are mandatory for stochastic couplings


def test_loss_key_contract(key):
    mlp = MLPEnergy(hidden_dims=(16,))
    params = mlp.init(key, jnp.zeros((1, 2)))
    energy = WrappedEnergy(fn=mlp.apply, params=params)
    x = jax.random.normal(key, (16, 2))

    dsm = DenoisingScoreMatching(model=energy, noise_scale=0.2)
    np.testing.assert_array_equal(
        np.asarray(dsm(params, x, key)), np.asarray(dsm(params, x, key))
    )
    assert float(dsm(params, x, key)) != float(dsm(params, x, jax.random.fold_in(key, 1)))

    cd = ContrastiveDivergence(
        model=energy, sampler=LangevinDynamics(energy, step_size=0.01), k_steps=3
    )
    (la, (na, _)) = cd(params, x, key)
    (lb, (nb, _)) = cd(params, x, key)
    np.testing.assert_array_equal(np.asarray(na), np.asarray(nb))
    assert float(la) == float(lb)


def test_matching_loss_key_contract(key):
    """SSM / EqM / EM: same key reproduces, different key decorrelates."""
    from torchebm_tpu.interpolants import LinearInterpolant
    from torchebm_tpu.losses import (
        EnergyMatchingLoss,
        EquilibriumMatchingLoss,
        SlicedScoreMatching,
    )
    from torchebm_tpu.models import MLPVelocityField
    from torchebm_tpu.samplers.flow import WrappedField

    mlp = MLPEnergy(hidden_dims=(16,))
    params = mlp.init(key, jnp.zeros((1, 2)))
    energy = WrappedEnergy(fn=mlp.apply, params=params)
    x = jax.random.normal(key, (16, 2))

    vnet = MLPVelocityField(hidden_dims=(16,))
    vparams = vnet.init(key, jnp.zeros((1, 2)), jnp.zeros((1,)))
    field = WrappedField(fn=vnet.apply, params=vparams)

    losses = [
        (params, SlicedScoreMatching(model=energy, n_projections=2)),
        (vparams, EquilibriumMatchingLoss(model=field, interpolant=LinearInterpolant())),
        (params, EnergyMatchingLoss(model=energy, lambda_cd=1.0,
                                    coupling="independent", n_langevin_steps=3)),
    ]
    for p, loss in losses:
        out = loss(p, x, key)
        la = out[0] if isinstance(out, tuple) else out
        out_b = loss(p, x, key)
        lb = out_b[0] if isinstance(out_b, tuple) else out_b
        assert float(la) == float(lb), type(loss).__name__
        out_c = loss(p, x, jax.random.fold_in(key, 1))
        lc = out_c[0] if isinstance(out_c, tuple) else out_c
        assert float(la) != float(lc), type(loss).__name__

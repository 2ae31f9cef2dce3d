"""bf16 mixed-precision battery: samplers and losses under the bf16 policy.

VERDICT r4 #4b: the library ships a bf16 policy (`utils/precision.py`) and
bf16 headline numbers, but no dtype battery pinned the behavior. This module
pins three contracts:

1. **State dtype is preserved**: a bf16 chain state stays bf16 through the
   compiled loop even when f32 parameters/scheduler scalars promote
   intermediate math (the loop casts the carry back per step).
2. **Compute-in-bf16 keeps statistical quality**: samplers over
   policy-wrapped (bf16-compute) energies reproduce analytic moments within
   (looser) tolerance; losses stay finite with finite grads.
3. **Outputs are f32**: policy-wrapped energies and the `dtype=bf16` flax
   nets emit f32 user-facing outputs (losses/energies) — bf16 is an internal
   compute dtype, matching the reference's AMP discipline
   (`torchebm/core/base_module.py:143-176`) without loss scaling.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from torchebm_tpu.core import (
    DoubleWellEnergy,
    GaussianEnergy,
    GaussianMixtureEnergy,
    as_energy,
)
from torchebm_tpu.core.energies import WrappedEnergy
from torchebm_tpu.losses import (
    ContrastiveDivergence,
    DenoisingScoreMatching,
    EquilibriumMatchingLoss,
    SlicedScoreMatching,
)
from torchebm_tpu.models import MLPEnergy, MLPVelocityField
from torchebm_tpu.samplers import (
    HamiltonianMonteCarlo,
    LangevinDynamics,
    MetropolisAdjustedLangevin,
    ParallelTemperingLangevin,
)
from torchebm_tpu.utils.precision import bf16_policy


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


def _bf16_energy(energy):
    """Analytic energy with all compute cast to bf16 (policy-wrapped)."""
    return WrappedEnergy(fn=bf16_policy().wrap(energy.energy))


# ------------------------------------------------------ 1. state dtype rules


@pytest.mark.parametrize(
    "make",
    [
        lambda e: LangevinDynamics(e, step_size=0.05),
        lambda e: MetropolisAdjustedLangevin(e, step_size=0.05),
        lambda e: HamiltonianMonteCarlo(e, step_size=0.1, n_leapfrog_steps=3),
        lambda e: ParallelTemperingLangevin(e, temperatures=(1.0, 2.0), step_size=0.05),
    ],
    ids=["langevin", "mala", "hmc", "pt"],
)
def test_bf16_state_dtype_preserved(key, make):
    """A bf16 x0 yields a bf16 chain and bf16 samples — the loop does not
    silently promote the state to f32 (and does not fail to trace)."""
    sampler = make(GaussianEnergy.standard(2))
    x0 = jax.random.normal(key, (32, 2)).astype(jnp.bfloat16)
    out = sampler.sample(jax.random.fold_in(key, 1), x=x0, n_steps=10)
    assert out.dtype == jnp.bfloat16
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))


def test_bf16_trajectory_and_diagnostics_dtypes(key):
    sampler = LangevinDynamics(DoubleWellEnergy(), step_size=0.01)
    x0 = jax.random.normal(key, (16, 2)).astype(jnp.bfloat16)
    traj, diag = sampler.sample(
        jax.random.fold_in(key, 1), x=x0, n_steps=8, thin=2,
        return_trajectory=True, return_diagnostics=True,
    )
    assert traj.dtype == jnp.bfloat16
    # diagnostics reduce over the state; they inherit the promoted dtype of
    # the reduction (f32 when the energy computes in f32)
    assert bool(jnp.all(jnp.isfinite(diag["energy"])))


# --------------------------------------------- 2. statistical quality, bf16


@pytest.mark.slow
def test_langevin_bf16_compute_moments(key):
    """Langevin over a bf16-COMPUTE Gaussian energy (f32 state) recovers the
    analytic moments within a looser tolerance than the f32 battery."""
    mean = jnp.array([1.0, -1.0])
    cov = 0.5 * jnp.eye(2)
    sampler = LangevinDynamics(
        _bf16_energy(GaussianEnergy.create(mean, cov)), step_size=0.05
    )
    out = sampler.sample(key, dim=2, n_samples=4000, n_steps=800)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(jnp.mean(out, 0), mean, atol=0.12)
    np.testing.assert_allclose(jnp.cov(out.T), cov, atol=0.15)


@pytest.mark.slow
def test_hmc_bf16_compute_acceptance_and_moments(key):
    e = _bf16_energy(GaussianEnergy.standard(2))
    hmc = HamiltonianMonteCarlo(e, step_size=0.3, n_leapfrog_steps=8)
    out, diag = hmc.sample(
        key, dim=2, n_samples=512, n_steps=300, return_diagnostics=True
    )
    acc = float(jnp.mean(diag["acceptance_rate"]))
    # bf16 Hamiltonian rounding costs some acceptance but must not collapse
    assert acc > 0.5, acc
    np.testing.assert_allclose(jnp.var(out, 0), jnp.ones(2), atol=0.25)


def test_mixture_bf16_compute_stays_on_modes(key):
    mix = GaussianMixtureEnergy.eight_gaussians(radius=4.0, scale=0.4)
    sampler = LangevinDynamics(_bf16_energy(mix), step_size=0.05)
    x0 = mix.sample(key, 1024)
    out = sampler.sample(jax.random.fold_in(key, 1), x=x0, n_steps=200)
    r = jnp.linalg.norm(out, axis=-1)
    assert abs(float(jnp.mean(r)) - 4.0) < 0.3


# ------------------------------------------------------- 3. losses under bf16


def _bf16_mlp(key, dim=2):
    net = MLPEnergy(hidden_dims=(32, 32), dtype=jnp.bfloat16)
    params = net.init(key, jnp.zeros((1, dim)))
    return net, params


def test_cd_loss_bf16_net_finite_loss_and_grads(key):
    net, params = _bf16_mlp(key)
    energy = as_energy(net, params)
    cd = ContrastiveDivergence(
        model=energy,
        sampler=LangevinDynamics(energy, step_size=0.01),
        k_steps=5,
    )
    x = jax.random.normal(jax.random.fold_in(key, 1), (64, 2))
    (loss, _), grads = jax.value_and_grad(
        lambda p: cd(p, x, jax.random.fold_in(key, 2)), has_aux=True
    )(params)
    assert loss.dtype == jnp.float32
    assert bool(jnp.isfinite(loss))
    # flax dtype=bf16 keeps PARAMS f32 (master weights); grads follow params
    for g in jax.tree_util.tree_leaves(grads):
        assert g.dtype == jnp.float32
        assert bool(jnp.all(jnp.isfinite(g)))


def test_dsm_and_ssm_bf16_net_finite(key):
    net, params = _bf16_mlp(key)
    x = jax.random.normal(jax.random.fold_in(key, 1), (64, 2))
    dsm = DenoisingScoreMatching(model=as_energy(net, params), noise_scale=0.3)
    loss, grads = jax.value_and_grad(
        lambda p: dsm(p, x, jax.random.fold_in(key, 2))
    )(params)
    assert bool(jnp.isfinite(loss)) and loss.dtype == jnp.float32
    ssm = SlicedScoreMatching(model=as_energy(net, params), n_projections=2)
    loss2 = ssm(params, x, jax.random.fold_in(key, 3))
    assert bool(jnp.isfinite(loss2))
    for g in jax.tree_util.tree_leaves(grads):
        assert bool(jnp.all(jnp.isfinite(g)))


def test_eqm_loss_bf16_field_finite(key):
    field = MLPVelocityField(hidden_dims=(32, 32), dtype=jnp.bfloat16)
    params = field.init(key, jnp.zeros((1, 2)), jnp.zeros((1,)))
    eqm = EquilibriumMatchingLoss(model=field.apply)
    x = jax.random.normal(jax.random.fold_in(key, 1), (64, 2))
    loss, grads = jax.value_and_grad(
        lambda p: eqm(p, x, jax.random.fold_in(key, 2))
    )(params)
    assert bool(jnp.isfinite(loss))
    for g in jax.tree_util.tree_leaves(grads):
        assert bool(jnp.all(jnp.isfinite(g)))


@pytest.mark.slow
def test_cd_training_quality_bf16(key):
    """Short CD run with a bf16-compute net actually learns: negatives' mean
    energy approaches the data's (loss magnitude shrinks) and params stay
    finite — bf16 needs no loss scaling (bf16 keeps f32's exponent)."""
    net, params = _bf16_mlp(key)
    energy = as_energy(net, params)
    cd = ContrastiveDivergence(
        model=energy,
        sampler=LangevinDynamics(energy, step_size=0.05),
        k_steps=10,
    )
    opt = optax.adam(5e-3)
    opt_state = opt.init(params)
    data = 0.5 * jax.random.normal(jax.random.fold_in(key, 1), (256, 2)) + jnp.array(
        [1.5, -0.5]
    )

    @jax.jit
    def step(p, s, k):
        (loss, _), g = jax.value_and_grad(lambda q: cd(q, data, k), has_aux=True)(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, loss

    losses = []
    for i in range(60):
        params, opt_state, loss = step(params, opt_state, jax.random.fold_in(key, i))
        losses.append(float(loss))
    assert all(np.isfinite(losses)), losses[-5:]
    # CD loss starts strongly positive (data energy >> negatives') and shrinks
    assert abs(np.mean(losses[-10:])) < abs(np.mean(losses[:10])), (
        np.mean(losses[:10]),
        np.mean(losses[-10:]),
    )
    for leaf in jax.tree_util.tree_leaves(params):
        assert bool(jnp.all(jnp.isfinite(leaf)))


def test_bf16_state_preserved_on_noise_block_path(key):
    """The block-noise fast path (noise_block>1) preserves a bf16 chain state
    too (regression: its scan carry promoted to f32 and failed to trace)."""
    sampler = LangevinDynamics(
        GaussianEnergy.standard(2), step_size=0.05, noise_block=4
    )
    x0 = jax.random.normal(key, (16, 2)).astype(jnp.bfloat16)
    out = sampler.sample(jax.random.fold_in(key, 1), x=x0, n_steps=12)
    assert out.dtype == jnp.bfloat16
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))

"""EqM and EM loss tests + loss_utils."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from torchebm_tpu.losses import (
    EnergyMatchingLoss,
    EquilibriumMatchingLoss,
    compute_eqm_ct,
    compute_flow_weight,
    dispersive_loss,
    mean_flat,
    trimmed_mean,
)


# ---------------------------------------------------------------- loss utils


def test_mean_flat():
    x = jnp.arange(24.0).reshape(2, 3, 4)
    np.testing.assert_allclose(mean_flat(x), x.reshape(2, -1).mean(-1))


def test_trimmed_mean():
    v = jnp.array([1.0, 2.0, 3.0, 100.0])
    np.testing.assert_allclose(float(trimmed_mean(v, 0.25)), 2.0)
    np.testing.assert_allclose(float(trimmed_mean(v, 0.0)), 26.5)
    with pytest.raises(ValueError):
        trimmed_mean(v, 1.0)


def test_compute_flow_weight():
    t = jnp.array([0.0, 0.5, 0.8, 0.9, 1.0])
    w = compute_flow_weight(t, cutoff=0.8)
    np.testing.assert_allclose(w, jnp.array([1.0, 1.0, 1.0, 0.5, 0.0]), atol=1e-6)
    np.testing.assert_allclose(compute_flow_weight(t, cutoff=1.0), jnp.ones(5))


def test_compute_eqm_ct():
    t = jnp.array([0.0, 0.5, 0.8, 0.9, 1.0])
    ct = compute_eqm_ct(t, threshold=0.8, multiplier=4.0)
    np.testing.assert_allclose(ct, jnp.array([4.0, 4.0, 4.0, 2.0, 0.0]), atol=1e-5)


def test_dispersive_loss_orders(key):
    spread = 10.0 * jax.random.normal(key, (16, 4))
    clumped = 0.01 * jax.random.normal(key, (16, 4))
    assert float(dispersive_loss(spread)) < float(dispersive_loss(clumped))


# ---------------------------------------------------------------- EqM


def test_eqm_loss_and_gradients(mlp_field, gauss_data, key):
    field, params = mlp_field
    eqm = EquilibriumMatchingLoss(model=field)
    loss, grads = jax.value_and_grad(lambda p: eqm(p, gauss_data(key), key))(params)
    assert jnp.isfinite(loss)
    assert float(optax.global_norm(grads)) > 0


def test_eqm_optimal_model_low_loss(key):
    """A model predicting exactly the target -u_t·c(t) has ~zero loss.

    With identity coupling, x0 drawn inside the loss: use independent coupling
    and energy_type none; build the target from the loss internals via a model
    that receives xt and must output -(x1-x0)c(t) — not reproducible without
    the internals, so instead check loss decreases under training.
    """
    import flax.linen as nn
    from torchebm_tpu.samplers.flow import WrappedField

    class Field(nn.Module):
        @nn.compact
        def __call__(self, x, t):
            h = nn.tanh(nn.Dense(64)(x))
            return nn.Dense(x.shape[-1])(h)

    f = Field()
    params = f.init(key, jnp.zeros((1, 2)), jnp.zeros((1,)))
    wf = WrappedField(fn=f.apply, params=params)
    eqm = EquilibriumMatchingLoss(model=wf)
    data = jnp.array([[2.0, 2.0]]) + 0.1 * jax.random.normal(key, (128, 2))

    opt = optax.adam(3e-3)
    s = opt.init(params)

    @jax.jit
    def step(p, s, k):
        l, g = jax.value_and_grad(lambda pp: eqm(pp, data, k))(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, l

    losses = []
    p = params
    for i in range(100):
        p, s, l = step(p, s, jax.random.fold_in(key, i))
        losses.append(float(l))
    assert np.mean(losses[-10:]) < 0.5 * np.mean(losses[:10])


@pytest.mark.parametrize("energy_type", ["dot", "l2", "mean"])
def test_eqm_explicit_energy_types(mlp_field, key, energy_type):
    field, params = mlp_field
    eqm = EquilibriumMatchingLoss(model=field, energy_type=energy_type)
    terms = eqm.training_losses(params, jax.random.normal(key, (16, 2)), key)
    assert "energy" in terms
    assert terms["energy"].shape == (16,)
    assert jnp.all(jnp.isfinite(terms["loss"]))


@pytest.mark.parametrize("prediction,weight", [("noise", None), ("score", "velocity"), ("noise", "likelihood")])
def test_eqm_prediction_types(mlp_field, key, prediction, weight):
    field, params = mlp_field
    eqm = EquilibriumMatchingLoss(
        model=field, prediction=prediction, loss_weight=weight, train_eps=0.01
    )
    loss = eqm(params, jax.random.normal(key, (16, 2)), key)
    assert jnp.isfinite(loss)


def test_eqm_coupling_weights_used(mlp_field, key):
    field, params = mlp_field
    eqm = EquilibriumMatchingLoss(model=field, coupling="unbalanced_sinkhorn")
    loss = eqm(params, jax.random.normal(key, (32, 2)), key)
    assert jnp.isfinite(loss)


def test_eqm_validation(mlp_field):
    field, _ = mlp_field
    with pytest.raises(ValueError):
        EquilibriumMatchingLoss(model=field, prediction="speed")
    with pytest.raises(ValueError):
        EquilibriumMatchingLoss(model=field, energy_type="cubic")
    with pytest.raises(ValueError):
        EquilibriumMatchingLoss(model=field, loss_weight="quadratic")


def test_eqm_x0_shape_check(mlp_field, key):
    field, params = mlp_field
    eqm = EquilibriumMatchingLoss(model=field)
    with pytest.raises(ValueError, match="x0 shape"):
        eqm(params, jnp.zeros((8, 2)), key, x0=jnp.zeros((4, 2)))


# ---------------------------------------------------------------- EM


def test_em_warmup_phase_no_negatives(mlp_energy, gauss_data, key):
    energy, params = mlp_energy
    em = EnergyMatchingLoss(model=energy, lambda_cd=0.0, coupling="sinkhorn")
    terms = em.training_losses(params, gauss_data(key), key)
    assert "negatives" not in terms
    assert float(terms["cd_loss"]) == 0.0
    g = jax.grad(lambda p: em(p, gauss_data(key), key))(params)
    assert float(optax.global_norm(g)) > 0


def test_em_joint_phase_produces_negatives(mlp_energy, gauss_data, key):
    energy, params = mlp_energy
    em = EnergyMatchingLoss(
        model=energy, lambda_cd=2.0, coupling="sinkhorn", n_langevin_steps=10
    )
    terms = em.training_losses(params, gauss_data(key, 64), key)
    assert terms["negatives"].shape == (64, 2)
    assert jnp.isfinite(terms["cd_value"])
    assert float(terms["cd_loss"]) >= -em.cd_clamp - 1e-6


def test_em_cd_clamp(mlp_energy, key):
    energy, params = mlp_energy
    em = EnergyMatchingLoss(
        model=energy, lambda_cd=100.0, cd_clamp=0.02, coupling="independent",
        n_langevin_steps=5,
    )
    terms = em.training_losses(params, jax.random.normal(key, (32, 2)), key)
    assert float(terms["cd_loss"]) >= -0.02 - 1e-6


def test_em_noise_fraction_extremes(mlp_energy, key):
    energy, params = mlp_energy
    for nf in (0.0, 1.0):
        em = EnergyMatchingLoss(
            model=energy, lambda_cd=1.0, noise_fraction=nf,
            coupling="independent", n_langevin_steps=5,
        )
        terms = em.training_losses(params, jax.random.normal(key, (16, 2)), key)
        assert terms["negatives"].shape == (16, 2)


def test_em_warmup_trains_potential(mlp_energy, key):
    """Phase-1 EM: -∇V should approximate the OT displacement field."""
    energy, params = mlp_energy
    data = jnp.array([[3.0, 0.0]]) + 0.1 * jax.random.normal(key, (128, 2))
    em = EnergyMatchingLoss(model=energy, lambda_cd=0.0, coupling="sinkhorn", sigma=0.05)
    opt = optax.adam(3e-3)
    s = opt.init(params)

    @jax.jit
    def step(p, s, k):
        l, g = jax.value_and_grad(lambda pp: em(pp, data, k))(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, l

    p = params
    losses = []
    for i in range(80):
        p, s, l = step(p, s, jax.random.fold_in(key, i))
        losses.append(float(l))
    assert np.mean(losses[-10:]) < np.mean(losses[:10])
    # trained potential decreases toward the data: V(data) < V(noise region)
    e = energy.replace(params=p)
    assert float(jnp.mean(e(data))) < float(jnp.mean(e(jnp.zeros((16, 2)))))


def test_em_validation(mlp_energy):
    energy, _ = mlp_energy
    with pytest.raises(ValueError):
        EnergyMatchingLoss(model=energy, noise_fraction=1.5)
    with pytest.raises(ValueError):
        EnergyMatchingLoss(model=energy, cd_trim_fraction=1.0)
    with pytest.raises(ValueError):
        EnergyMatchingLoss(model=energy, cd_clamp=-1.0)
    with pytest.raises(ValueError):
        EnergyMatchingLoss(model=energy, langevin_dt=0.0)

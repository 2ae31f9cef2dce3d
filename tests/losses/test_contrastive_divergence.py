"""CD / PCD loss tests: training behavior, buffer mechanics, guards."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from torchebm_tpu.core import GaussianEnergy
from torchebm_tpu.losses import (
    ContrastiveDivergence,
    ParallelTemperingCD,
    PersistentContrastiveDivergence,
    ReplayBuffer,
)
from torchebm_tpu.samplers import LangevinDynamics


def make_cd(energy, **kw):
    sampler = LangevinDynamics(energy, step_size=0.01)
    return ContrastiveDivergence(model=energy, sampler=sampler, **kw)


def test_cd_returns_loss_and_negatives(mlp_energy, key):
    energy, params = mlp_energy
    cd = make_cd(energy, k_steps=5)
    x = jax.random.normal(key, (32, 2))
    loss, (neg, buf) = cd(params, x, key)
    assert loss.shape == ()
    assert neg.shape == x.shape
    assert buf is None


def test_cd_gradient_flows_and_training_reduces_energy_at_data(mlp_energy, gauss_data, key):
    energy, params = mlp_energy
    cd = make_cd(energy, k_steps=15)
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, x, k):
        (loss, _), grads = jax.value_and_grad(lambda pp: cd(pp, x, k), has_aux=True)(p)
        upd, s = opt.update(grads, s)
        return optax.apply_updates(p, upd), s, loss

    p = params
    for i in range(60):
        k = jax.random.fold_in(key, i)
        p, opt_state, loss = step(p, opt_state, gauss_data(k), jax.random.fold_in(k, 1))

    e = energy.replace(params=p)
    e_data = float(jnp.mean(e(gauss_data(key))))
    e_far = float(jnp.mean(e(8.0 * jnp.ones((16, 2)))))
    assert e_data < e_far


def test_pcd_buffer_lifecycle(mlp_energy, key):
    energy, params = mlp_energy
    pcd = make_cd(energy, k_steps=3, persistent=True, buffer_size=256, init_steps=5)
    buf = pcd.init_buffer(key, (2,))
    assert isinstance(buf, ReplayBuffer)
    assert buf.samples.shape == (256, 2)
    assert int(buf.ptr) == 0

    x = jax.random.normal(key, (64, 2))
    loss, (neg, buf2) = pcd(params, x, key, buf)
    assert int(buf2.ptr) == 64
    # the negatives were written into the ring
    np.testing.assert_array_equal(buf2.samples[:64], neg)
    # second call wraps the pointer forward
    _, (_, buf3) = pcd(params, x, key, buf2)
    assert int(buf3.ptr) == 128


def test_pcd_ring_wraparound(mlp_energy, key):
    energy, params = mlp_energy
    pcd = make_cd(energy, k_steps=1, persistent=True, buffer_size=100, init_steps=0)
    buf = pcd.init_buffer(key, (2,))
    buf = buf.replace(ptr=jnp.int32(90))
    x = jax.random.normal(key, (64, 2))
    _, (neg, buf2) = pcd(params, x, key, buf)
    assert int(buf2.ptr) == (90 + 64) % 100
    np.testing.assert_array_equal(buf2.samples[90:], neg[:10])
    np.testing.assert_array_equal(buf2.samples[:54], neg[10:])


def test_pcd_requires_buffer(mlp_energy, key):
    energy, params = mlp_energy
    pcd = make_cd(energy, persistent=True)
    with pytest.raises(ValueError, match="ReplayBuffer"):
        pcd(params, jax.random.normal(key, (8, 2)), key, None)


def test_negatives_are_stop_gradient(mlp_energy, key):
    """CD gradient only flows through the energy terms, not the sampler chain."""
    energy, params = mlp_energy
    cd = make_cd(energy, k_steps=3, energy_reg_weight=0.0)
    x = jax.random.normal(key, (16, 2))

    def f(p):
        loss, (neg, _) = cd(p, x, key)
        return loss

    g = jax.grad(f)(params)
    assert float(optax.global_norm(g)) > 0  # flows through energies


def test_nan_guard(key):
    from torchebm_tpu.core import as_energy

    e = as_energy(lambda x: jnp.full((x.shape[0],), jnp.nan))
    cd = ContrastiveDivergence(
        model=e, sampler=LangevinDynamics(e, step_size=0.01), k_steps=1,
        energy_reg_weight=0.0,
    )
    loss, _ = cd(None, jax.random.normal(key, (8, 2)), key)
    np.testing.assert_allclose(float(loss), 0.1)


def test_energy_regularization_increases_loss(mlp_energy, key):
    energy, params = mlp_energy
    x = jax.random.normal(key, (32, 2)) + 10.0  # big energies
    plain = make_cd(energy, k_steps=1, energy_reg_weight=0.0)
    reg = make_cd(energy, k_steps=1, energy_reg_weight=1.0)
    l0, _ = plain(params, x, key)
    l1, _ = reg(params, x, key)
    assert float(l1) > float(l0)


def test_add_noise_to_real(mlp_energy, key):
    energy, params = mlp_energy
    cd_noise = make_cd(energy, k_steps=1, add_noise_to_real=True, noise_scale=0.5)
    cd_plain = make_cd(energy, k_steps=1)
    x = jax.random.normal(key, (16, 2))
    l1, _ = cd_noise(params, x, key)
    l0, _ = cd_plain(params, x, key)
    assert float(jnp.abs(l1 - l0)) > 1e-6


def test_pcd_factory():
    assert PersistentContrastiveDivergence(
        model=GaussianEnergy.standard(2),
        sampler=LangevinDynamics(GaussianEnergy.standard(2)),
    ).persistent


# ---------------------------------------------------------------------------
# ParallelTemperingCD (full implementation; reference ships only a stub,
# torchebm/losses/contrastive_divergence.py:246-263)
# ---------------------------------------------------------------------------


def make_ptcd(energy, **kw):
    from torchebm_tpu.samplers import ParallelTemperingLangevin

    sampler = ParallelTemperingLangevin(
        energy, temperatures=(1.0, 2.0, 4.0), step_size=0.01, swap_every=2
    )
    return ParallelTemperingCD(model=energy, sampler=sampler, **kw)


def test_ptcd_rejects_plain_sampler(mlp_energy):
    energy, _ = mlp_energy
    with pytest.raises(TypeError, match="ParallelTemperingLangevin"):
        ParallelTemperingCD(model=energy, sampler=LangevinDynamics(energy))


def test_ptcd_returns_cold_negatives(mlp_energy, key):
    energy, params = mlp_energy
    ptcd = make_ptcd(energy, k_steps=5)
    x = jax.random.normal(key, (32, 2))
    loss, (neg, buf) = ptcd(params, x, key)
    assert loss.shape == ()
    assert neg.shape == x.shape
    assert buf is None
    assert bool(jnp.all(jnp.isfinite(loss)))


def test_ptcd_persistent_ladder_buffer(mlp_energy, key):
    energy, params = mlp_energy
    ptcd = make_ptcd(
        energy, k_steps=3, persistent=True, buffer_size=64, init_steps=4
    )
    buf = ptcd.init_buffer(key, (2,), params=params)
    assert buf.samples.shape == (64, 3, 2)  # (buffer, n_replicas, dim)

    x = jax.random.normal(key, (16, 2))
    loss, (neg, buf2) = ptcd(params, x, key, buf)
    assert neg.shape == (16, 2)
    assert buf2.samples.shape == buf.samples.shape
    assert int(buf2.ptr) == 16
    # pushed slots hold the new ladders, replica axis intact
    assert not bool(jnp.all(buf2.samples[:16] == buf.samples[:16]))

    with pytest.raises(ValueError, match="ReplayBuffer"):
        ptcd(params, x, key, None)


def test_ptcd_gradient_trains(mlp_energy, gauss_data, key):
    energy, params = mlp_energy
    ptcd = make_ptcd(energy, k_steps=10)
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, x, k):
        (loss, _), grads = jax.value_and_grad(lambda pp: ptcd(pp, x, k), has_aux=True)(p)
        upd, s = opt.update(grads, s)
        return optax.apply_updates(p, upd), s, loss

    p = params
    for i in range(40):
        k = jax.random.fold_in(key, i)
        p, opt_state, _ = step(p, opt_state, gauss_data(k), jax.random.fold_in(k, 1))

    e = energy.replace(params=p)
    e_data = float(jnp.mean(e(gauss_data(key))))
    e_far = float(jnp.mean(e(8.0 * jnp.ones((16, 2)))))
    assert e_data < e_far


def test_cd_jits_and_buffer_donation(mlp_energy, key):
    energy, params = mlp_energy
    pcd = make_cd(energy, k_steps=2, persistent=True, buffer_size=128, init_steps=0)
    buf = pcd.init_buffer(key, (2,))
    f = jax.jit(lambda p, x, k, b: pcd(p, x, k, b), donate_argnums=(3,))
    x = jax.random.normal(key, (32, 2))
    loss, (_, buf2) = f(params, x, key, buf)
    assert jnp.isfinite(loss)
    assert int(buf2.ptr) == 32

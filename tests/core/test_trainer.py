"""Trainer tests: state stepping, batch forms, accumulation, CD trainer, callbacks."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from torchebm_tpu.core import GaussianEnergy, WrappedEnergy
from torchebm_tpu.core.trainer import (
    BaseTrainer,
    ContrastiveDivergenceTrainer,
    TrainState,
    _split_batch,
)
from torchebm_tpu.losses import ContrastiveDivergence, DenoisingScoreMatching
from torchebm_tpu.samplers import LangevinDynamics


@pytest.fixture
def mlp(key):
    import flax.linen as nn

    class E(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(1)(nn.tanh(nn.Dense(32)(x))).squeeze(-1)

    m = E()
    params = m.init(key, jnp.zeros((1, 2)))
    return WrappedEnergy(fn=m.apply, params=params), params


def test_split_batch_forms(key):
    x = jnp.ones((4, 2))
    assert _split_batch(x)[1] == {}
    d, mk = _split_batch((x, {"y": jnp.zeros(4)}))
    assert "y" in mk
    d, mk = _split_batch({"data": x, "y": jnp.zeros(4)})
    assert "y" in mk
    with pytest.raises(ValueError):
        _split_batch({"images": x})
    with pytest.raises(ValueError):
        _split_batch((x, x, x))


def test_base_trainer_reduces_loss(mlp, key):
    energy, params = mlp
    dsm = DenoisingScoreMatching(model=energy, noise_scale=0.3)
    trainer = BaseTrainer(dsm, optax.adam(1e-2))
    state = trainer.init_state(params, key)
    data = jax.random.normal(key, (512, 2)) + jnp.array([1.0, -1.0])

    losses = []
    for i in range(30):
        batch = data[jax.random.randint(jax.random.fold_in(key, i), (64,), 0, 512)]
        state, m = trainer.train_step(state, batch)
        losses.append(float(m["loss"]))
    assert int(state.step) == 30
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_ema_tracking(mlp, key):
    energy, params = mlp
    dsm = DenoisingScoreMatching(model=energy, noise_scale=0.3)
    trainer = BaseTrainer(dsm, optax.adam(1e-2), ema_decay=0.5)
    state = trainer.init_state(params, key)
    for i in range(5):
        state, _ = trainer.train_step(state, jax.random.normal(jax.random.fold_in(key, i), (32, 2)))
    # EMA lags params but has moved from init
    d_ema = optax.global_norm(jax.tree_util.tree_map(lambda a, b: a - b, state.ema_params, params))
    d_par = optax.global_norm(jax.tree_util.tree_map(lambda a, b: a - b, state.params, params))
    assert 0 < float(d_ema) < float(d_par)


def test_grad_accumulation(mlp, key):
    energy, params = mlp
    dsm = DenoisingScoreMatching(model=energy, noise_scale=0.3)
    trainer = BaseTrainer(dsm, optax.sgd(0.1), grad_accum_steps=4)
    state = trainer.init_state(params, key)
    # copy: train_step donates the state's buffers
    p0 = jax.tree_util.tree_map(jnp.array, state.params)
    # first 3 steps accumulate without applying
    for i in range(3):
        state, _ = trainer.train_step(state, jnp.ones((8, 2)))
        same = jax.tree_util.tree_all(
            jax.tree_util.tree_map(lambda a, b: bool(jnp.all(a == b)), state.params, p0)
        )
        assert same
    state, _ = trainer.train_step(state, jnp.ones((8, 2)))
    changed = jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: bool(jnp.all(a == b)), state.params, p0)
    )
    assert not changed


def test_cd_trainer_with_pcd(mlp, key):
    energy, params = mlp
    cd = ContrastiveDivergence(
        model=energy,
        sampler=LangevinDynamics(energy, step_size=0.01),
        k_steps=5,
        persistent=True,
        buffer_size=128,
        init_steps=0,
    )
    trainer = ContrastiveDivergenceTrainer(cd, learning_rate=1e-3)
    with pytest.raises(ValueError, match="ReplayBuffer"):
        trainer.init_state(params, key)
    buf = cd.init_buffer(key, (2,))
    state = trainer.init_state(params, key, loss_state=buf)
    state, metrics = trainer.train_step(state, jax.random.normal(key, (32, 2)))
    assert set(metrics) == {"loss", "pos_energy", "neg_energy"}
    assert int(state.loss_state.ptr) == 32


def test_epoch_loop_and_callbacks(mlp, key):
    energy, params = mlp
    dsm = DenoisingScoreMatching(model=energy, noise_scale=0.3)

    events = []

    class Recorder:
        def on_train_start(self, trainer, state):
            events.append("train_start")

        def on_epoch_start(self, trainer, state):
            events.append("epoch_start")

        def on_batch_end(self, trainer, state, metrics):
            events.append("batch_end")

        def on_epoch_end(self, trainer, state, metrics):
            events.append(("epoch_end", metrics["loss"]))

        def on_train_end(self, trainer, state, history):
            events.append("train_end")

    trainer = BaseTrainer(dsm, optax.adam(1e-3), callbacks=[Recorder()])
    state = trainer.init_state(params, key)
    data = jax.random.normal(key, (64, 2))
    state, history = trainer.train(
        state, epochs=2, batch_iter_fn=lambda e: [data[:32], data[32:]]
    )
    assert events[0] == "train_start" and events[-1] == "train_end"
    assert events.count("epoch_start") == 2
    assert events.count("batch_end") == 4
    assert len(history) == 2 and "loss" in history[0]


def test_validation():
    with pytest.raises(ValueError):
        BaseTrainer(lambda *a, **k: 0.0, optax.sgd(0.1), grad_accum_steps=0)

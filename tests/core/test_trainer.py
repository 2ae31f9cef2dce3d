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


def test_scanned_epoch_matches_loop_exactly(mlp, key):
    """train_epoch_scanned = train_epoch on the same batches, bit-for-bit:
    same key sequence, same params, same mean metrics — one dispatch."""
    energy, params = mlp
    dsm = DenoisingScoreMatching(model=energy, noise_scale=0.2)
    data = jax.random.normal(key, (8, 16, 2))  # 8 steps x batch 16

    t1 = BaseTrainer(dsm, optax.adam(1e-2), ema_decay=0.99, stateful_loss=False)
    s1 = t1.init_state(params, key)
    for b in data:
        s1, m1 = t1.train_step(s1, b)

    t2 = BaseTrainer(dsm, optax.adam(1e-2), ema_decay=0.99, stateful_loss=False)
    s2 = t2.init_state(params, key)
    s2, m2 = t2.train_epoch_scanned(s2, data)

    assert int(s2.step) == int(s1.step) == 8
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        ),
        s1.params, s2.params,
    )
    np.testing.assert_array_equal(np.asarray(s1.key), np.asarray(s2.key))
    assert np.isfinite(m2["loss"])


def test_scanned_epoch_threads_pcd_buffer_and_conditioning(mlp, key):
    """Stateful loss (PCD replay buffer) + dict batches with conditioning
    survive the scan: buffer advances, loss finite."""
    import flax.linen as nn

    class CondE(nn.Module):
        @nn.compact
        def __call__(self, x, y):
            h = nn.Dense(16)(x) + nn.Embed(4, 16)(y)
            return nn.Dense(1)(nn.tanh(h)).squeeze(-1)

    m = CondE()
    params = m.init(key, jnp.zeros((1, 2)), jnp.zeros((1,), jnp.int32))
    energy = WrappedEnergy(fn=m.apply, params=params)
    cd = ContrastiveDivergence(
        model=energy, sampler=LangevinDynamics(energy, step_size=0.05),
        k_steps=3, persistent=True, buffer_size=64, init_steps=0,
    )
    trainer = ContrastiveDivergenceTrainer(cd, learning_rate=1e-3)
    state = trainer.init_state(params, key, loss_state=cd.init_buffer(key, (2,)))
    buf_before = np.asarray(state.loss_state.samples).copy()

    batches = {
        "data": jax.random.normal(key, (5, 16, 2)),
        "y": jnp.zeros((5, 16), jnp.int32),
    }
    state, metrics = trainer.train_epoch_scanned(state, batches)
    assert int(state.step) == 5
    assert np.isfinite(metrics["loss"])
    assert float(jnp.max(jnp.abs(state.loss_state.samples - buf_before))) > 0


def test_validation():
    with pytest.raises(ValueError):
        BaseTrainer(lambda *a, **k: 0.0, optax.sgd(0.1), grad_accum_steps=0)


# ---------------------------------------------------------------------------
# checkpoint / resume (reference base_trainer.py:312-350)
# ---------------------------------------------------------------------------


def _tree_equal(a, b):
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    return len(leaves_a) == len(leaves_b) and all(
        bool(jnp.all(jnp.asarray(x) == jnp.asarray(y)))
        for x, y in zip(leaves_a, leaves_b)
    )


def _make_pcd_trainer(mlp, key):
    energy, params = mlp
    cd = ContrastiveDivergence(
        model=energy,
        sampler=LangevinDynamics(energy, step_size=0.01),
        k_steps=3,
        persistent=True,
        buffer_size=64,
        init_steps=0,
    )
    trainer = ContrastiveDivergenceTrainer(cd, learning_rate=1e-3, ema_decay=0.9)
    buf = cd.init_buffer(key, (2,))
    state = trainer.init_state(params, key, loss_state=buf)
    return trainer, state, params


def test_checkpoint_roundtrip_bitwise(mlp, key, tmp_path):
    """Train 5 steps -> save -> restore: every leaf (params, optimizer, EMA,
    step, PRNG key, PCD replay buffer) comes back bitwise identical."""
    trainer, state, params = _make_pcd_trainer(mlp, key)
    batches = [jax.random.normal(jax.random.fold_in(key, 100 + i), (16, 2)) for i in range(5)]
    for b in batches:
        state, _ = trainer.train_step(state, b)

    # snapshot before save: train_step donates, so keep an undonated copy
    snap = jax.tree_util.tree_map(jnp.array, state)
    trainer.save(state, str(tmp_path))

    template = trainer.init_state(params, key, loss_state=snap.loss_state)
    restored = trainer.restore(str(tmp_path), template)

    assert int(restored.step) == 5
    assert _tree_equal(restored.params, snap.params)
    assert _tree_equal(restored.opt_state, snap.opt_state)
    assert _tree_equal(restored.ema_params, snap.ema_params)
    assert bool(jnp.all(restored.key == snap.key))
    assert bool(jnp.all(restored.loss_state.samples == snap.loss_state.samples))
    assert int(restored.loss_state.ptr) == int(snap.loss_state.ptr)
    # restored state still steps and is a real TrainState pytree
    restored2, m = trainer.train_step(restored, batches[0])
    assert int(restored2.step) == 6 and jnp.isfinite(m["loss"])


def test_resume_training_parity(mlp, key, tmp_path):
    """5 steps -> checkpoint -> 3 more must equal 8 uninterrupted steps bitwise
    (the PRNG key rides in the state, so the stream continues exactly)."""
    batches = [jax.random.normal(jax.random.fold_in(key, 200 + i), (16, 2)) for i in range(8)]

    trainer_a, state_a, _ = _make_pcd_trainer(mlp, key)
    for b in batches:
        state_a, _ = trainer_a.train_step(state_a, b)

    trainer_b, state_b, params = _make_pcd_trainer(mlp, key)
    for b in batches[:5]:
        state_b, _ = trainer_b.train_step(state_b, b)
    trainer_b.save(state_b, str(tmp_path))

    template = trainer_b.init_state(
        params, key, loss_state=trainer_b.loss_fn.init_buffer(key, (2,))
    )
    resumed = trainer_b.restore(str(tmp_path), template)
    for b in batches[5:]:
        resumed, _ = trainer_b.train_step(resumed, b)

    assert int(resumed.step) == int(state_a.step) == 8
    assert _tree_equal(resumed.params, state_a.params)
    assert _tree_equal(resumed.ema_params, state_a.ema_params)
    assert bool(jnp.all(resumed.loss_state.samples == state_a.loss_state.samples))


def test_restore_or_init(mlp, key, tmp_path):
    trainer, state, params = _make_pcd_trainer(mlp, key)
    buf = trainer.loss_fn.init_buffer(key, (2,))
    # no checkpoint yet -> fresh state
    fresh = trainer.restore_or_init(str(tmp_path), params, key, loss_state=buf)
    assert int(fresh.step) == 0
    for i in range(2):
        fresh, _ = trainer.train_step(fresh, jnp.ones((8, 2)))
    trainer.save(fresh, str(tmp_path))
    resumed = trainer.restore_or_init(str(tmp_path), params, key, loss_state=buf)
    assert int(resumed.step) == 2


def test_train_loop_writes_checkpoints(mlp, key, tmp_path):
    from torchebm_tpu.utils.training import latest_checkpoint_step

    energy, params = mlp
    dsm = DenoisingScoreMatching(model=energy, noise_scale=0.3)
    trainer = BaseTrainer(dsm, optax.adam(1e-3))
    state = trainer.init_state(params, key)
    data = jax.random.normal(key, (64, 2))
    state, _ = trainer.train(
        state, epochs=2, batch_iter_fn=lambda e: [data[:32], data[32:]],
        ckpt_dir=str(tmp_path),
    )
    assert latest_checkpoint_step(str(tmp_path)) == 4

"""Sharded checkpoint/resume on the virtual 8-device mesh (VERDICT r4 #2).

Preemption-safe mesh resume: an fsdp-sharded :class:`TrainState` must save
and restore WITH its shardings — every restored array lands directly on its
template leaf's ``NamedSharding`` (no host-side detour, no Orbax "sharding
info not provided … unsafe on a different topology" warning) and the params
survive bitwise. Reference scope: checkpoint/resume is a first-class
subsystem (``torchebm/utils/training.py:42-118``, SURVEY §5); on TPU that
must mean sharded.
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from torchebm_tpu.core.trainer import BaseTrainer, TrainState
from torchebm_tpu.models import MLPEnergy
from torchebm_tpu.parallel import fsdp_shard_params, make_mesh, shard_batch
from torchebm_tpu.utils.training import load_checkpoint, save_checkpoint


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


def _loss(net):
    def loss(params, x, key, model_kwargs=None):
        return jnp.mean(jnp.square(net.apply(params, x)))

    return loss


def _shard_state(state: TrainState, mesh) -> TrainState:
    return TrainState(
        params=fsdp_shard_params(state.params, mesh),
        opt_state=fsdp_shard_params(state.opt_state, mesh),
        step=state.step,
        key=state.key,
        ema_params=fsdp_shard_params(state.ema_params, mesh)
        if state.ema_params is not None
        else None,
        loss_state=state.loss_state,
    )


def _assert_no_sharding_warning(record):
    bad = [w for w in record if "Sharding info not provided" in str(w.message)]
    assert not bad, f"sharding-blind restore: {bad[0].message}"


def test_fsdp_sharded_trainstate_resume(key, tmp_path):
    """Save an fsdp-sharded TrainState on the 8-device mesh, restore it
    in-process with shardings intact + bitwise params, and step from it."""
    mesh = make_mesh(("data", "fsdp"), (2, 4))
    net = MLPEnergy(hidden_dims=(256, 256))
    params = net.init(key, jnp.zeros((1, 8)))
    trainer = BaseTrainer(
        _loss(net), optax.adam(1e-3), ema_decay=0.999, stateful_loss=False
    )
    state = _shard_state(trainer.init_state(params, key), mesh)

    # the 256x256 kernels must actually carry the fsdp axis
    specs = [
        str(leaf.sharding.spec) for leaf in jax.tree_util.tree_leaves(state.params)
    ]
    assert any("fsdp" in s for s in specs), specs

    x = shard_batch(jax.random.normal(jax.random.fold_in(key, 1), (16, 8)), mesh)
    state, _ = trainer.train_step(state, x)

    template = _shard_state(trainer.init_state(params, key), mesh)
    with warnings.catch_warnings(record=True) as record:
        warnings.simplefilter("always")
        trainer.save(state, str(tmp_path))
        restored = trainer.restore(str(tmp_path), template)
    _assert_no_sharding_warning(record)

    # shardings survived: every restored leaf sits on its template sharding
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(restored.params)[0],
        jax.tree_util.tree_flatten_with_path(state.params)[0],
    ):
        assert a.sharding.is_equivalent_to(b.sharding, a.ndim), (
            pa, a.sharding, b.sharding,
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.ema_params),
        jax.tree_util.tree_leaves(state.ema_params),
    ):
        assert a.sharding.is_equivalent_to(b.sharding, a.ndim)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step) == 1

    # and the restored state steps (the actual preemption-resume contract)
    restored2, metrics = trainer.train_step(
        restored, shard_batch(jax.random.normal(jax.random.fold_in(key, 2), (16, 8)), mesh)
    )
    assert bool(jnp.isfinite(metrics["loss"]))
    assert int(restored2.step) == 2


def test_restore_or_init_preserves_shardings(key, tmp_path):
    """restore_or_init — the standard preemption-safe entry point — resumes a
    sharded run when a checkpoint exists. The template it builds internally is
    unsharded, so we pin the documented pattern: restore() with a sharded
    template."""
    mesh = make_mesh(("data", "fsdp"), (2, 4))
    net = MLPEnergy(hidden_dims=(256,))
    params = net.init(key, jnp.zeros((1, 4)))
    trainer = BaseTrainer(_loss(net), optax.adam(1e-3), stateful_loss=False)
    state = _shard_state(trainer.init_state(params, key), mesh)
    trainer.save(state, str(tmp_path))

    template = _shard_state(trainer.init_state(params, key), mesh)
    with warnings.catch_warnings(record=True) as record:
        warnings.simplefilter("always")
        restored = trainer.restore(str(tmp_path), template)
    _assert_no_sharding_warning(record)
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.params),
        jax.tree_util.tree_leaves(state.params),
    ):
        assert a.sharding.is_equivalent_to(b.sharding, a.ndim)


def test_util_checkpoint_sharded_payload(key, tmp_path):
    """The bare save/load_checkpoint utils carry shardings through the
    template path too (batch-sharded extra state, e.g. a replay buffer)."""
    mesh = make_mesh(("data", "fsdp"), (2, 4))
    w = jax.device_put(
        jax.random.normal(key, (256, 256)),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(None, "fsdp")),
    )
    buf = shard_batch(jax.random.normal(jax.random.fold_in(key, 1), (32, 4)), mesh)
    save_checkpoint(str(tmp_path), 5, {"w": w}, extra={"buf": buf})

    template = {
        "step": 0,
        "params": {"w": jnp.zeros_like(w, device=w.sharding)},
        "extra": {"buf": jnp.zeros_like(buf, device=buf.sharding)},
    }
    with warnings.catch_warnings(record=True) as record:
        warnings.simplefilter("always")
        ck = load_checkpoint(str(tmp_path), template=template)
    _assert_no_sharding_warning(record)
    assert ck["params"]["w"].sharding.is_equivalent_to(w.sharding, w.ndim)
    assert ck["extra"]["buf"].sharding.is_equivalent_to(buf.sharding, buf.ndim)
    np.testing.assert_array_equal(np.asarray(ck["params"]["w"]), np.asarray(w))


def test_templateless_load_has_no_sharding_warning(key, tmp_path):
    """The convenience (template-less) load restores host-side + re-devices —
    no topology assumption, no Orbax sharding warning."""
    save_checkpoint(str(tmp_path), 1, {"w": jax.random.normal(key, (8, 8))})
    with warnings.catch_warnings(record=True) as record:
        warnings.simplefilter("always")
        ck = load_checkpoint(str(tmp_path))
    _assert_no_sharding_warning(record)
    assert ck["params"]["w"].shape == (8, 8)

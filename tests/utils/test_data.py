"""Input-pipeline utilities: stack_batches + prefetch_to_device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchebm_tpu.utils import prefetch_to_device, stack_batches


def test_stack_batches_arrays(key):
    bs = [jax.random.normal(jax.random.fold_in(key, i), (4, 2)) for i in range(3)]
    out = stack_batches(bs)
    assert out.shape == (3, 4, 2)
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(bs[1]))


def test_stack_batches_dict_form(key):
    bs = [
        {"data": jnp.ones((4, 2)) * i, "y": jnp.full((4,), i, jnp.int32)}
        for i in range(5)
    ]
    out = stack_batches(bs)
    assert out["data"].shape == (5, 4, 2)
    assert out["y"].dtype == jnp.int32 and out["y"].shape == (5, 4)


def test_stack_batches_feeds_scanned_epoch(key):
    """The advertised pipeline: stack_batches -> train_epoch_scanned."""
    import optax

    from torchebm_tpu.core import WrappedEnergy
    from torchebm_tpu.core.trainer import BaseTrainer
    from torchebm_tpu.losses import DenoisingScoreMatching
    from torchebm_tpu.models import MLPEnergy

    net = MLPEnergy(hidden_dims=(16,))
    params = net.init(key, jnp.zeros((1, 2)))
    dsm = DenoisingScoreMatching(
        model=WrappedEnergy(fn=net.apply, params=params), noise_scale=0.2
    )
    tr = BaseTrainer(dsm, optax.adam(1e-2), stateful_loss=False)
    st = tr.init_state(params, key)
    batches = [jax.random.normal(jax.random.fold_in(key, i), (8, 2)) for i in range(4)]
    st, m = tr.train_epoch_scanned(st, stack_batches(batches))
    assert int(st.step) == 4 and np.isfinite(m["loss"])


def test_stack_batches_validation():
    with pytest.raises(ValueError, match="at least one"):
        stack_batches([])
    with pytest.raises(ValueError, match="structure"):
        stack_batches([jnp.ones((2,)), {"data": jnp.ones((2,))}])


def test_prefetch_preserves_order_and_values(key):
    bs = [jax.random.normal(jax.random.fold_in(key, i), (4, 2)) for i in range(7)]
    out = list(prefetch_to_device(iter(bs), size=3))
    assert len(out) == 7
    for a, b in zip(bs, out):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert isinstance(b, jax.Array)


def test_prefetch_pytree_batches(key):
    bs = [{"data": jnp.ones((2, 2)) * i, "y": jnp.zeros((2,), jnp.int32)} for i in range(4)]
    out = list(prefetch_to_device(bs, size=2))
    assert len(out) == 4 and float(out[3]["data"][0, 0]) == 3.0


def test_prefetch_with_sharding(key):
    from torchebm_tpu.parallel import batch_sharding, make_mesh

    mesh = make_mesh(("data",))
    bs = [jax.random.normal(jax.random.fold_in(key, i), (16, 2)) for i in range(3)]
    out = list(prefetch_to_device(bs, size=2, sharding=batch_sharding(mesh, 2)))
    assert len(out) == 3
    assert "data" in str(out[0].sharding.spec)


def test_prefetch_validation():
    with pytest.raises(ValueError, match="size"):
        list(prefetch_to_device([jnp.ones(2)], size=0))

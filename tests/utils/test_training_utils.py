"""EMA / freeze mask / checkpoint / profiling utility tests."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchebm_tpu.utils import (
    benchmark_fn,
    freeze_mask,
    latest_checkpoint_step,
    load_checkpoint,
    profile_context,
    save_checkpoint,
    update_ema,
)


def test_update_ema():
    ema = {"w": jnp.zeros(3), "b": jnp.zeros(())}
    params = {"w": jnp.ones(3), "b": jnp.ones(())}
    out = update_ema(ema, params, decay=0.9)
    np.testing.assert_allclose(out["w"], 0.1 * jnp.ones(3), rtol=1e-6)
    # repeated blending converges to params
    for _ in range(200):
        ema = update_ema(ema, params, decay=0.9)
    np.testing.assert_allclose(ema["w"], params["w"], atol=1e-5)


def test_freeze_mask():
    params = {"encoder": {"w": jnp.ones(2)}, "head": {"w": jnp.ones(2)}}
    mask = freeze_mask(params, lambda path, leaf: path[0] != "encoder")
    assert mask["encoder"]["w"] is False
    assert mask["head"]["w"] is True


def test_checkpoint_roundtrip(key):
    params = {"w": jax.random.normal(key, (4, 4)), "b": jnp.arange(4.0)}
    ema = jax.tree_util.tree_map(lambda x: x * 0.5, params)
    with tempfile.TemporaryDirectory() as d:
        save_checkpoint(d, 10, params, ema_params=ema, extra={"note": jnp.int32(7)})
        save_checkpoint(d, 20, params)
        assert latest_checkpoint_step(d) == 20
        ck = load_checkpoint(d, step=10)
        np.testing.assert_allclose(ck["params"]["w"], params["w"])
        np.testing.assert_allclose(ck["ema_params"]["b"], ema["b"])
        assert int(ck["extra"]["note"]) == 7
        assert ck["step"] == 10
        latest = load_checkpoint(d)
        assert latest["step"] == 20
    with pytest.raises(FileNotFoundError):
        load_checkpoint("/tmp/definitely_missing_ckpts_xyz")


def test_benchmark_fn():
    f = jax.jit(lambda: jnp.sum(jnp.ones((64, 64)) ** 2))
    stats = benchmark_fn(f, warmup=1, iters=3)
    assert stats["median_s"] > 0
    assert stats["min_s"] <= stats["median_s"] <= stats["mean_s"] * 3


def test_profile_context(tmp_path):
    with profile_context(str(tmp_path / "prof")) as log_dir:
        jax.block_until_ready(jnp.ones(8) * 2)
    # a trace directory was produced
    assert os.path.isdir(log_dir)
    assert any(os.scandir(log_dir))

"""RNG-implementation upgrade (`_upgrade_key`) and scan-unroll contracts.

The TPU generic-path speedup (threefry -> hardware `rbg` bits) must be
invisible semantically: off-TPU it is a no-op, explicit impls are respected,
and `unroll` is pure codegen (bitwise-identical chains).
"""

import jax
import jax.numpy as jnp
import pytest

from torchebm_tpu.core import GaussianEnergy
from torchebm_tpu.samplers import LangevinDynamics
from torchebm_tpu.samplers.base import _upgrade_key

ENERGY = GaussianEnergy.standard(2)


def test_auto_is_noop_off_tpu():
    key = jax.random.PRNGKey(0)
    out = _upgrade_key(key, "auto")
    assert jax.default_backend() != "tpu"
    assert out is key


def test_threefry_pin_is_noop():
    key = jax.random.key(0)
    assert _upgrade_key(key, "threefry") is key


def test_explicit_rbg_upgrades_raw_key():
    key = jax.random.PRNGKey(0)
    up = _upgrade_key(key, "rbg")
    assert jnp.issubdtype(up.dtype, jax.dtypes.prng_key)
    assert "rbg" in str(jax.random.key_impl(up))
    # 2-word threefry data duplicated into the 4-word rbg layout
    data = jax.random.key_data(up)
    assert data.shape == (4,)
    assert bool(jnp.all(data[:2] == data[2:]))


def test_explicit_rbg_upgrades_typed_threefry_key():
    up = _upgrade_key(jax.random.key(7), "rbg")
    assert "rbg" in str(jax.random.key_impl(up))


def test_typed_nondefault_key_respected():
    key = jax.random.key(3, impl="rbg")
    assert _upgrade_key(key, "rbg") is key
    assert _upgrade_key(key, "auto") is key


def test_env_override(monkeypatch):
    monkeypatch.setenv("TORCHEBM_RNG_IMPL", "threefry")
    key = jax.random.PRNGKey(0)
    assert _upgrade_key(key, "rbg") is key


def test_sampler_runs_with_rbg_key():
    """End-to-end: the shared scan accepts an rbg-typed key (the TPU path)."""
    sampler = LangevinDynamics(ENERGY, step_size=0.1, fused="off")
    key = _upgrade_key(jax.random.PRNGKey(0), "rbg")
    out = sampler.sample(key, dim=2, n_samples=64, n_steps=50)
    assert out.shape == (64, 2)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_rbg_sampling_statistics():
    """rbg noise is real noise: N(0,I) Langevin moments match the target."""
    sampler = LangevinDynamics(ENERGY, step_size=0.1, fused="off")
    key = _upgrade_key(jax.random.PRNGKey(42), "rbg")
    out = sampler.sample(key, dim=2, n_samples=4096, n_steps=400)
    assert float(jnp.max(jnp.abs(jnp.mean(out, 0)))) < 0.15
    assert float(jnp.max(jnp.abs(jnp.var(out, 0) - 1.0))) < 0.2


@pytest.mark.parametrize("thin", [1, 3])
def test_unroll_is_pure_codegen(thin):
    """unroll>1 must produce the bitwise-identical chain (same per-step keys)."""
    key = jax.random.PRNGKey(5)
    kw = dict(dim=2, n_samples=16, n_steps=10, thin=thin, return_trajectory=True)
    base = LangevinDynamics(ENERGY, step_size=0.05, fused="off").sample(key, **kw)
    unrolled = LangevinDynamics(ENERGY, step_size=0.05, fused="off", unroll=4).sample(key, **kw)
    assert bool(jnp.all(base == unrolled))

"""Model zoo tests: DiT backbone, components, wrappers, nets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchebm_tpu.core import GaussianEnergy, TemperatureScheduler
from torchebm_tpu.models import (
    ConditionalTransformer2D,
    ConvEnergy2D,
    EqMEnergy,
    InteractionModel,
    LabelClassifierFreeGuidance,
    LabelEmbedder,
    MLPEnergy,
    MLPTimestepEmbedder,
    MLPVelocityField,
    build_2d_sincos_pos_embed,
    patchify2d,
    unpatchify2d,
)
from torchebm_tpu.samplers import LangevinDynamics
from torchebm_tpu.samplers.flow import WrappedField


def test_patchify_roundtrip(key):
    x = jax.random.normal(key, (2, 3, 8, 8))
    tokens = patchify2d(x, 2)
    assert tokens.shape == (2, 16, 12)
    np.testing.assert_allclose(unpatchify2d(tokens, 2, out_channels=3), x, rtol=1e-6)
    with pytest.raises(ValueError):
        patchify2d(x, 3)
    with pytest.raises(ValueError):
        unpatchify2d(tokens, 2, out_channels=5)


def test_sincos_pos_embed():
    pe = build_2d_sincos_pos_embed(16, 4)
    assert pe.shape == (16, 16)
    # distinct positions get distinct embeddings
    assert float(jnp.min(jnp.linalg.norm(pe[0] - pe[1:], axis=-1))) > 1e-3
    with pytest.raises(ValueError):
        build_2d_sincos_pos_embed(15, 4)


def test_dit_forward_and_zero_init(key):
    dit = ConditionalTransformer2D(
        in_channels=1, out_channels=2, input_size=16, patch_size=4,
        embed_dim=64, depth=2, num_heads=4, cond_dim=64,
    )
    x = jax.random.normal(key, (3, 1, 16, 16))
    cond = jax.random.normal(jax.random.fold_in(key, 1), (3, 64))
    params = dit.init(key, x, cond)
    out = dit.apply(params, x, cond)
    assert out.shape == (3, 2, 16, 16)
    # adaLN-Zero: the freshly initialized model outputs exactly zero
    np.testing.assert_allclose(out, jnp.zeros_like(out))
    # cond= and t= keyword routes agree
    np.testing.assert_allclose(dit.apply(params, x, t=cond), out)
    with pytest.raises(ValueError, match="conditioning"):
        dit.apply(params, x)


def test_dit_scalar_time_conditioning(key):
    dit = ConditionalTransformer2D(
        in_channels=1, out_channels=1, input_size=8, patch_size=4,
        embed_dim=32, depth=1, num_heads=2, cond_dim=32,
    )
    x = jax.random.normal(key, (2, 1, 8, 8))
    t = jnp.array([0.1, 0.9])
    params = dit.init(key, x, t=t)
    assert dit.apply(params, x, t=t).shape == (2, 1, 8, 8)


def test_dit_bf16_compute(key):
    dit = ConditionalTransformer2D(
        in_channels=1, out_channels=1, input_size=8, patch_size=4,
        embed_dim=32, depth=1, num_heads=2, cond_dim=32, dtype=jnp.bfloat16,
    )
    x = jax.random.normal(key, (2, 1, 8, 8))
    cond = jax.random.normal(key, (2, 32))
    params = dit.init(key, x, cond)
    out = dit.apply(params, x, cond)
    assert out.dtype == jnp.float32  # output promoted back
    # params stay f32
    leaf = jax.tree_util.tree_leaves(params)[0]
    assert leaf.dtype == jnp.float32


def test_timestep_embedder(key):
    emb = MLPTimestepEmbedder(out_dim=16)
    p = emb.init(key, jnp.zeros((4,)))
    out = emb.apply(p, jnp.array([0.0, 0.5, 1.0, 2.0]))
    assert out.shape == (4, 16)
    assert float(jnp.linalg.norm(out[0] - out[3])) > 1e-3


def test_label_embedder_cfg_dropout(key):
    emb = LabelEmbedder(num_classes=10, out_dim=8, dropout_prob=0.5)
    labels = jnp.arange(8, dtype=jnp.int32)
    p = emb.init({"params": key, "label_dropout": key}, labels)
    # force-drop: all rows equal the null embedding
    dropped = emb.apply(p, labels, force_drop_mask=jnp.ones(8, bool))
    assert float(jnp.max(jnp.abs(dropped - dropped[0]))) < 1e-6
    # eval mode (no rng, no mask): labels pass through, rows differ
    clean = emb.apply(p, labels)
    assert float(jnp.min(jnp.linalg.norm(clean[0] - clean[1:], axis=-1))) > 1e-4
    # null id only exists with dropout
    assert emb.null_label_id == 10
    assert LabelEmbedder(num_classes=10, out_dim=8).null_label_id is None


def test_cfg_wrapper_math(key):
    class Base:
        def __call__(self, x, t, y=None):
            return x * (1.0 + y.astype(x.dtype)[:, None, None, None])

    cfg = LabelClassifierFreeGuidance(base=Base(), null_label_id=0, cfg_scale=3.0, guide_channels=1)
    x = jnp.ones((2, 2, 2, 2))
    y = jnp.array([1, 2])
    out = cfg(x, jnp.zeros(2), y=y)
    # guided channel: uncond + scale*(cond-uncond) = 1 + 3*y
    np.testing.assert_allclose(out[:, 0, 0, 0], 1 + 3 * y.astype(jnp.float32))
    # ungudied channel keeps the unconditional value
    np.testing.assert_allclose(out[:, 1, 0, 0], jnp.ones(2))
    # cfg_scale <= 1 short-circuits to the conditional pass
    cfg1 = LabelClassifierFreeGuidance(base=Base(), null_label_id=0, cfg_scale=1.0)
    np.testing.assert_allclose(cfg1(x, jnp.zeros(2), y=y)[:, 0, 0, 0], 1 + y.astype(jnp.float32))


def test_cfg_wrapper_bare_callable_jits_through_flow_sampler(key):
    """Regression: a plain function as CFG base must be jit-safe (it is wrapped
    in WrappedField, not stored as a pytree leaf)."""
    from torchebm_tpu.samplers import FlowSampler
    from torchebm_tpu.samplers.flow import WrappedField

    def field(x, t, *, y):
        target = jnp.stack([y.astype(x.dtype), jnp.zeros_like(y, x.dtype)], -1)
        return target - x

    cfg = LabelClassifierFreeGuidance(
        base=field, null_label_id=0, cfg_scale=2.0, guide_channels=2
    )
    assert isinstance(cfg.base, WrappedField)
    y = jnp.array([3, 3, 5, 5], jnp.int32)
    gen = FlowSampler(model=cfg, integrator="euler").sample(
        key, dim=2, n_samples=4, n_steps=50, model_kwargs={"y": y}
    )
    # guided field = 2y - x; unit-time ODE from noise lands near 2y(1 - 1/e)
    c = 1.0 - float(np.exp(-1.0))
    np.testing.assert_allclose(np.asarray(gen[:2, 0]), 6.0 * c, atol=0.8)
    np.testing.assert_allclose(np.asarray(gen[2:, 0]), 10.0 * c, atol=0.8)
    # dataclass bases pass through unwrapped
    cfg2 = LabelClassifierFreeGuidance(base=WrappedField(fn=lambda p, x, t, **kw: -x))
    assert isinstance(cfg2.base, WrappedField)


def test_interaction_model_repulsion(key):
    base = GaussianEnergy.standard(2)
    inter = InteractionModel(model=base, sigma_w=4.0, strength=0.15)
    x0 = 0.1 * jax.random.normal(key, (64, 2))
    plain = LangevinDynamics(base, step_size=0.01).sample(key, x=x0, n_steps=200)
    repulsive = LangevinDynamics(inter, step_size=0.01).sample(key, x=x0, n_steps=200)
    assert float(jnp.var(repulsive)) > 1.5 * float(jnp.var(plain))


def test_interaction_model_pairwise_formula(key):
    base = GaussianEnergy.standard(2)
    inter = InteractionModel(model=base, sigma_w=2.0, strength=1.0)
    x = jax.random.normal(key, (8, 2))
    # brute-force pairwise sum
    pair = jnp.sum((x[:, None] - x[None]) ** 2, axis=-1).sum(axis=1)
    expected = base(x) - 0.5 / 4.0 * pair
    np.testing.assert_allclose(inter(x), expected, rtol=1e-4)
    with pytest.raises(ValueError):
        InteractionModel(model=base, sigma_w=-1.0)


def test_interaction_scheduled_strength(key):
    base = GaussianEnergy.standard(2)
    sched = TemperatureScheduler(0.15, 0.8, n_steps=100, sqrt=False)
    inter = InteractionModel(model=base, sigma_w=4.0, strength=sched)
    out = LangevinDynamics(inter, step_size=0.01).sample(
        key, x=0.1 * jax.random.normal(key, (16, 2)), n_steps=100
    )
    assert bool(jnp.all(jnp.isfinite(out)))
    # strength at step 0 is zero -> energy equals the base energy
    x = jax.random.normal(key, (4, 2))
    np.testing.assert_allclose(inter.energy(x, step=0), base(x), rtol=1e-5)


@pytest.mark.parametrize("energy_type", ["dot", "mean", "l2", "implicit"])
def test_eqm_energy_adapter(key, energy_type):
    field = MLPVelocityField(hidden_dims=(16,))
    p = field.init(key, jnp.zeros((1, 2)), jnp.zeros((1,)))
    wf = WrappedField(fn=field.apply, params=p)
    adapter = EqMEnergy(field=wf, energy_type=energy_type)
    x = jax.random.normal(key, (4, 2))
    assert adapter(x).shape == (4,)
    g = adapter.gradient(x)
    assert g.shape == x.shape
    if energy_type == "implicit":
        # gradient IS the field at t=0
        t0 = jnp.zeros(4)
        np.testing.assert_allclose(g, field.apply(p, x, t0), rtol=1e-5)


def test_eqm_energy_from_loss(key):
    from torchebm_tpu.losses import EquilibriumMatchingLoss

    field = MLPVelocityField(hidden_dims=(16,))
    p = field.init(key, jnp.zeros((1, 2)), jnp.zeros((1,)))
    wf = WrappedField(fn=field.apply, params=p)
    assert EqMEnergy.from_loss(EquilibriumMatchingLoss(model=wf, energy_type="none")).energy_type == "implicit"
    assert EqMEnergy.from_loss(EquilibriumMatchingLoss(model=wf, energy_type="dot")).energy_type == "dot"
    with pytest.raises(ValueError):
        EqMEnergy(field=wf, energy_type="cubic")


def test_mlp_and_conv_nets(key):
    e = MLPEnergy(hidden_dims=(16,))
    p = e.init(key, jnp.zeros((1, 2)))
    assert e.apply(p, jax.random.normal(key, (8, 2))).shape == (8,)

    f = MLPVelocityField(hidden_dims=(16,))
    pf = f.init(key, jnp.zeros((1, 3)), jnp.zeros((1,)))
    assert f.apply(pf, jax.random.normal(key, (8, 3)), jnp.zeros(8)).shape == (8, 3)

    c = ConvEnergy2D(channels=(8, 16))
    pc = c.init(key, jnp.zeros((1, 1, 28, 28)))
    assert c.apply(pc, jax.random.normal(key, (4, 1, 28, 28))).shape == (4,)

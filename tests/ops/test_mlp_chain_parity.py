"""Exact-parity tests for the neural (SiLU-MLP) Langevin chain kernel.

Same pattern as the analytic chain kernels: the injected-noise variant must
match a plain-jnp chain that uses ``jax.grad`` of the real flax MLPEnergy,
step for step. Runs in interpret mode on CPU (compiled on TPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchebm_tpu.models import MLPEnergy
from torchebm_tpu.ops.fused_mlp_langevin import extract_mlp_layers, mlp_langevin_chain

INTERPRET = jax.default_backend() != "tpu"


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


def _reference_chain(apply_fn, params, x0, noise, h, ns, clamp=None):
    coef = ns * jnp.sqrt(2.0 * h)
    grad = jax.grad(lambda xx: jnp.sum(apply_fn(params, xx)))
    x = x0
    for t in range(noise.shape[0]):
        x = x - h * grad(x) + coef * noise[t]
        if clamp is not None:
            x = jnp.clip(x, clamp[0], clamp[1])
    return x


@pytest.mark.parametrize("hidden,d,n", [((32,), 2, 21), ((64, 64), 2, 37), ((32, 16), 5, 12)])
def test_noise_parity_vs_flax_grad(key, hidden, d, n):
    net = MLPEnergy(hidden_dims=hidden)
    params = net.init(key, jnp.zeros((1, d)))
    layers = extract_mlp_layers(params)
    assert layers is not None and len(layers) == len(hidden) + 1

    n_steps, h, ns = 9, 0.01, 0.8
    x0 = jax.random.normal(jax.random.fold_in(key, 1), (n, d))
    noise = jax.random.normal(jax.random.fold_in(key, 2), (n_steps, n, d))

    out = mlp_langevin_chain(
        x0, layers, n_steps, h, ns, noise=noise, interpret=INTERPRET
    )
    ref = _reference_chain(net.apply, params, x0, noise, h, ns)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_clamp_parity(key):
    net = MLPEnergy(hidden_dims=(32,))
    params = net.init(key, jnp.zeros((1, 2)))
    layers = extract_mlp_layers(params)
    n_steps, h, ns, clamp = 7, 0.05, 1.0, (-0.5, 0.5)
    x0 = jax.random.normal(jax.random.fold_in(key, 1), (16, 2))
    noise = jax.random.normal(jax.random.fold_in(key, 2), (n_steps, 16, 2))
    out = mlp_langevin_chain(
        x0, layers, n_steps, h, ns, clamp=clamp, noise=noise, interpret=INTERPRET
    )
    ref = _reference_chain(net.apply, params, x0, noise, h, ns, clamp=clamp)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
    assert float(jnp.max(jnp.abs(out))) <= 0.5 + 1e-6


def test_under_jit_and_traced_params(key):
    """The kernel must trace under an outer jit with traced (but tangent-free)
    params and a traced seed — the CD train-step context."""
    net = MLPEnergy(hidden_dims=(32,))
    params = net.init(key, jnp.zeros((1, 2)))
    x0 = jax.random.normal(jax.random.fold_in(key, 1), (8, 2))
    noise = jax.random.normal(jax.random.fold_in(key, 2), (5, 8, 2))

    @jax.jit
    def run(p, x, nz):
        return mlp_langevin_chain(
            x, extract_mlp_layers(p), 5, 0.01, 1.0, noise=nz, interpret=INTERPRET
        )

    out = run(params, x0, noise)
    ref = _reference_chain(net.apply, params, x0, noise, 0.01, 1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_extract_rejects_non_mlp_trees(key):
    assert extract_mlp_layers({"params": {"Conv_0": {"kernel": jnp.zeros((3, 3, 1, 4))}}}) is None
    assert extract_mlp_layers({"params": {}}) is None
    # final layer must map to 1
    assert (
        extract_mlp_layers(
            {"params": {"Dense_0": {"kernel": jnp.zeros((2, 4)), "bias": jnp.zeros(4)}}}
        )
        is None
    )


def test_width_cap(key):
    with pytest.raises(ValueError, match="width"):
        mlp_langevin_chain(
            jnp.zeros((4, 2)),
            [(jnp.zeros((2, 1024)), jnp.zeros(1024)), (jnp.zeros((1024, 1)), jnp.zeros(1))],
            3, 0.01,
        )

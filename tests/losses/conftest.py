"""Shared fixtures for loss tests: tiny flax energy/field models."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import pytest

from torchebm_tpu.core import GaussianEnergy, WrappedEnergy
from torchebm_tpu.samplers.flow import WrappedField


class MLPEnergy(nn.Module):
    hidden: int = 32

    @nn.compact
    def __call__(self, x):
        h = nn.tanh(nn.Dense(self.hidden)(x))
        return nn.Dense(1)(h).squeeze(-1)


class MLPField(nn.Module):
    hidden: int = 32

    @nn.compact
    def __call__(self, x, t):
        h = jnp.concatenate([x, t[:, None]], -1)
        h = nn.tanh(nn.Dense(self.hidden)(h))
        return nn.Dense(x.shape[-1])(h)


@pytest.fixture
def mlp_energy(key):
    mlp = MLPEnergy()
    params = mlp.init(key, jnp.zeros((1, 2)))
    return WrappedEnergy(fn=mlp.apply, params=params), params


@pytest.fixture
def mlp_field(key):
    field = MLPField()
    params = field.init(key, jnp.zeros((1, 2)), jnp.zeros((1,)))
    return WrappedField(fn=field.apply, params=params), params


@pytest.fixture
def gauss_data(key):
    """Sampler for a correlated 2D Gaussian data distribution."""
    mean = jnp.array([1.0, -1.0])
    cov = jnp.array([[0.5, 0.2], [0.2, 0.4]])
    chol = jnp.linalg.cholesky(cov)

    def batch(k, n=128):
        return mean + jax.random.normal(k, (n, 2)) @ chol.T

    return batch

r"""Output head: adaLN-Zero modulated projection to patch pixels.

Reference: ``torchebm/models/components/heads.py:12-46`` (zero-init projection
so the backbone starts by predicting zeros).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .patch import unpatchify2d
from .transformer import modulate

Array = jax.Array

__all__ = ["AdaLNZeroPatchHead"]


class AdaLNZeroPatchHead(nn.Module):
    embed_dim: int
    patch_size: int
    out_channels: int
    cond_dim: Optional[int] = None
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: Array, cond: Array) -> Array:
        mod = nn.Dense(
            2 * self.embed_dim,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="modulation",
        )(nn.silu(cond))
        shift, scale = jnp.split(mod, 2, axis=1)
        tokens = modulate(
            nn.LayerNorm(use_bias=False, use_scale=False, epsilon=self.eps, dtype=self.dtype)(tokens),
            shift,
            scale,
        )
        patches = nn.Dense(
            self.patch_size * self.patch_size * self.out_channels,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="proj",
        )(tokens)
        return unpatchify2d(patches, self.patch_size, out_channels=self.out_channels)

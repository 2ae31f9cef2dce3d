r"""Fixed 2D sin-cos positional embeddings (reference ``components/positional.py:9-43``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

__all__ = ["build_2d_sincos_pos_embed"]


def _sincos_1d(embed_dim: int, pos: Array) -> Array:
    if embed_dim % 2 != 0:
        raise ValueError(f"embed_dim must be even, got {embed_dim}")
    omega = jnp.arange(embed_dim // 2, dtype=jnp.float32)
    omega = 1.0 / (10000.0 ** (omega / (embed_dim / 2)))
    out = pos[:, None].astype(jnp.float32) * omega[None, :]
    return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=1)


def build_2d_sincos_pos_embed(embed_dim: int, grid_size: int, dtype=jnp.float32) -> Array:
    """``(grid_size², embed_dim)`` fixed positional table."""
    if embed_dim % 2 != 0:
        raise ValueError(f"embed_dim must be even, got {embed_dim}")
    grid_h = jnp.arange(grid_size, dtype=jnp.float32)
    grid_w = jnp.arange(grid_size, dtype=jnp.float32)
    ww, hh = jnp.meshgrid(grid_w, grid_h, indexing="xy")
    grid = jnp.stack([ww, hh], axis=0).reshape(2, -1)  # (2, M)
    emb_h = _sincos_1d(embed_dim // 2, grid[0])
    emb_w = _sincos_1d(embed_dim // 2, grid[1])
    return jnp.concatenate([emb_h, emb_w], axis=1).astype(dtype)

r"""Shared loss utilities (reference ``torchebm/losses/loss_utils.py:8-129``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

__all__ = [
    "mean_flat",
    "trimmed_mean",
    "compute_flow_weight",
    "compute_eqm_ct",
    "dispersive_loss",
]


def mean_flat(tensor: Array) -> Array:
    """Mean over all non-batch dimensions: ``(B, ...) -> (B,)``."""
    return jnp.mean(tensor.reshape(tensor.shape[0], -1), axis=-1)


def trimmed_mean(values: Array, trim_fraction: float) -> Array:
    """One-sided trimmed mean: drop the ``trim_fraction`` largest values.

    Robustifies the negative-energy statistic in Energy Matching
    (``loss_utils.py:20-44``). ``trim_fraction`` must be a static float.
    """
    if not 0.0 <= trim_fraction < 1.0:
        raise ValueError(f"trim_fraction must be in [0, 1), got {trim_fraction}")
    n = values.shape[0]
    k = int(trim_fraction * n)
    if k == 0:
        return jnp.mean(values)
    return jnp.mean(jnp.sort(values)[: n - k])


def compute_flow_weight(t: Array, cutoff: float = 0.8) -> Array:
    r"""Energy-Matching time gate :math:`w(t) = \mathrm{clip}((1-t)/(1-a), 0, 1)`
    (``loss_utils.py:47-67``). ``cutoff >= 1`` disables gating."""
    if cutoff >= 1.0:
        return jnp.ones_like(t)
    return jnp.clip((1.0 - t) / (1.0 - cutoff), 0.0, 1.0)


def compute_eqm_ct(t: Array, threshold: float = 0.8, multiplier: float = 4.0) -> Array:
    r"""EqM target scaling :math:`c(t) = \lambda \min(1, (1-t)/(1-a))`
    (``loss_utils.py:70-101``)."""
    ct = jnp.minimum(
        jnp.ones_like(t),
        1.0 / (1.0 - threshold) - t / (1.0 - threshold),
    )
    return ct * multiplier


def dispersive_loss(z: Array) -> Array:
    r"""InfoNCE-L2 dispersive regularizer (``loss_utils.py:104-118``).

    :math:`\log \mathbb{E}_{i,j}\, e^{-\|z_i - z_j\|^2 / d}` over all ordered
    pairs including the zero diagonal (matches the reference's pdist
    duplication + zeros concat).
    """
    z = z.reshape(z.shape[0], -1)
    sq = (
        jnp.sum(z * z, axis=1)[:, None]
        + jnp.sum(z * z, axis=1)[None, :]
        - 2.0 * z @ z.T
    )
    d = jnp.maximum(sq, 0.0) / z.shape[1]
    return jnp.log(jnp.mean(jnp.exp(-d)))

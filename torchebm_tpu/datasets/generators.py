r"""Synthetic 2D datasets as pure ``jax.random`` generator functions.

Reference: ``torchebm/datasets/generators.py:15-666`` (8 concrete datasets on
``BaseSyntheticDataset``). Each distribution is a pure function
``make_<name>(key, n_samples, **cfg) -> (n, 2) array`` — directly usable inside
jitted training loops — plus a thin stateful :class:`BaseSyntheticDataset`
wrapper providing the reference's seeded-at-init / ``regenerate`` /
``get_data`` / indexing surface.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

__all__ = [
    "make_gaussian_mixture",
    "make_8gaussians",
    "make_two_moons",
    "make_swiss_roll",
    "make_circle",
    "make_checkerboard",
    "make_pinwheel",
    "make_grid",
    "BaseSyntheticDataset",
    "GaussianMixtureDataset",
    "EightGaussiansDataset",
    "TwoMoonsDataset",
    "SwissRollDataset",
    "CircleDataset",
    "CheckerboardDataset",
    "PinwheelDataset",
    "GridDataset",
    "DATASET_REGISTRY",
]


def _assign_counts(n: int, k: int) -> list:
    """Split ``n`` into ``k`` near-equal counts (reference remainder handling)."""
    base, rem = divmod(n, k)
    return [base + (1 if i < rem else 0) for i in range(k)]


def make_gaussian_mixture(
    key: Array, n_samples: int = 2000, n_components: int = 8,
    std: float = 0.05, radius: float = 1.0,
) -> Array:
    """Ring of ``n_components`` Gaussians (reference ``generators.py:143-201``)."""
    if n_components <= 0:
        raise ValueError("n_components must be positive")
    if std < 0:
        raise ValueError("std must be non-negative")
    thetas = jnp.linspace(0, 2 * math.pi, n_components + 1)[:-1]
    centers = radius * jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], axis=1)
    k_comp, k_noise = jax.random.split(key)
    comp = jax.random.randint(k_comp, (n_samples,), 0, n_components)
    noise = std * jax.random.normal(k_noise, (n_samples, 2))
    return centers[comp] + noise


_DIAG = 1.0 / math.sqrt(2)
_EIGHT_CENTERS = (
    (1, 0), (-1, 0), (0, 1), (0, -1),
    (_DIAG, _DIAG), (_DIAG, -_DIAG), (-_DIAG, _DIAG), (-_DIAG, -_DIAG),
)


def make_8gaussians(
    key: Array, n_samples: int = 2000, std: float = 0.02, scale: float = 2.0
) -> Array:
    """The classic '8 Gaussians' benchmark mixture (reference ``:205-268``)."""
    centers = scale * jnp.asarray(_EIGHT_CENTERS, jnp.float32)
    k_comp, k_noise = jax.random.split(key)
    comp = jax.random.randint(k_comp, (n_samples,), 0, 8)
    return centers[comp] + std * jax.random.normal(k_noise, (n_samples, 2))


def make_two_moons(key: Array, n_samples: int = 2000, noise: float = 0.05) -> Array:
    """Two interleaving half-circles (reference ``:272-315``)."""
    n_out = n_samples // 2
    n_in = n_samples - n_out
    outer = jnp.linspace(0, math.pi, n_out)
    inner = jnp.linspace(0, math.pi, n_in)
    data = jnp.stack(
        [
            jnp.concatenate([jnp.cos(outer), 1 - jnp.cos(inner)]),
            jnp.concatenate([jnp.sin(outer), 1 - jnp.sin(inner) - 0.5]),
        ],
        axis=1,
    )
    return data + noise * jax.random.normal(key, data.shape)


def make_swiss_roll(
    key: Array, n_samples: int = 2000, noise: float = 0.05, arclength: float = 3.0
) -> Array:
    """2D Swiss roll, centered and scaled (reference ``:318-357``)."""
    k_u, k_noise = jax.random.split(key)
    u = jax.random.uniform(k_u, (n_samples,))
    t = arclength * math.pi * (1 + 2 * u)
    data = jnp.stack([t * jnp.cos(t), t * jnp.sin(t)], axis=1)
    data = data + noise * jax.random.normal(k_noise, data.shape)
    return (data - jnp.mean(data, axis=0)) / (jnp.mean(jnp.std(data, axis=0)) * 2.0)


def make_circle(
    key: Array, n_samples: int = 2000, noise: float = 0.05, radius: float = 1.0
) -> Array:
    """Uniform circle with Gaussian noise (reference ``:360-395``)."""
    k_u, k_noise = jax.random.split(key)
    angles = 2 * math.pi * jax.random.uniform(k_u, (n_samples,))
    data = radius * jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=1)
    return data + noise * jax.random.normal(k_noise, data.shape)


def make_checkerboard(
    key: Array, n_samples: int = 2000, range_limit: float = 4.0, noise: float = 0.01
) -> Array:
    """Checkerboard pattern (reference ``:398-446``).

    The reference's host-side rejection loop becomes a fixed-shape oversample:
    draw ``4n`` uniform candidates, stably sort valid-first, keep ``n`` (reuse
    modulo in the astronomically unlikely shortfall) — jit-compatible, no
    data-dependent shapes.
    """
    k_xy, k_noise = jax.random.split(key)
    batch = max(1000, 4 * n_samples)
    xy = (jax.random.uniform(k_xy, (batch, 2)) * 2 - 1) * range_limit
    keep = (jnp.floor(xy[:, 0]) + jnp.floor(xy[:, 1])) % 2 != 0
    order = jnp.argsort(~keep, stable=True)  # valid candidates first
    n_valid = jnp.sum(keep)
    idx = order[jnp.arange(n_samples) % jnp.maximum(n_valid, 1)]
    return xy[idx] + noise * jax.random.normal(k_noise, (n_samples, 2))


def make_pinwheel(
    key: Array, n_samples: int = 2000, n_classes: int = 5, noise: float = 0.05,
    radial_scale: float = 2.0, angular_scale: float = 0.1, spiral_scale: float = 5.0,
) -> Array:
    """Pinwheel with curved blades (reference ``:449-529``)."""
    k_t, k_ang, k_noise, k_cls = jax.random.split(key, 4)
    cls = jax.random.randint(k_cls, (n_samples,), 0, n_classes)
    t = jnp.sqrt(jax.random.uniform(k_t, (n_samples,)))
    radii = t * radial_scale
    base_angle = cls * (2 * math.pi / n_classes)
    thetas = base_angle + spiral_scale * t + angular_scale * jax.random.normal(k_ang, (n_samples,))
    data = jnp.stack([radii * jnp.cos(thetas), radii * jnp.sin(thetas)], axis=1)
    return data + noise * jax.random.normal(k_noise, data.shape)


def make_grid(
    key: Array, n_samples_per_dim: int = 10, range_limit: float = 1.0, noise: float = 0.01
) -> Array:
    """Regular 2D grid + noise; ``n_samples_per_dim²`` points (reference ``:575-666``)."""
    if n_samples_per_dim <= 0:
        raise ValueError("n_samples_per_dim must be positive")
    coords = jnp.linspace(-range_limit, range_limit, n_samples_per_dim)
    xv, yv = jnp.meshgrid(coords, coords)
    data = jnp.stack([xv.ravel(), yv.ravel()], axis=1)
    return data + noise * jax.random.normal(key, data.shape)


# ---------------------------------------------------------------------------
# Stateful dataset wrappers (reference BaseSyntheticDataset surface, :15-137)
# ---------------------------------------------------------------------------


class BaseSyntheticDataset:
    """Seeded-at-init dataset wrapper with ``regenerate``/``get_data``/indexing."""

    _make = None  # staticmethod set by subclasses
    _default_kwargs = {}

    def __init__(self, n_samples: int = 2000, seed: Optional[int] = None, **kwargs):
        if n_samples <= 0:
            raise ValueError("n_samples must be positive")
        self.n_samples = int(n_samples)
        self.config = {**self._default_kwargs, **kwargs}
        self.seed = 0 if seed is None else int(seed)
        self.data = self._generate(self.seed)

    def _generate(self, seed: int) -> Array:
        return type(self)._make(jax.random.PRNGKey(seed), self.n_samples, **self.config)

    def regenerate(self, seed: Optional[int] = None) -> Array:
        """Redraw the dataset (optionally with a new seed); returns the new data."""
        if seed is not None:
            self.seed = int(seed)
        else:
            self.seed += 1
        self.data = self._generate(self.seed)
        return self.data

    def get_data(self) -> Array:
        return self.data

    def __len__(self) -> int:
        return self.data.shape[0]

    def __getitem__(self, idx):
        return self.data[idx]

    def batches(self, key: Array, batch_size: int, *, drop_last: bool = True):
        """Yield shuffled minibatches (one epoch)."""
        perm = jax.random.permutation(key, self.data.shape[0])
        n_full = self.data.shape[0] // batch_size
        for i in range(n_full):
            yield self.data[perm[i * batch_size : (i + 1) * batch_size]]
        if not drop_last and self.data.shape[0] % batch_size:
            yield self.data[perm[n_full * batch_size :]]


class GaussianMixtureDataset(BaseSyntheticDataset):
    _make = staticmethod(make_gaussian_mixture)
    _default_kwargs = dict(n_components=8, std=0.05, radius=1.0)


class EightGaussiansDataset(BaseSyntheticDataset):
    _make = staticmethod(make_8gaussians)
    _default_kwargs = dict(std=0.02, scale=2.0)


class TwoMoonsDataset(BaseSyntheticDataset):
    _make = staticmethod(make_two_moons)
    _default_kwargs = dict(noise=0.05)


class SwissRollDataset(BaseSyntheticDataset):
    _make = staticmethod(make_swiss_roll)
    _default_kwargs = dict(noise=0.05, arclength=3.0)


class CircleDataset(BaseSyntheticDataset):
    _make = staticmethod(make_circle)
    _default_kwargs = dict(noise=0.05, radius=1.0)


class CheckerboardDataset(BaseSyntheticDataset):
    _make = staticmethod(make_checkerboard)
    _default_kwargs = dict(range_limit=4.0, noise=0.01)


class PinwheelDataset(BaseSyntheticDataset):
    _make = staticmethod(make_pinwheel)
    _default_kwargs = dict(n_classes=5, noise=0.05, radial_scale=2.0,
                           angular_scale=0.1, spiral_scale=5.0)


class GridDataset(BaseSyntheticDataset):
    _default_kwargs = dict(range_limit=1.0, noise=0.01)

    def __init__(self, n_samples_per_dim: int = 10, seed: Optional[int] = None, **kwargs):
        self.n_samples_per_dim = int(n_samples_per_dim)
        super().__init__(n_samples=n_samples_per_dim**2, seed=seed, **kwargs)

    def _generate(self, seed: int) -> Array:
        return make_grid(
            jax.random.PRNGKey(seed), self.n_samples_per_dim, **self.config
        )


DATASET_REGISTRY = {
    "gaussian_mixture": GaussianMixtureDataset,
    "8gaussians": EightGaussiansDataset,
    "two_moons": TwoMoonsDataset,
    "swiss_roll": SwissRollDataset,
    "circle": CircleDataset,
    "checkerboard": CheckerboardDataset,
    "pinwheel": PinwheelDataset,
    "grid": GridDataset,
}

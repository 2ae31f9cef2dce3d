"""Synthetic dataset tests: shapes, statistics, reproducibility, registry."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchebm_tpu.datasets import (
    DATASET_REGISTRY,
    CheckerboardDataset,
    EightGaussiansDataset,
    GridDataset,
    TwoMoonsDataset,
    load_mnist,
    make_8gaussians,
    make_checkerboard,
    make_circle,
    make_gaussian_mixture,
    make_pinwheel,
    make_swiss_roll,
    make_two_moons,
)

GEN_FNS = [
    make_gaussian_mixture,
    make_8gaussians,
    make_two_moons,
    make_swiss_roll,
    make_circle,
    make_checkerboard,
    make_pinwheel,
]


@pytest.mark.parametrize("fn", GEN_FNS, ids=lambda f: f.__name__)
def test_generator_shapes_and_determinism(fn, key):
    a = fn(key, 512)
    assert a.shape == (512, 2)
    assert bool(jnp.all(jnp.isfinite(a)))
    np.testing.assert_array_equal(a, fn(key, 512))
    b = fn(jax.random.fold_in(key, 1), 512)
    assert float(jnp.max(jnp.abs(a - b))) > 1e-4


def test_8gaussians_statistics(key):
    data = make_8gaussians(key, 8000, std=0.02, scale=2.0)
    r = jnp.linalg.norm(data, axis=-1)
    # all centers at radius 2 (scale=2, unit centers)
    assert abs(float(jnp.mean(r)) - 2.0) < 0.05
    np.testing.assert_allclose(jnp.mean(data, 0), jnp.zeros(2), atol=0.1)


def test_gaussian_mixture_ring(key):
    data = make_gaussian_mixture(key, 4000, n_components=4, std=0.01, radius=3.0)
    r = jnp.linalg.norm(data, axis=-1)
    assert abs(float(jnp.mean(r)) - 3.0) < 0.05
    with pytest.raises(ValueError):
        make_gaussian_mixture(key, 10, n_components=0)


def test_circle_radius(key):
    data = make_circle(key, 4000, noise=0.0, radius=1.5)
    np.testing.assert_allclose(jnp.linalg.norm(data, axis=-1), 1.5, atol=1e-5)


def test_checkerboard_pattern(key):
    data = make_checkerboard(key, 4000, range_limit=4.0, noise=0.0)
    cells = (jnp.floor(data[:, 0]) + jnp.floor(data[:, 1])) % 2
    assert bool(jnp.all(cells != 0))
    assert float(jnp.max(jnp.abs(data))) <= 4.0 + 1e-5


def test_two_moons_structure(key):
    data = make_two_moons(key, 2000, noise=0.0)
    # upper moon spans y in [0, 1], lower in [-0.5, 0.5]
    assert float(data[:, 1].max()) <= 1.0 + 1e-5
    assert float(data[:, 1].min()) >= -0.5 - 1e-5


def test_swiss_roll_normalized(key):
    data = make_swiss_roll(key, 4000)
    assert abs(float(jnp.mean(data))) < 0.05


def test_dataset_class_surface(key):
    ds = EightGaussiansDataset(n_samples=256, seed=3)
    assert len(ds) == 256
    assert ds[0].shape == (2,)
    assert ds.get_data().shape == (256, 2)
    first = np.asarray(ds.get_data())
    again = EightGaussiansDataset(n_samples=256, seed=3).get_data()
    np.testing.assert_array_equal(first, again)  # seeded-at-init reproducibility
    ds.regenerate(seed=4)
    assert float(jnp.max(jnp.abs(ds.get_data() - first))) > 1e-4
    with pytest.raises(ValueError):
        TwoMoonsDataset(n_samples=0)


def test_dataset_batches(key):
    ds = TwoMoonsDataset(n_samples=100, seed=0)
    batches = list(ds.batches(key, 32))
    assert len(batches) == 3
    assert all(b.shape == (32, 2) for b in batches)
    batches2 = list(ds.batches(key, 32, drop_last=False))
    assert batches2[-1].shape == (4, 2)


def test_grid_dataset():
    ds = GridDataset(n_samples_per_dim=5, noise=0.0)
    assert len(ds) == 25
    xs = sorted(set(np.asarray(ds.get_data()[:, 0]).round(5).tolist()))
    assert len(xs) == 5


def test_registry_complete():
    assert set(DATASET_REGISTRY) == {
        "gaussian_mixture", "8gaussians", "two_moons", "swiss_roll",
        "circle", "checkerboard", "pinwheel", "grid",
    }
    for name, cls in DATASET_REGISTRY.items():
        if name == "grid":
            ds = cls(n_samples_per_dim=4)
        else:
            ds = cls(n_samples=64)
        assert ds.get_data().shape[1] == 2


def test_load_mnist_contract():
    x, y = load_mnist("train")
    assert x.ndim == 4 and x.shape[1:] == (1, 28, 28)
    assert float(x.min()) >= -1.0 and float(x.max()) <= 1.0
    assert y.shape == (x.shape[0],)
    assert int(y.max()) <= 9
    xf, _ = load_mnist("test", flatten=True)
    assert xf.shape[1] == 784
    with pytest.raises(ValueError):
        load_mnist("valid")

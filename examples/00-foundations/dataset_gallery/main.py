"""Dataset gallery: the eight synthetic 2D benchmark targets.

Mirrors the reference's dataset-gallery lesson
(``examples/00-foundations/02-datasets/01-dataset-gallery``). Every dataset
is a pure ``make_*(key, n, ...)`` function plus a seeded Dataset-style class
(``DATASET_REGISTRY``); generation is jittable ``jax.random``, so a dataset
can be resampled fresh *inside* a compiled training step.
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
import _common

smoke = _common.setup()

import jax
import jax.numpy as jnp

from torchebm_tpu.datasets import DATASET_REGISTRY


def ascii_density(x, bins=24, span=4.5):
    """Render a point cloud as a small ASCII histogram."""
    h, _, _ = jnp.histogram2d(
        x[:, 1], x[:, 0], bins=bins, range=[[-span, span], [-span, span]]
    )
    shades = " .:-=+*#%@"
    h = h / (jnp.max(h) + 1e-9)
    rows = []
    for r in jnp.flipud(h):
        rows.append("".join(shades[int(v * (len(shades) - 1))] for v in r))
    return "\n".join(rows)


def main():
    key = jax.random.PRNGKey(0)
    n = 400 if smoke else 4000
    for name, cls in sorted(DATASET_REGISTRY.items()):
        ds = cls(seed=0) if name != "grid" else cls()
        data = ds.get_data()
        # same targets are available functionally:
        print(f"== {name}: {type(ds).__name__}  shape {tuple(data.shape)}  "
              f"mean {jnp.mean(data, 0)}  std {jnp.std(data, 0)}")
        if not smoke:
            sub = data[: min(n, data.shape[0])]
            print(ascii_density(sub))
    # seeded regeneration contract (reference generators.py:190-199)
    ds = DATASET_REGISTRY["two_moons"](n_samples=256, seed=1)
    a = ds.get_data()
    b = ds.regenerate(seed=1)
    c = ds.regenerate(seed=2)
    assert jnp.allclose(a, b) and not jnp.allclose(a, c)
    print("seeded regenerate: same seed reproduces, new seed differs. OK")


if __name__ == "__main__":
    main()

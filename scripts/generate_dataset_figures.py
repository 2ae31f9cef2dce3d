#!/usr/bin/env python
"""Regenerate the dataset-gallery PNGs embedded by the docs.

Docs asset pipeline (reference: ``scripts/generate_dataset_figures.py`` —
same role, independently implemented): one square, axis-free scatter per
synthetic dataset from ``DATASET_REGISTRY``, colored by local point density,
written with STABLE filenames to ``docs/assets/images/datasets/<name>.png``
so docs pages can embed them by name. Run it whenever a generator changes:

    python scripts/generate_dataset_figures.py [--out DIR] [--n 4000]

Runs on CPU (forces the backend before first use — the axon plugin ignores
the JAX_PLATFORMS env var, see CLAUDE.md). matplotlib with the Agg backend;
exits with a clear message if matplotlib is unavailable rather than failing
mid-plot.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DEFAULT_OUT = os.path.join(
    os.path.dirname(__file__), "..", "docs", "assets", "images", "datasets"
)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=DEFAULT_OUT, help="output directory")
    ap.add_argument("--n", type=int, default=4000, help="points per dataset")
    ap.add_argument("--dpi", type=int, default=110)
    args = ap.parse_args(argv)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib is required: pip install matplotlib", file=sys.stderr)
        return 1

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from torchebm_tpu.datasets import DATASET_REGISTRY

    out_dir = os.path.abspath(args.out)
    os.makedirs(out_dir, exist_ok=True)

    for name, cls in sorted(DATASET_REGISTRY.items()):
        if name == "grid":
            ds = cls(n_samples_per_dim=max(8, int(args.n**0.5) // 4))
        else:
            ds = cls(n_samples=args.n, seed=0)
        x = jnp.asarray(ds.get_data())

        # local density via a 2D histogram lookup -> perceptual color ramp
        bins = 64
        lo = jnp.min(x, axis=0) - 0.3
        hi = jnp.max(x, axis=0) + 0.3
        h, xe, ye = jnp.histogram2d(
            x[:, 0], x[:, 1], bins=bins, range=[[lo[0], hi[0]], [lo[1], hi[1]]]
        )
        ix = jnp.clip(jnp.searchsorted(xe, x[:, 0]) - 1, 0, bins - 1)
        iy = jnp.clip(jnp.searchsorted(ye, x[:, 1]) - 1, 0, bins - 1)
        dens = h[ix, iy]

        fig, ax = plt.subplots(figsize=(3.2, 3.2))
        ax.scatter(x[:, 0], x[:, 1], c=dens, s=3.0, cmap="viridis", linewidths=0)
        ax.set_aspect("equal")
        ax.axis("off")
        fig.tight_layout(pad=0.1)
        path = os.path.join(out_dir, f"{name}.png")
        fig.savefig(path, dpi=args.dpi, bbox_inches="tight", pad_inches=0.05)
        plt.close(fig)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

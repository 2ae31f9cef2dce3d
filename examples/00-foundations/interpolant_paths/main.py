"""Interpolant paths: alpha/sigma schedules and conditional velocities."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
import _common

_common.setup()

import jax
import jax.numpy as jnp

from torchebm_tpu.interpolants import (
    CosineInterpolant, LinearInterpolant, VariancePreservingInterpolant,
)


def main():
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (256, 2))
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (256, 2)) + 2.0
    ts = jnp.linspace(0.05, 0.95, 7)

    for interp in (LinearInterpolant(), CosineInterpolant(), VariancePreservingInterpolant()):
        name = type(interp).__name__
        alphas = [float(interp.compute_alpha_t(t)[0]) for t in ts]
        print(f"{name:32s} alpha(t): " + " ".join(f"{a:.2f}" for a in alphas))
        xt, ut = interp.interpolate(x0, x1, jnp.full((256,), 0.5))
        print(f"{'':32s} |x_0.5|={float(jnp.mean(jnp.linalg.norm(xt, axis=-1))):.3f} "
              f"|u_0.5|={float(jnp.mean(jnp.linalg.norm(ut, axis=-1))):.3f}")
    print("OK")


if __name__ == "__main__":
    main()

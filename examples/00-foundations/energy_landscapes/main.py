"""Tour of the analytic energy zoo: values, gradients, and known minima."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
import _common

_common.setup()

import jax
import jax.numpy as jnp

from torchebm_tpu.core import (
    AckleyEnergy, DoubleWellEnergy, GaussianEnergy, GaussianMixtureEnergy,
    HarmonicEnergy, RastriginEnergy, RosenbrockEnergy,
)


def main():
    key = jax.random.PRNGKey(0)
    grid = jnp.stack(
        jnp.meshgrid(jnp.linspace(-3, 3, 50), jnp.linspace(-3, 3, 50)), -1
    ).reshape(-1, 2)

    energies = {
        "double-well": DoubleWellEnergy(),
        "gaussian": GaussianEnergy.standard(2),
        "8gaussians": GaussianMixtureEnergy.eight_gaussians(radius=2.0),
        "harmonic": HarmonicEnergy(),
        "rosenbrock": RosenbrockEnergy(),
        "ackley": AckleyEnergy(),
        "rastrigin": RastriginEnergy(),
    }
    for name, e in energies.items():
        vals = e(grid)
        argmin = grid[jnp.argmin(vals)]
        g = e.gradient(grid[:4])
        print(f"{name:12s} min E={float(vals.min()):8.3f} at {argmin} | grad shape {g.shape}")
    print("OK")


if __name__ == "__main__":
    main()

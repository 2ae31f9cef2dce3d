"""HMC with dual-averaging step-size adaptation on 2D analytic energies."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
import _common

smoke = _common.setup()

import jax
import jax.numpy as jnp

from torchebm_tpu.core import GaussianEnergy, RosenbrockEnergy
from torchebm_tpu.samplers import HamiltonianMonteCarlo


def main():
    key = jax.random.PRNGKey(0)
    n_chains = 64 if smoke else 1024
    n_warmup = _common.n(500, 50)
    n_steps = _common.n(1000, 50)

    for name, energy in [
        ("gaussian", GaussianEnergy.create(jnp.array([1.0, -1.0]), jnp.array([[1.0, 0.5], [0.5, 1.0]]))),
        ("rosenbrock", RosenbrockEnergy(a=1.0, b=20.0)),
    ]:
        hmc = HamiltonianMonteCarlo(
            energy, step_size=0.5, n_leapfrog_steps=8,
            dual_averaging=True, target_accept=0.8,
        )
        x, eps = hmc.warmup(key, dim=2, n_warmup=n_warmup, n_samples=n_chains)
        samples, diag = hmc.replace(step_size=eps).sample(
            jax.random.fold_in(key, 1), x=x, n_steps=n_steps, return_diagnostics=True
        )
        acc = float(diag["acceptance_rate"].mean())
        print(f"{name:12s} adapted eps={eps:.4f} acceptance={acc:.2f} "
              f"mean={jnp.mean(samples, 0)}")
    print("OK")


if __name__ == "__main__":
    main()

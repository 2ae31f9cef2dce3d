"""Langevin sampling of the 8gaussians mixture with R-hat/ESS diagnostics.

The BASELINE config-1 workload: 10k parallel chains compiled to one XLA
program.
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
import _common

smoke = _common.setup()

import jax
import jax.numpy as jnp

from torchebm_tpu.core import GaussianMixtureEnergy
from torchebm_tpu.samplers import LangevinDynamics, summarize_chains


def main():
    key = jax.random.PRNGKey(0)
    mix = GaussianMixtureEnergy.eight_gaussians(radius=4.0, scale=0.4)
    sampler = LangevinDynamics(mix, step_size=0.05)

    n_chains = 200 if smoke else 10_000
    n_steps = _common.n(2000, 100)

    samples, diag = sampler.sample(
        key, dim=2, n_samples=n_chains, n_steps=n_steps, thin=10,
        return_diagnostics=True,
    )
    r = jnp.linalg.norm(samples, axis=-1)
    print(f"{n_chains} chains x {n_steps} steps")
    print(f"mean radius: {float(jnp.mean(r)):.2f} (target 4.0)")
    print(f"final mean energy: {float(diag['energy'][-1]):.3f}")

    traj = sampler.sample(
        jax.random.fold_in(key, 1), x=mix.sample(key, 64), n_steps=n_steps,
        return_trajectory=True,
    )
    stats = summarize_chains(traj)
    print(f"split R-hat: {stats['r_hat']}  ESS: {stats['ess']}")
    print("OK")


if __name__ == "__main__":
    main()

"""Evaluating generative models: AIS log-Z, exact flow likelihood, MALA.

Three build-beyond-the-reference tools on targets with known answers:

1. `annealed_importance_sampling` estimates log Z of an energy; on the
   (exactly normalized) Gaussian-mixture energy the truth is 0.
2. `FlowSampler.log_prob` computes exact likelihoods through the
   probability-flow ODE; with the closed-form optimal velocity field for
   Gaussian endpoints the truth is the target's log-density.
3. `MetropolisAdjustedLangevin` removes ULA's discretization bias: at a
   large step size ULA inflates a standard Gaussian's variance to ~1+eta
   while MALA holds it at 1.
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
import _common

smoke = _common.setup()

import jax
import jax.numpy as jnp

from torchebm_tpu.core import GaussianEnergy, GaussianMixtureEnergy
from torchebm_tpu.interpolants import get_interpolant
from torchebm_tpu.samplers import (
    FlowSampler,
    LangevinDynamics,
    MetropolisAdjustedLangevin,
    annealed_importance_sampling,
)


def main():
    key = jax.random.PRNGKey(0)

    # --- 1. AIS: log Z of a normalized mixture is exactly 0 ----------------
    mix = GaussianMixtureEnergy.eight_gaussians(radius=2.0, scale=0.5)
    res = annealed_importance_sampling(
        key, mix, dim=2,
        n_samples=_common.n(2000, 200), n_rungs=_common.n(300, 30), step_size=0.2,
    )
    print(f"AIS: log Z = {float(res.log_z):+.4f} (truth 0)  "
          f"ESS = {float(res.ess):.0f}/{res.log_weights.shape[0]}  "
          f"accept = {float(res.acceptance_rate):.2f}")

    # --- 2. exact likelihood through the probability-flow ODE --------------
    mu, s = jnp.array([1.5, -0.5]), 0.7
    interp = get_interpolant("linear")

    def optimal_velocity(x, t):  # closed-form optimal field, see SURVEY.md
        a, da = interp.compute_alpha_t(t)
        sg, dsg = interp.compute_sigma_t(t)
        a, da, sg, dsg = [jnp.reshape(v, (-1, 1)) for v in (a, da, sg, dsg)]
        v = a * a * s * s + sg * sg
        xc = x - a * mu
        return da * (mu + (a * s * s / v) * xc) + dsg * (sg / v) * xc

    fs = FlowSampler(model=optimal_velocity, integrator="rk4")
    x = mu + s * jax.random.normal(key, (_common.n(256, 32), 2))
    lp = fs.log_prob(x, n_steps=_common.n(100, 20))
    truth = -jnp.log(2 * jnp.pi * s * s) - jnp.sum((x - mu) ** 2, -1) / (2 * s * s)
    print(f"log_prob: max |error| vs closed form = "
          f"{float(jnp.max(jnp.abs(lp - truth))):.2e}")

    # --- 3. MALA exactness vs unadjusted Langevin ---------------------------
    e = GaussianEnergy.standard(2)
    eta, n, steps = 0.6, _common.n(4000, 400), _common.n(400, 40)
    ula = LangevinDynamics(e, step_size=eta).sample(key, dim=2, n_samples=n, n_steps=steps)
    mala = MetropolisAdjustedLangevin(e, step_size=eta).sample(key, dim=2, n_samples=n, n_steps=steps)
    print(f"variance @ eta={eta}: ULA {float(jnp.var(ula)):.3f} (biased ~1+eta)  "
          f"MALA {float(jnp.var(mala)):.3f} (exact 1)")
    print("OK")


if __name__ == "__main__":
    main()

"""Equilibrium matching (Wang & Du 2025) on a 2D mixture.

Mirrors the reference's EqM lesson
(``examples/20-training/03-equilibrium-matching/01-equilibrium-matching-2d``):
train a *time-invariant* field whose equilibria sit on the data, generate by
descending it (no time variable at sampling), and adapt the trained field
into a scalar :class:`Energy` via ``EqMEnergy`` so the full MCMC toolbox
applies to it.
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
import _common

smoke = _common.setup()

import jax
import jax.numpy as jnp
import optax

from torchebm_tpu.datasets import make_8gaussians
from torchebm_tpu.losses import EquilibriumMatchingLoss
from torchebm_tpu.models import EqMEnergy, MLPVelocityField
from torchebm_tpu.samplers import FlowSampler, GradientDescentSampler, LangevinDynamics
from torchebm_tpu.samplers.flow import WrappedField


def main():
    key = jax.random.PRNGKey(0)
    net = MLPVelocityField(hidden_dims=(256, 256, 256))
    params = net.init(key, jnp.zeros((1, 2)), jnp.zeros((1,)))

    eqm = EquilibriumMatchingLoss(
        model=net.apply,
        coupling="sinkhorn",      # OT pairing straightens the learned field
        ct_threshold=0.8,
        ct_multiplier=4.0,
    )

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, x1, k):
        loss, grads = jax.value_and_grad(eqm)(params, x1, k)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    steps = _common.n(3000, 30)
    for i in range(steps):
        k = jax.random.fold_in(key, i)
        x1 = make_8gaussians(k, 256, std=0.15, scale=2.0)
        params, opt_state, loss = train_step(params, opt_state, x1,
                                             jax.random.fold_in(k, 1))
        if i % max(steps // 5, 1) == 0 or i == steps - 1:
            print(f"step {i:5d}  EqM loss {float(loss):.4f}")

    field = WrappedField(fn=net.apply, params=params)

    # Generation route 1: FlowSampler with negate_velocity (EqM fields point
    # data -> noise).
    fs = FlowSampler(model=field, negate_velocity=True, integrator="euler")
    gen = fs.sample(jax.random.fold_in(key, 7), dim=2, n_samples=4096, n_steps=100)
    print(f"FlowSampler(negate): mean radius "
          f"{float(jnp.mean(jnp.linalg.norm(gen, axis=-1))):.2f} (target 2.0)")

    # Generation route 2: the field as a scalar energy -> any MCMC sampler.
    e = EqMEnergy(field=field, energy_type="implicit")
    gd = GradientDescentSampler(e, step_size=0.02)
    modes = gd.sample(jax.random.fold_in(key, 8), dim=2, n_samples=2048,
                      n_steps=_common.n(300, 30))
    print(f"GD on EqMEnergy: mean radius "
          f"{float(jnp.mean(jnp.linalg.norm(modes, axis=-1))):.2f} (target 2.0)")

    lang = LangevinDynamics(e, step_size=0.01, noise_scale=0.3)
    mcmc = lang.sample(jax.random.fold_in(key, 9), x=modes,
                       n_steps=_common.n(200, 20))
    print(f"Langevin on EqMEnergy: mean radius "
          f"{float(jnp.mean(jnp.linalg.norm(mcmc, axis=-1))):.2f}")
    print("OK")


if __name__ == "__main__":
    main()

"""Energy Matching two-phase training on 2D data + temperature-swept generation.

Phase 1 (lambda_cd=0): OT flow warm-up of the potential. Phase 2: add the
contrastive term with Langevin negatives. Generation: one SDE sweep with a
TemperatureScheduler noise profile (Balcerak et al. 2025).
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
import _common

smoke = _common.setup()

import jax
import jax.numpy as jnp
import optax

from torchebm_tpu.core import TemperatureScheduler, WrappedEnergy
from torchebm_tpu.datasets import make_two_moons
from torchebm_tpu.losses import EnergyMatchingLoss
from torchebm_tpu.models import MLPEnergy
from torchebm_tpu.samplers import LangevinDynamics


def main():
    key = jax.random.PRNGKey(0)
    net = MLPEnergy(hidden_dims=(128, 128))
    params = net.init(key, jnp.zeros((1, 2)))
    energy = WrappedEnergy(fn=net.apply, params=params)

    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    def make_step(loss):
        @jax.jit
        def step(p, s, x, k):
            l, g = jax.value_and_grad(lambda pp: loss(pp, x, k))(p)
            u, s = opt.update(g, s)
            return optax.apply_updates(p, u), s, l
        return step

    warm = EnergyMatchingLoss(model=energy, lambda_cd=0.0, coupling="sinkhorn", sigma=0.05)
    joint = EnergyMatchingLoss(
        model=energy, lambda_cd=2.0, coupling="sinkhorn", sigma=0.05,
        n_langevin_steps=_common.n(200, 10),
    )

    for phase, loss, steps in (
        ("warm-up", warm, _common.n(1500, 15)),
        ("joint", joint, _common.n(500, 5)),
    ):
        step = make_step(loss)
        for i in range(steps):
            k = jax.random.fold_in(key, hash(phase) % 1000 + i)
            x1 = make_two_moons(k, 256, noise=0.05)
            params, opt_state, l = step(params, opt_state, x1, jax.random.fold_in(k, 1))
        print(f"{phase:8s} final loss {float(l):+.4f}")

    # generation: single temperature-swept Langevin pass t: 0 -> 1
    n_steps = _common.n(200, 20)
    temp = TemperatureScheduler(epsilon_max=0.15, tau_star=0.8, n_steps=n_steps)
    gen = LangevinDynamics(
        energy.replace(params=params), step_size=0.01, noise_scale=temp
    ).sample(jax.random.fold_in(key, 9), x=jax.random.normal(key, (1000, 2)), n_steps=n_steps)
    print(f"generated mean {jnp.mean(gen, 0)}  std {jnp.std(gen, 0)}")
    print("OK")


if __name__ == "__main__":
    main()

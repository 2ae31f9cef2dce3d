"""Energy Matching paper suite: 8 Gaussians -> two moons with diagnostics.

The paper-reproduction regression anchor (reference
``examples/20-training/04-energy-matching/02-energy-matching-paper-2d/main.py``):
the 2D experiments of arXiv:2504.10612 on the paper's own toy datasets. An
8-Gaussian ring is transported onto two moons by ONE time-independent
potential V(x), trained with the two-phase EM recipe (OT flow warm-up, then
contrastive sharpening; paper constants: eps_max 0.15, tau* 0.8, dt 0.01,
Sinkhorn reg 0.01, no CD trimming/clamp). Beyond generation quality this
covers the paper's toy diagnostics:

- **LID from the Hessian of V** (paper Sec. 3.3): flat (small-eigenvalue)
  directions of grad^2 V at data points are tangent to the manifold, so
  LID = d - rank(grad^2 V). The moons are curves -> true LID is 1. One
  ``jax.vmap(jax.hessian(...))`` + ``eigvalsh`` — no functorch machinery.
- **Diverse sampling with the repulsive interaction energy W**: 64 chains
  seeded at ONE point spread along the manifold (the paper's inverse-design
  mechanism), via :class:`~torchebm_tpu.models.InteractionModel`.

Each training phase and every sampling sweep compiles to a single XLA
program; phase 1 contains no Langevin chains at all (the ``lambda_cd=0``
branch is resolved at trace time).
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
import _common

smoke = _common.setup()

import math

import jax
import jax.numpy as jnp
import optax

from torchebm_tpu.core import TemperatureScheduler, WrappedEnergy
from torchebm_tpu.couplings import SinkhornCoupling
from torchebm_tpu.datasets import make_gaussian_mixture, make_two_moons
from torchebm_tpu.losses import EnergyMatchingLoss
from torchebm_tpu.models import InteractionModel, MLPEnergy
from torchebm_tpu.samplers import LangevinDynamics

FLOW_STEPS = _common.n(4000, 20)
JOINT_STEPS = _common.n(600, 5)
LANGEVIN_STEPS = _common.n(200, 10)  # negatives inside the CD term
SWEEP_STEPS = _common.n(200, 20)     # the generation SDE sweep


def moon_distance(p):
    """Distance to the nearest point of the two analytic moon arcs.

    ``make_two_moons`` (noise=0): outer arc = unit circle at the origin,
    angles [0, pi]; inner arc = reflected circle at (1, 0.5), angles
    [-pi, 0]. Returns (min distance, which arc) per point.
    """
    dists = []
    for cx, cy, lo, hi in ((0.0, 0.0, 0.0, math.pi), (1.0, 0.5, -math.pi, 0.0)):
        v = p - jnp.array([cx, cy])
        ang = jnp.clip(jnp.arctan2(v[:, 1], v[:, 0]), lo, hi)
        arc = jnp.stack([jnp.cos(ang) + cx, jnp.sin(ang) + cy], axis=-1)
        dists.append(jnp.linalg.norm(p - arc, axis=1))
    d = jnp.stack(dists, axis=1)
    return jnp.min(d, axis=1), jnp.argmin(d, axis=1)


def main():
    key = jax.random.PRNGKey(0)
    # The paper's toy marginals: source = 8-Gaussian ring, target = two moons.
    source = make_gaussian_mixture(
        jax.random.fold_in(key, 1), 8000, n_components=8, std=0.1, radius=2.5
    )
    target = make_two_moons(jax.random.fold_in(key, 2), 8000, noise=0.05)

    net = MLPEnergy(hidden_dims=(256, 256, 256))  # paper: 3x256 SiLU
    params = net.init(key, jnp.zeros((1, 2)))
    energy = WrappedEnergy(fn=net.apply, params=params)

    opt = optax.adam(1e-4)
    opt_state = opt.init(params)

    def make_loss(lambda_cd):
        return EnergyMatchingLoss(
            model=energy,
            coupling=SinkhornCoupling(reg=0.01),
            lambda_cd=lambda_cd,
            epsilon_max=0.15,
            tau_star=0.8,
            n_langevin_steps=LANGEVIN_STEPS,
            langevin_dt=0.01,
            cd_trim_fraction=0.0,
            cd_clamp=None,
        )

    def make_step(loss):
        @jax.jit
        def step(p, s, x1, x0, k):
            l, g = jax.value_and_grad(lambda pp: loss(pp, x1, k, x0=x0))(p)
            u, s = opt.update(g, s)
            return optax.apply_updates(p, u), s, l
        return step

    for phase, lam, steps in (("phase 1 (OT flow)", 0.0, FLOW_STEPS),
                              ("phase 2 (EM)", 2.0, JOINT_STEPS)):
        step = make_step(make_loss(lam))
        for i in range(steps):
            k = jax.random.fold_in(key, (0 if lam == 0 else 1 << 20) + i)
            k1, k0, kl = jax.random.split(k, 3)
            x1 = target[jax.random.randint(k1, (128,), 0, len(target))]
            x0 = source[jax.random.randint(k0, (128,), 0, len(source))]
            params, opt_state, l = step(params, opt_state, x1, x0, kl)
        print(f"{phase:18s} final loss {float(l):+.4f}")

    model = energy.replace(params=params)

    # --- Generation: one SDE sweep t: 0 -> 1 starting FROM THE SOURCE. -----
    temp = TemperatureScheduler(
        epsilon_max=0.15, tau_star=0.8, n_steps=SWEEP_STEPS, t_end=1.0
    )
    start = source[jax.random.permutation(jax.random.fold_in(key, 3), len(source))[:4000]]
    samples = LangevinDynamics(model, step_size=0.01, noise_scale=temp).sample(
        jax.random.fold_in(key, 4), x=start, n_steps=SWEEP_STEPS
    )
    dist, arc = moon_distance(samples)
    outer = float(jnp.mean((arc == 0).astype(jnp.float32)))
    print(
        f"transport 8 Gaussians -> moons: median distance {float(jnp.median(dist)):.3f}"
        f"  within 0.15: {float(jnp.mean((dist < 0.15).astype(jnp.float32))):.1%}"
        f"  outer/inner split: {outer:.1%}/{1 - outer:.1%}"
    )

    # --- Local intrinsic dimension from the Hessian of V (paper Sec. 3.3). --
    def hessian_eigs(points):
        v_single = lambda p: model.energy(p[None, :])[0]
        return jnp.linalg.eigvalsh(jax.vmap(jax.hessian(v_single))(points))

    eig_data = hessian_eigs(target[:512])
    # per-point relative threshold against the stiffest eigenvalue
    rank = jnp.sum(
        eig_data > 0.3 * jnp.clip(eig_data[:, 1:], 1e-6, None), axis=1
    )
    lid_data = 2.0 - rank.astype(jnp.float32)
    box = (
        jax.random.uniform(jax.random.fold_in(key, 5), (512, 2)) * 4.0
        - jnp.array([1.5, 1.5])
    )
    eig_box = hessian_eigs(box)
    print(
        f"LID at data points: mean {float(jnp.mean(lid_data)):.2f} (true manifold dim: 1)"
        f"   stiff-eigenvalue medians: data {float(jnp.median(eig_data[:, 1])):.1f}"
        f" vs off-manifold {float(jnp.median(eig_box[:, 1])):.1f}"
    )

    # --- Diverse generation: repulsive interaction energy W. ---------------
    # 64 chains from ONE point at eps_max; the repulsion spreads them along
    # the manifold (the paper's inverse-design mechanism).
    one_point = jnp.broadcast_to(target[:1], (64, 2))
    noise_scale = math.sqrt(0.15)
    plain = LangevinDynamics(model, step_size=0.01, noise_scale=noise_scale).sample(
        jax.random.fold_in(key, 6), x=one_point, n_steps=SWEEP_STEPS
    )
    repulsive = InteractionModel(model, sigma_w=4.0, strength=0.15)
    diverse = LangevinDynamics(
        repulsive, step_size=0.01, noise_scale=noise_scale
    ).sample(jax.random.fold_in(key, 7), x=one_point, n_steps=SWEEP_STEPS)

    def mean_pairwise(x):
        d = jnp.linalg.norm(x[:, None, :] - x[None, :, :], axis=-1)
        n = x.shape[0]
        return float(jnp.sum(d) / (n * (n - 1)))

    print(
        f"diversity (mean pairwise distance) from one seed point:"
        f"  plain {mean_pairwise(plain):.2f}  vs  repulsive {mean_pairwise(diverse):.2f}"
    )
    print("OK")


if __name__ == "__main__":
    main()

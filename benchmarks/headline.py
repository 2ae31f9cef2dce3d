#!/usr/bin/env python
"""Headline BASELINE-config benchmarks: the five driver workloads + ESS/s.

Measures the build targets from ``/root/repo/BASELINE.json`` (north-star
metric: "Langevin/HMC samples/s/chip (8gaussians, CD-MNIST); ESS/s; scaling
eff at N hosts"):

1. ``langevin_8gaussians``  — 10k chains x 1k steps on the 8gaussians mixture
   → chain-updates/s (same workload as repo-root ``bench.py``).
2. ``hmc_ess``              — dual-averaged-warmup HMC on a correlated 2D
   Gaussian → ESS/s (min over dims of split-chain effective sample size).
3. ``cd_train_2d``          — CD-10 training step (Langevin negatives, MLP
   energy, batch 256) → steps/s.
4. ``pcd_mnist_conv``       — persistent CD step with a conv energy on
   28x28 images (batch 64, k=40, replay buffer 4096) → steps/s.
5. ``flow``                 — flow-matching loss step (Sinkhorn-coupled,
   batch 256) → steps/s, and FlowSampler ODE generation (euler, 50 steps,
   4096 samples) → samples/s.

Run plainly for the real TPU (axon sitecustomize picks it), or
``--cpu`` to force the host backend. Writes a JSON report next to the
pytest-benchmark results::

    python benchmarks/headline.py [--cpu] [--iters 5] [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def _median_time(fn, iters: int) -> float:
    import jax

    jax.block_until_ready(fn(0))  # compile + warmup
    times = []
    for i in range(1, iters + 1):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(i))
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def bench_langevin(iters: int) -> dict:
    import jax

    from torchebm_tpu.core import GaussianMixtureEnergy
    from torchebm_tpu.samplers import LangevinDynamics

    chains, steps = 10_000, 1_000
    key = jax.random.PRNGKey(0)
    sampler = LangevinDynamics(GaussianMixtureEnergy.eight_gaussians(), step_size=0.05)

    def run(i):
        return sampler.sample(jax.random.fold_in(key, i), dim=2, n_samples=chains, n_steps=steps)

    med = _median_time(run, iters)
    return {"updates_per_s": chains * steps / med, "median_s": med,
            "config": f"{chains} chains x {steps} steps, 8gaussians"}


def bench_hmc_ess(iters: int) -> dict:
    import jax
    import jax.numpy as jnp

    from torchebm_tpu.core import GaussianEnergy
    from torchebm_tpu.samplers import HamiltonianMonteCarlo, summarize_chains

    cov = jnp.array([[1.0, 0.8], [0.8, 1.0]])
    energy = GaussianEnergy.create(mean=jnp.zeros(2), cov=cov)
    hmc = HamiltonianMonteCarlo(
        energy, step_size=0.2, n_leapfrog_steps=8, dual_averaging=True
    )
    key = jax.random.PRNGKey(0)
    chains, steps = 256, 1_000
    x0, eps = hmc.warmup(key, dim=2, n_warmup=200, n_samples=chains)
    tuned = hmc.replace(step_size=eps)

    def run(i):
        return tuned.sample(
            jax.random.fold_in(key, i), x=x0, n_steps=steps, return_trajectory=True
        )

    med = _median_time(run, iters)
    traj = run(0)
    ess = float(jnp.min(summarize_chains(traj)["ess"]))
    return {"ess_per_s": ess / med, "min_ess": ess, "median_s": med,
            "adapted_step_size": eps,
            "config": f"{chains} chains x {steps} draws, corr-Gaussian, dual-averaged"}


def _cd_step_factory(energy_net, data_shape, batch, k_steps, step_size,
                     persistent, buffer_size, key, clamp=None):
    import jax
    import optax

    import jax.numpy as jnp
    from torchebm_tpu.core import WrappedEnergy
    from torchebm_tpu.losses import ContrastiveDivergence
    from torchebm_tpu.samplers import LangevinDynamics

    params = energy_net.init(key, jnp.zeros((1, *data_shape)))
    energy = WrappedEnergy(fn=energy_net.apply, params=params)
    sampler = LangevinDynamics(energy, step_size=step_size, clamp=clamp)
    cd = ContrastiveDivergence(
        model=energy, sampler=sampler, k_steps=k_steps,
        persistent=persistent, buffer_size=buffer_size, init_steps=0,
    )
    buffer = cd.init_buffer(key, data_shape) if persistent else None
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, b, x, k):
        (l, (_, b2)), g = jax.value_and_grad(lambda pp: cd(pp, x, k, b), has_aux=True)(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, b2, l

    data = jax.random.normal(key, (batch, *data_shape))

    def run(i):
        k = jax.random.fold_in(key, i)
        p, s, b, l = step(params, opt_state, buffer, data, k)
        return l

    return run


def bench_cd_2d(iters: int) -> dict:
    import jax

    from torchebm_tpu.models import MLPEnergy

    key = jax.random.PRNGKey(0)
    run = _cd_step_factory(
        MLPEnergy(hidden_dims=(128, 128)), (2,), batch=256, k_steps=10,
        step_size=0.01, persistent=False, buffer_size=0, key=key,
    )
    med = _median_time(run, iters)
    return {"steps_per_s": 1.0 / med, "median_s": med,
            "config": "CD-10 Langevin negatives, MLP(128,128), batch 256, 2D"}


def bench_pcd_mnist(iters: int) -> dict:
    import jax

    from torchebm_tpu.models import ConvEnergy2D

    key = jax.random.PRNGKey(0)
    run = _cd_step_factory(
        ConvEnergy2D(channels=(32, 64, 64)), (1, 28, 28), batch=64, k_steps=40,
        step_size=10.0, persistent=True, buffer_size=4096, key=key,
        clamp=(-1.0, 1.0),
    )
    med = _median_time(run, iters)
    return {"steps_per_s": 1.0 / med, "median_s": med,
            "config": "PCD k=40, ConvEnergy2D, batch 64, 28x28, buffer 4096"}


def bench_flow(iters: int) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from torchebm_tpu.couplings import SinkhornCoupling
    from torchebm_tpu.interpolants import LinearInterpolant
    from torchebm_tpu.losses import EquilibriumMatchingLoss
    from torchebm_tpu.models import MLPVelocityField
    from torchebm_tpu.samplers import FlowSampler
    from torchebm_tpu.samplers.flow import WrappedField

    key = jax.random.PRNGKey(0)
    batch = 256
    net = MLPVelocityField(hidden_dims=(128, 128, 128))
    params = net.init(key, jnp.zeros((1, 2)), jnp.zeros((1,)))
    field = WrappedField(fn=net.apply, params=params)
    loss = EquilibriumMatchingLoss(
        model=field,
        interpolant=LinearInterpolant(),
        coupling=SinkhornCoupling(n_iters=50, reg=0.05),
    )
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(p, s, x, k):
        l, g = jax.value_and_grad(lambda pp: loss(pp, x, k))(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, l

    data = jax.random.normal(key, (batch, 2)) + jnp.array([2.0, 0.0])

    def run_train(i):
        p, s, l = train_step(params, opt_state, data, jax.random.fold_in(key, i))
        return l

    med_train = _median_time(run_train, iters)

    flow = FlowSampler(model=field, integrator="euler", negate_velocity=True)
    n_gen, n_steps = 4096, 50

    def run_gen(i):
        return flow.sample(jax.random.fold_in(key, i), dim=2, n_samples=n_gen, n_steps=n_steps)

    med_gen = _median_time(run_gen, iters)
    return {
        "train_steps_per_s": 1.0 / med_train,
        "gen_samples_per_s": n_gen / med_gen,
        "median_train_s": med_train,
        "median_gen_s": med_gen,
        "config": f"EqM+Sinkhorn batch {batch}; ODE euler {n_steps} steps x {n_gen}",
    }


BENCHES = {
    "langevin_8gaussians": bench_langevin,
    "hmc_ess": bench_hmc_ess,
    "cd_train_2d": bench_cd_2d,
    "pcd_mnist_conv": bench_pcd_mnist,
    "flow": bench_flow,
}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--only", default="", help="comma-separated subset of benches")
    ap.add_argument("--out", default=os.path.join(HERE, "results", "headline.json"))
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:  # persistent compile cache: repeat runs skip the (remote) compiles
        jax.config.update(
            "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    backend = jax.devices()[0].platform

    selected = [s for s in args.only.split(",") if s] or list(BENCHES)
    report = {"backend": backend, "iters": args.iters, "results": {}}
    for name in selected:
        t0 = time.perf_counter()
        res = BENCHES[name](args.iters)
        res["total_bench_s"] = time.perf_counter() - t0
        report["results"][name] = res
        print(f"{name:24s} {json.dumps(res)}")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"report -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

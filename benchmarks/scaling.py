#!/usr/bin/env python
"""Chain-throughput scaling over an N-device mesh (BASELINE scaling target).

Runs the headline Langevin workload (8gaussians mixture) with chains sharded
over a 1-D ``("data",)`` mesh at device counts 1, 2, 4, … and reports
updates/s plus scaling efficiency ``thru_N / (N * thru_1)`` (BASELINE target:
≥80% linear to a 2-host v5e slice).

Meaningful numbers require real chips (run on a multi-chip slice; under
multi-host, start one process per host — ``init_distributed`` no-ops on a
single process). With ``--cpu`` the virtual host-platform devices share the
same cores, so efficiency is NOT meaningful there — the flag exists to
validate that the sharded program compiles and runs (the same role as the
CPU mesh in ``tests/parallel``).

    python benchmarks/scaling.py [--cpu] [--chains 65536] [--steps 200]
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


def run_at(n_devices: int, chains: int, steps: int, iters: int) -> float:
    import jax

    from torchebm_tpu.core import GaussianMixtureEnergy
    from torchebm_tpu.parallel import make_mesh, shard_batch
    from torchebm_tpu.samplers import LangevinDynamics

    mesh = make_mesh(("data",), devices=jax.devices()[:n_devices])
    sampler = LangevinDynamics(GaussianMixtureEnergy.eight_gaussians(), step_size=0.05)
    key = jax.random.PRNGKey(0)
    x0 = shard_batch(jax.random.normal(key, (chains, 2)), mesh)

    import numpy as np

    def run(n, i):
        return sampler.sample(jax.random.fold_in(key, i), x=x0, n_steps=n)

    def med(n):
        # host-fetch fence: under the axon tunnel block_until_ready can
        # return before the remote computation finishes
        np.asarray(run(n, 0))  # compile + warmup
        times = []
        for i in range(1, iters + 1):
            t0 = time.perf_counter()
            np.asarray(run(n, i))
            times.append(time.perf_counter() - t0)
        return statistics.median(times)

    # two-point slope cancels the fixed per-call round-trip + fetch cost
    dt = med(5 * steps) - med(steps)
    if dt <= 0:
        dt = med(5 * steps) / 5
    return chains * 4 * steps / dt


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cpu", action="store_true",
                    help="8 virtual host devices (compile/run validation only)")
    ap.add_argument("--chains", type=int, default=65536)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default=os.path.join(HERE, "results", "scaling.json"))
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
        )
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from torchebm_tpu.parallel import init_distributed

    pi, pc = init_distributed()
    n_total = len(jax.devices())
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_total]
    if args.chains % max(counts) != 0:
        raise SystemExit(f"--chains must be divisible by {max(counts)}")

    backend = jax.devices()[0].platform
    print(f"backend={backend} devices={n_total} hosts={pc}")
    results = {}
    base = None
    for n in counts:
        thru = run_at(n, args.chains, args.steps, args.iters)
        base = thru if base is None else base
        eff = thru / (n * base)
        results[str(n)] = {"updates_per_s": thru, "efficiency": eff}
        print(f"devices={n:3d}  {thru:12.3e} updates/s  efficiency {eff:5.1%}")
    if backend == "cpu":
        print("NOTE: virtual CPU devices share host cores; efficiency is not "
              "meaningful on this backend (validation run only).")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"backend": backend, "devices": n_total, "hosts": pc,
                   "chains": args.chains, "steps": args.steps,
                   "results": results}, f, indent=2)
    print(f"report -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

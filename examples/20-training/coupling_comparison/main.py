"""Coupling comparison: how pairing noise with data changes the flow problem.

Mirrors the reference's coupling lesson
(``examples/20-training/05-couplings/01-coupling-comparison``): run the same
(x0, x1) batch through every coupling and compare mean transport cost and
wall time. Straighter pairings (lower cost) mean straighter probability-flow
trajectories and fewer ODE steps at generation time. All solvers here are
pure jittable JAX — Sinkhorn runs happily *inside* a compiled train step.
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
import _common

smoke = _common.setup()

import time

import jax
import jax.numpy as jnp

from torchebm_tpu.couplings import (
    ExactOTCoupling,
    GreedyCoupling,
    IndependentCoupling,
    ReflowCoupling,
    SinkhornCoupling,
    UnbalancedSinkhornCoupling,
)
from torchebm_tpu.datasets import make_8gaussians


def transport_cost(res):
    return float(jnp.mean(jnp.sum((res.x1 - res.x0) ** 2, axis=-1)))


def main():
    key = jax.random.PRNGKey(0)
    n = 128 if smoke else 256
    x0 = jax.random.normal(key, (n, 2))
    x1 = make_8gaussians(jax.random.fold_in(key, 1), n, std=0.3, scale=2.0)

    couplings = {
        "independent": IndependentCoupling(),
        "greedy": GreedyCoupling(),
        "sinkhorn (reg .05)": SinkhornCoupling(reg=0.05),
        "unbalanced sinkhorn": UnbalancedSinkhornCoupling(reg=0.05, reg_marginal=1.0),
        "exact OT (auction)": ExactOTCoupling(),
    }

    print(f"{'coupling':22s} {'E||x1-x0||^2':>14s} {'ms/call':>9s}  notes")
    for name, c in couplings.items():
        fn = jax.jit(lambda k, _c=c: _c(x0, x1, key=k))
        res = jax.block_until_ready(fn(key))  # compile
        t0 = time.perf_counter()
        reps = 3 if smoke else 10
        for r in range(reps):
            res = jax.block_until_ready(fn(jax.random.fold_in(key, r)))
        ms = (time.perf_counter() - t0) / reps * 1e3
        notes = ""
        if res.weights is not None:
            w = res.weights
            notes = (f"per-pair weights: min {float(jnp.min(w)):.3f} "
                     f"max {float(jnp.max(w)):.3f} (mass relaxation)")
        # x0 marginal is always preserved — only x1 is re-ordered/resampled
        assert jnp.allclose(res.x0, x0), "coupling must not disturb x0"
        print(f"{name:22s} {transport_cost(res):14.4f} {ms:9.2f}  {notes}")

    # Model-induced coupling (reflow): x1 = Phi(x0) from any transport map.
    reflow = ReflowCoupling(model=lambda x: x * 0.5 + 1.0)
    res = reflow(x0, key=key)
    print(f"{'reflow (model map)':22s} {transport_cost(res):14.4f} "
          f"{'—':>9s}  x1 = Phi(x0), pairs are perfectly straight by construction")
    print("OK")


if __name__ == "__main__":
    main()

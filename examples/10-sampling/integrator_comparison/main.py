"""Integrator comparison on a closed-form ODE.

Mirrors the reference's integrator-comparison lesson
(``examples/10-sampling/02-integrators/01-integrator-comparison``): integrate
the 2D harmonic oscillator x'' = -x (as a first-order system) with methods of
increasing order, against the exact rotation solution, and read the
convergence order off the error-vs-h slope. Every integrator here is the
same object a sampler would use, compiled into one ``lax.scan``.
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
import _common

smoke = _common.setup()

import math

import jax
import jax.numpy as jnp

from torchebm_tpu.integrators import (
    Dopri5Integrator,
    HeunIntegrator,
    MidpointIntegrator,
    RK4Integrator,
    get_integrator,
)


def drift(x, t):
    """Harmonic oscillator as a 2D rotation: d/dt (q, p) = (p, -q)."""
    q, p = x[..., 0], x[..., 1]
    return jnp.stack([p, -q], axis=-1)


def exact(x0, t):
    c, s = math.cos(t), math.sin(t)
    rot = jnp.array([[c, s], [-s, c]])
    return x0 @ rot.T


def main():
    x0 = jnp.array([[1.0, 0.0], [0.5, -0.5]], dtype=jnp.float64
                   if jax.config.jax_enable_x64 else jnp.float32)
    t_end = 2.0 * math.pi  # one full period: solution returns to x0
    ref = exact(x0, t_end)

    # "euler" and "heun" register as SDE-family methods; with noise_scale=0
    # they are the deterministic Euler / trapezoidal-Heun ODE methods.
    det = dict(key=jax.random.PRNGKey(0), noise_scale=0.0)
    methods = {
        "euler (order 1)": (get_integrator("euler"), det),
        "midpoint (order 2)": (MidpointIntegrator(), dict(adaptive=False)),
        "heun (order 2)": (HeunIntegrator(), det),
        "rk4 (order 4)": (RK4Integrator(), dict(adaptive=False)),
    }
    # coarse grids: fine enough to converge, coarse enough that 4th-order
    # error stays above float32 roundoff (so the measured slope is clean)
    grids = [16, 32, 64] if smoke else [16, 32, 64, 128, 256]

    print(f"{'method':22s} " + " ".join(f"n={n:<8d}" for n in grids) + " slope")
    for name, (integ, kw) in methods.items():
        errs = []
        for n in grids:
            out = integ.integrate({"x": x0}, t_end / n, n, drift=drift, **kw)
            errs.append(float(jnp.max(jnp.abs(out["x"] - ref))))
        # empirical order = -slope of log(err) vs log(h); h halves each grid
        slopes = [math.log(errs[i] / errs[i + 1]) / math.log(2.0)
                  for i in range(len(errs) - 1)]
        order = sum(slopes) / len(slopes)
        print(f"{name:22s} " + " ".join(f"{e:.2e} " for e in errs)
              + f" ~{order:.2f}")

    # Adaptive dopri5: the step-size controller runs on-device in a
    # lax.while_loop — no per-step host sync (reference does one .item()
    # per attempted step, ``base_integrator.py:481-483``).
    dp = Dopri5Integrator(rtol=1e-6, atol=1e-9)
    out, stats = dp.integrate({"x": x0}, 0.1, t=jnp.array([0.0, t_end]),
                              drift=drift, return_stats=True)
    err = float(jnp.max(jnp.abs(out["x"] - ref)))
    print(f"dopri5 adaptive: err {err:.2e} in {int(stats.n_accepted)} accepted "
          f"/ {int(stats.n_attempted)} attempted steps")
    print("OK")


if __name__ == "__main__":
    main()

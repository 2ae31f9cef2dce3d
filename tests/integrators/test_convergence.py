r"""Empirical convergence-order tests on closed-form ODEs.

The reference's signature integrator test (``test_rk4.py:491`` and siblings):
integrate :math:`\dot x = -x` (solution :math:`e^{-t}`) and the driven system
:math:`\dot x = \cos t` at two step sizes; the log2 error ratio estimates the
order.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from torchebm_tpu.integrators import get_integrator

# name -> expected deterministic order
EXPECTED_ORDER = {
    "euler": 1,
    "backward_euler": 1,
    "heun": 2,
    "midpoint": 2,
    "adaptive_heun": 2,
    "bosh3": 3,
    "rk4": 4,
    "rk438": 4,
    "dopri5": 5,
}


def _solve_error(name, n_steps, t_end=1.0):
    integ = get_integrator(name)
    x0 = jnp.ones((1, 1))
    h = t_end / n_steps
    kwargs = dict(drift=lambda x, t: -x, adaptive=False)
    if integ.family == "sde":
        import jax

        kwargs.update(key=jax.random.PRNGKey(0), noise_scale=0.0)
    out = integ.integrate({"x": x0}, h, n_steps, **kwargs)
    return abs(float(out["x"][0, 0]) - math.exp(-t_end))


@pytest.mark.parametrize("name,p", sorted(EXPECTED_ORDER.items()))
def test_convergence_order(name, p):
    # step halving: error ratio ~ 2^p
    # Coarser grids for higher orders: fine grids hit the float32 roundoff
    # floor before the truncation error does.
    if p >= 5:
        n1, n2 = 2, 4
    elif p >= 3:
        n1, n2 = 8, 16
    else:
        n1, n2 = 32, 64
    e1, e2 = _solve_error(name, n1), _solve_error(name, n2)
    observed = math.log2(e1 / e2)
    assert observed > p - 0.55, f"{name}: observed order {observed:.2f}, expected ≥ {p}"


@pytest.mark.parametrize("name", sorted(EXPECTED_ORDER))
def test_nonautonomous_exactness(name):
    r"""Driven ODE :math:`\dot x = \cos t`: checks c-node time offsets are honored."""
    integ = get_integrator(name)
    n_steps, t_end = 64, 1.0
    kwargs = dict(drift=lambda x, t: jnp.cos(t) * jnp.ones_like(x), adaptive=False)
    if integ.family == "sde":
        import jax

        kwargs.update(key=jax.random.PRNGKey(0), noise_scale=0.0)
    out = integ.integrate({"x": jnp.zeros((1, 1))}, t_end / n_steps, n_steps, **kwargs)
    err = abs(float(out["x"][0, 0]) - math.sin(t_end))
    p = EXPECTED_ORDER[name]
    # generous per-order tolerance; order-1 methods are the loosest
    assert err < 10.0 * (t_end / n_steps) ** min(p, 3), f"{name}: err {err}"


def test_dopri8_high_accuracy():
    """dopri8 in fixed-step mode at coarse h should already hit float32 floor."""
    integ = get_integrator("dopri8")
    out = integ.integrate(
        {"x": jnp.ones((1, 1))}, 0.25, 4, drift=lambda x, t: -x, adaptive=False
    )
    assert abs(float(out["x"][0, 0]) - math.exp(-1.0)) < 1e-6

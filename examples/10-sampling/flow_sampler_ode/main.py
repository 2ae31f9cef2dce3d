r"""FlowSampler 101: ODE generation with a known-exact velocity field.

Mirrors the reference's flow-sampler lesson
(``examples/10-sampling/03-flow/01-flow-sampler-ode``). For the linear path
x_t = t x1 + (1-t) x0 with x0 ~ N(0, I) and x1 ~ N(mu, s^2 I), the marginal
velocity is available in closed form:

    v(t)  = t^2 s^2 + (1-t)^2                       (marginal variance)
    u(x,t) = ((t s^2 - (1-t)) / v(t)) (x - t mu) + mu

so the ODE can be studied with no training at all: fidelity is purely a
property of the integrator and step count.
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
import _common

smoke = _common.setup()

import jax
import jax.numpy as jnp

from torchebm_tpu.samplers import FlowSampler

MU = jnp.array([2.0, -1.0])
S = 0.5


def exact_velocity(x, t, **_):
    t = jnp.reshape(t, (-1,) + (1,) * (x.ndim - 1))
    v = t**2 * S**2 + (1.0 - t) ** 2
    return ((t * S**2 - (1.0 - t)) / v) * (x - t * MU) + MU


def wasserstein2_gaussian(x):
    """W2 distance between the empirical Gaussian fit of x and N(MU, S^2 I)."""
    mu_hat = jnp.mean(x, 0)
    cov_hat = jnp.cov(x.T)
    # diagonal approx: W2^2 = |mu - mu_hat|^2 + sum (sqrt(var) - S)^2
    var = jnp.diag(cov_hat)
    return jnp.sqrt(jnp.sum((mu_hat - MU) ** 2)
                    + jnp.sum((jnp.sqrt(var) - S) ** 2))


def main():
    key = jax.random.PRNGKey(0)
    n = 2000 if smoke else 20_000

    print("fixed-step Euler: error vs step count (first-order in 1/n_steps)")
    for n_steps in ([2, 8, 32] if smoke else [1, 2, 4, 8, 16, 64, 256]):
        fs = FlowSampler(model=exact_velocity, integrator="euler")
        x = fs.sample(key, dim=2, n_samples=n, n_steps=n_steps)
        print(f"  n_steps {n_steps:4d}: W2 to target {float(wasserstein2_gaussian(x)):.4f}")

    # Adaptive dopri5 (the default): error controlled by tolerance, not grid.
    fs = FlowSampler(model=exact_velocity)
    x = fs.sample(key, dim=2, n_samples=n)
    print(f"adaptive dopri5: W2 {float(wasserstein2_gaussian(x)):.4f}  "
          f"mean {jnp.mean(x, 0)}  std {jnp.std(x, 0)} (target {MU}, {S})")

    # Reverse transport: data -> noise through the same field (s = t - t0).
    fs_rev = FlowSampler(model=exact_velocity, reverse=True)
    z = fs_rev.sample(key, x=x, n_steps=50)
    print(f"reverse ODE: mean {jnp.mean(z, 0)}  std {jnp.std(z, 0)} "
          "(target 0, 1)")

    # prior_logp: exact standard-normal log-density of the latent codes.
    lp = fs.prior_logp(z)
    print(f"prior logp of round-tripped latents: {float(jnp.mean(lp)):.3f} "
          f"(analytic E[log N(z)] for d=2 is {-1.0 - jnp.log(2*jnp.pi):.3f})")
    print("OK")


if __name__ == "__main__":
    main()

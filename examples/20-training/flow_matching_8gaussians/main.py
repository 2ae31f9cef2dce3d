"""Flow matching with OT couplings on 8gaussians + FlowSampler ODE generation.

The minimum end-to-end slice (SURVEY section 7): couple -> draw t ->
interpolate -> regress the conditional velocity -> generate by integrating
the learned ODE.
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
import _common

smoke = _common.setup()

import jax
import jax.numpy as jnp
import optax

from torchebm_tpu.couplings import SinkhornCoupling
from torchebm_tpu.datasets import make_8gaussians
from torchebm_tpu.interpolants import LinearInterpolant
from torchebm_tpu.models import MLPVelocityField
from torchebm_tpu.samplers import FlowSampler
from torchebm_tpu.samplers.flow import WrappedField


def main():
    key = jax.random.PRNGKey(0)
    net = MLPVelocityField(hidden_dims=(256, 256, 256))
    params = net.init(key, jnp.zeros((1, 2)), jnp.zeros((1,)))
    interp = LinearInterpolant()
    coupling = SinkhornCoupling(reg=0.05)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    def loss_fn(p, x1, k):
        k0, kc, kt = jax.random.split(k, 3)
        x0 = jax.random.normal(k0, x1.shape)
        res = coupling(x0, x1, key=kc)
        t = jax.random.uniform(kt, (x1.shape[0],))
        xt, ut = interp.interpolate(res.x0, res.x1, t)
        pred = net.apply(p, xt, t)
        return jnp.mean(jnp.square(pred - ut))

    @jax.jit
    def step(p, s, x1, k):
        l, g = jax.value_and_grad(loss_fn)(p, x1, k)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, l

    steps = _common.n(3000, 30)
    for i in range(steps):
        k = jax.random.fold_in(key, i)
        x1 = make_8gaussians(k, 256, std=0.1, scale=2.0)
        params, opt_state, loss = step(params, opt_state, x1, jax.random.fold_in(k, 1))
        if i % max(steps // 5, 1) == 0 or i == steps - 1:
            print(f"step {i:5d}  flow-matching loss {float(loss):.4f}")

    sampler = FlowSampler(model=WrappedField(fn=net.apply, params=params))
    gen = sampler.sample(jax.random.fold_in(key, 7), dim=2, n_samples=2000)
    r = jnp.linalg.norm(gen, axis=-1)
    print(f"generated mean radius {float(jnp.mean(r)):.2f} (target 2.0), "
          f"std {float(jnp.std(gen)):.2f}")
    print("OK")


if __name__ == "__main__":
    main()

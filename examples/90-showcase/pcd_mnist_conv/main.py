"""Persistent CD with a conv energy on MNIST(-like) images.

BASELINE config 4. Uses real MNIST idx files when available locally; the
zero-egress environment falls back to sklearn's bundled digits upsampled to
28x28 (see torchebm_tpu.datasets.images).
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
import _common

smoke = _common.setup()

import jax
import jax.numpy as jnp
import optax

from torchebm_tpu.core import WrappedEnergy
from torchebm_tpu.datasets import load_mnist
from torchebm_tpu.losses import ContrastiveDivergence
from torchebm_tpu.models import ConvEnergy2D
from torchebm_tpu.samplers import LangevinDynamics


def main():
    key = jax.random.PRNGKey(0)
    images, _ = load_mnist("train")
    if smoke:
        images = images[:256]
    print(f"dataset: {images.shape}")

    net = ConvEnergy2D(channels=(16, 32) if smoke else (32, 64, 64))
    params = net.init(key, jnp.zeros((1, 1, 28, 28)))
    energy = WrappedEnergy(fn=net.apply, params=params)
    sampler = LangevinDynamics(energy, step_size=10.0, noise_scale=0.005, clamp=(-1.0, 1.0))
    pcd = ContrastiveDivergence(
        model=energy, sampler=sampler, k_steps=_common.n(40, 4),
        persistent=True, buffer_size=512 if smoke else 4096, init_steps=0,
        new_sample_ratio=0.05,
    )
    buffer = pcd.init_buffer(key, images.shape[1:])
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, b, x, k):
        (l, (neg, b2)), g = jax.value_and_grad(lambda pp: pcd(pp, x, k, b), has_aux=True)(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, b2, l, neg

    steps = _common.n(300, 3)
    batch = 64
    for i in range(steps):
        k = jax.random.fold_in(key, i)
        idx = jax.random.randint(k, (batch,), 0, images.shape[0])
        params, opt_state, buffer, loss, neg = step(
            params, opt_state, buffer, images[idx], jax.random.fold_in(k, 1)
        )
        if i % max(steps // 5, 1) == 0 or i == steps - 1:
            e = energy.replace(params=params)
            print(f"step {i:4d}  loss {float(loss):+.4f}  "
                  f"E+ {float(jnp.mean(e(images[idx]))):+.3f}  "
                  f"E- {float(jnp.mean(e(neg))):+.3f}")
    print("OK")


if __name__ == "__main__":
    main()

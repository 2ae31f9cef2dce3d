"""Denoising score matching: train an EBM with zero sampling in the loop.

Mirrors the reference's DSM lesson
(``examples/20-training/02-score-matching/01-denoising-score-matching``):
perturb data with sigma-noise, regress the model score onto -noise/sigma^2
(Vincent 2011), then sample the learned energy with Langevin dynamics. The
score is an exact ``jax.grad`` through the energy — the double-backward that
needs ``create_graph=True`` plumbing in torch is just composed autodiff here.
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
from torchebm_tpu.datasets import TwoMoonsDataset
from torchebm_tpu.losses import DenoisingScoreMatching
from torchebm_tpu.models import MLPEnergy
from torchebm_tpu.samplers import LangevinDynamics


def main():
    key = jax.random.PRNGKey(0)
    ds = TwoMoonsDataset(n_samples=4000, noise=0.05, seed=0)

    net = MLPEnergy(hidden_dims=(128, 128))
    params = net.init(key, jnp.zeros((1, 2)))
    energy = WrappedEnergy(fn=net.apply, params=params)
    # sigma trades bias for conditioning: the learned density is the data
    # convolved with N(0, sigma^2)
    dsm = DenoisingScoreMatching(model=energy, noise_scale=0.1)

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, x, k):
        loss, grads = jax.value_and_grad(dsm)(params, x, k)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    steps = _common.n(2000, 20)
    for i in range(steps):
        k = jax.random.fold_in(key, i)
        x = ds.get_data()[jax.random.randint(k, (256,), 0, len(ds))]
        params, opt_state, loss = train_step(params, opt_state, x, jax.random.fold_in(k, 1))
        if i % max(steps // 5, 1) == 0 or i == steps - 1:
            print(f"step {i:5d}  DSM loss {float(loss):.2f}")

    # No MCMC was used for training; now use MCMC for generation.
    e = energy.replace(params=params)
    sampler = LangevinDynamics(e, step_size=5e-4, clamp=(-3.0, 3.0))
    gen = sampler.sample(jax.random.fold_in(key, 7),
                         x=jax.random.normal(key, (2048, 2)) * 0.5 + jnp.array([0.5, 0.25]),
                         n_steps=_common.n(2000, 50))

    data = ds.get_data()
    print(f"data mean {jnp.mean(data, 0)}  std {jnp.std(data, 0)}")
    print(f"gen  mean {jnp.mean(gen, 0)}  std {jnp.std(gen, 0)}")
    on = float(jnp.mean(e(data[:512])))
    off = float(jnp.mean(e(jnp.full((512, 2), 3.0))))
    print(f"E[data]={on:.3f}  E[off-manifold]={off:.3f}  (data should be lower)")
    assert on < off, "DSM energy must be lower at data than off-manifold"
    print("OK")


if __name__ == "__main__":
    main()

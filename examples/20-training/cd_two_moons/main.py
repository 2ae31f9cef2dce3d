"""Contrastive-divergence training of an MLP energy on two moons."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
import _common

smoke = _common.setup()

import jax
import jax.numpy as jnp
import optax

from torchebm_tpu.core import WrappedEnergy
from torchebm_tpu.core.trainer import ContrastiveDivergenceTrainer
from torchebm_tpu.datasets import TwoMoonsDataset
from torchebm_tpu.losses import ContrastiveDivergence
from torchebm_tpu.models import MLPEnergy
from torchebm_tpu.samplers import LangevinDynamics


def main():
    key = jax.random.PRNGKey(0)
    ds = TwoMoonsDataset(n_samples=2000, noise=0.05, seed=0)

    net = MLPEnergy(hidden_dims=(128, 128))
    params = net.init(key, jnp.zeros((1, 2)))
    energy = WrappedEnergy(fn=net.apply, params=params)
    cd = ContrastiveDivergence(
        model=energy,
        sampler=LangevinDynamics(energy, step_size=0.01),
        k_steps=_common.n(30, 5),
        persistent=True,
        buffer_size=2048,
        init_steps=0,
    )
    trainer = ContrastiveDivergenceTrainer(cd, learning_rate=1e-3, ema_decay=0.999)
    state = trainer.init_state(params, key, loss_state=cd.init_buffer(key, (2,)))

    epochs = _common.n(20, 1)
    for epoch in range(epochs):
        state, metrics = trainer.train_epoch(
            state, ds.batches(jax.random.fold_in(key, epoch), 128)
        )
        if epoch % max(epochs // 5, 1) == 0 or epoch == epochs - 1:
            print(f"epoch {epoch:3d}  loss {metrics['loss']:+.4f}  "
                  f"E+ {metrics['pos_energy']:+.3f}  E- {metrics['neg_energy']:+.3f}")

    # low energy on data, higher off-manifold
    e = energy.replace(params=state.params)
    on = float(jnp.mean(e(ds.get_data()[:256])))
    off = float(jnp.mean(e(jnp.full((256, 2), 3.0))))
    print(f"E[data]={on:.3f}  E[off-manifold]={off:.3f}  (data should be lower)")
    print("OK")


if __name__ == "__main__":
    main()

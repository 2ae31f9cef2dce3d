"""End-to-end training QUALITY tests: train → generate → distributional metric.

The examples smoke suite only asserts exit codes (reference pattern); these
tests assert the learned distributions are actually right, using the energy
distance (a proper metric on distributions, zero iff equal — no binning, no
tuning) between generated samples and fresh ground-truth draws.

Budgets are sized for CPU CI (~10-20 s per test); each pipeline is the
minimum end-to-end slice of SURVEY §7 step 5.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from torchebm_tpu.core import GaussianMixtureEnergy, WrappedEnergy
from torchebm_tpu.datasets import make_8gaussians, make_two_moons
from torchebm_tpu.interpolants import LinearInterpolant
from torchebm_tpu.losses import ContrastiveDivergence, DenoisingScoreMatching
from torchebm_tpu.models import MLPEnergy, MLPVelocityField
from torchebm_tpu.samplers import FlowSampler, LangevinDynamics
from torchebm_tpu.samplers.flow import WrappedField

pytestmark = pytest.mark.slow


def energy_distance(x: jnp.ndarray, y: jnp.ndarray) -> float:
    """E-statistic: 2 E|X-Y| - E|X-X'| - E|Y-Y'| (>= 0, == 0 iff same law)."""
    def mean_pdist(a, b):
        return jnp.mean(jnp.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1))

    return float(2 * mean_pdist(x, y) - mean_pdist(x, x) - mean_pdist(y, y))


def test_flow_matching_8gaussians_energy_distance(key):
    """Flow matching (independent coupling) + FlowSampler ODE must reproduce
    the 8gaussians law: energy distance to fresh data << the distance from
    the N(0,I) prior (the training starting point)."""
    net = MLPVelocityField(hidden_dims=(128, 128))
    params = net.init(key, jnp.zeros((1, 2)), jnp.zeros((1,)))
    interp = LinearInterpolant()
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    def loss_fn(p, x1, k):
        k0, kt = jax.random.split(k)
        x0 = jax.random.normal(k0, x1.shape)
        t = jax.random.uniform(kt, (x1.shape[0],))
        xt, ut = interp.interpolate(x0, x1, t)
        return jnp.mean(jnp.square(net.apply(p, xt, t) - ut))

    @jax.jit
    def step(p, s, x1, k):
        l, g = jax.value_and_grad(loss_fn)(p, x1, k)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, l

    for i in range(600):
        k = jax.random.fold_in(key, i)
        params, opt_state, _ = step(params, opt_state, make_8gaussians(k, 512), jax.random.fold_in(k, 1))

    flow = FlowSampler(
        model=WrappedField(fn=net.apply, params=params),
        integrator="euler",
    )
    gen = flow.sample(jax.random.fold_in(key, 7), dim=2, n_samples=1024, n_steps=60)
    data = make_8gaussians(jax.random.fold_in(key, 8), 1024)
    prior = jax.random.normal(jax.random.fold_in(key, 9), (1024, 2))

    ed_gen = energy_distance(gen, data)
    ed_prior = energy_distance(prior, data)
    assert ed_gen < 0.15 * ed_prior, (ed_gen, ed_prior)
    # mode coverage: every one of the 8 modes receives samples
    ang = jnp.arange(8) * (2 * jnp.pi / 8)
    centers = 2.0 * jnp.stack([jnp.cos(ang), jnp.sin(ang)], -1)
    nearest = jnp.argmin(
        jnp.linalg.norm(gen[:, None, :] - centers[None], axis=-1), axis=1
    )
    counts = np.bincount(np.asarray(nearest), minlength=8)
    assert (counts > 16).all(), counts  # >=1.6% of samples per mode


def test_cd_langevin_two_moons_energy_ranking(key):
    """CD-trained MLP energy must rank real two-moons points below (lower
    energy than) off-manifold points, and its Langevin samples must be closer
    to the data law than noise is."""
    net = MLPEnergy(hidden_dims=(64, 64))
    params = net.init(key, jnp.zeros((1, 2)))
    energy = WrappedEnergy(fn=net.apply, params=params)
    cd = ContrastiveDivergence(
        model=energy,
        sampler=LangevinDynamics(energy, step_size=0.05, fused="off"),
        k_steps=20,
    )
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, x, k):
        (l, _), g = jax.value_and_grad(lambda pp: cd(pp, x, k), has_aux=True)(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, l

    for i in range(250):
        k = jax.random.fold_in(key, i)
        params, opt_state, _ = step(params, opt_state, make_two_moons(k, 256), jax.random.fold_in(k, 1))

    trained = energy.replace(params=params)
    data = make_two_moons(jax.random.fold_in(key, 50), 512)
    off = jax.random.uniform(jax.random.fold_in(key, 51), (512, 2), minval=-3, maxval=3)
    e_data = float(jnp.mean(trained(data)))
    e_off = float(jnp.mean(trained(off)))
    assert e_data < e_off - 0.5, (e_data, e_off)

    sampler = LangevinDynamics(trained, step_size=0.05, fused="off")
    gen = sampler.sample(jax.random.fold_in(key, 52), x=data + 0.5, n_steps=200)
    noise = jax.random.normal(jax.random.fold_in(key, 53), (512, 2))
    assert energy_distance(gen, data) < 0.5 * energy_distance(noise, data)


def test_exact_mixture_sampler_is_energy_distance_floor(key):
    """Calibration: two independent exact draws from the same mixture have
    energy distance ~0 — validates the metric the other tests rely on."""
    mix = GaussianMixtureEnergy.eight_gaussians()
    a = mix.sample(jax.random.fold_in(key, 0), 1024)
    b = mix.sample(jax.random.fold_in(key, 1), 1024)
    prior = 4.0 * jax.random.normal(jax.random.fold_in(key, 2), (1024, 2))
    assert energy_distance(a, b) < 0.05
    assert energy_distance(prior, b) > 0.2


def test_dsm_then_langevin_recovers_gaussian(key):
    """DSM-trained energy sampled with Langevin recovers a shifted Gaussian's
    mean — the score-matching end-to-end slice."""
    net = MLPEnergy(hidden_dims=(64, 64))
    params = net.init(key, jnp.zeros((1, 2)))
    energy = WrappedEnergy(fn=net.apply, params=params)
    dsm = DenoisingScoreMatching(model=energy, noise_scale=0.3)
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, x, k):
        l, g = jax.value_and_grad(lambda pp: dsm(pp, x, k))(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, l

    mean = jnp.array([1.5, -1.0])
    for i in range(300):
        k = jax.random.fold_in(key, i)
        x = mean + 0.7 * jax.random.normal(k, (256, 2))
        params, opt_state, _ = step(params, opt_state, x, jax.random.fold_in(k, 1))

    # a DSM energy is only trained where data lives — start chains inside the
    # perturbed-data region (clamped Langevin is the same discipline image
    # EBMs use), then check the learned basin centers on the true mean
    sampler = LangevinDynamics(
        energy.replace(params=params), step_size=0.03, clamp=(-4.0, 4.0), fused="off"
    )
    x0 = mean + 1.5 * jax.random.normal(jax.random.fold_in(key, 98), (1024, 2))
    gen = sampler.sample(jax.random.fold_in(key, 99), x=x0, n_steps=300)
    np.testing.assert_allclose(np.asarray(jnp.mean(gen, 0)), np.asarray(mean), atol=0.35)
    # and the spread contracts toward the data scale (0.7^2 + sigma^2)
    assert float(jnp.mean(jnp.var(gen, 0))) < 1.5

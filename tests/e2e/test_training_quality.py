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
from torchebm_tpu.losses import (
    ContrastiveDivergence,
    DenoisingScoreMatching,
    EnergyMatchingLoss,
    EquilibriumMatchingLoss,
)
from torchebm_tpu.models import EqMEnergy, MLPEnergy, MLPVelocityField
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


def test_eqm_8gaussians_both_generation_routes(key):
    """EqM-trained field (BASELINE config 5) must reproduce the 8gaussians law
    through BOTH generation routes: the field via FlowSampler(negate_velocity)
    and the EqMEnergy scalar adapter via Langevin — the adapter is the whole
    point of EqM (equilibria ON the data)."""
    net = MLPVelocityField(hidden_dims=(128, 128, 128))
    params = net.init(key, jnp.zeros((1, 2)), jnp.zeros((1,)))
    eqm = EquilibriumMatchingLoss(model=net.apply, coupling="sinkhorn")
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, x1, k):
        l, g = jax.value_and_grad(lambda pp: eqm(pp, x1, k))(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, l

    for i in range(800):
        k = jax.random.fold_in(key, i)
        params, opt_state, _ = step(
            params, opt_state, make_8gaussians(k, 512), jax.random.fold_in(k, 1)
        )

    field = WrappedField(fn=net.apply, params=params)
    data = make_8gaussians(jax.random.fold_in(key, 70), 1024)
    prior = jax.random.normal(jax.random.fold_in(key, 71), (1024, 2))
    ed_prior = energy_distance(prior, data)

    # route 1: the raw field, integrated with negate_velocity (EqM fields
    # point data -> noise)
    fs = FlowSampler(model=field, negate_velocity=True, integrator="euler")
    gen_field = fs.sample(jax.random.fold_in(key, 72), dim=2, n_samples=1024, n_steps=100)
    assert energy_distance(gen_field, data) < 0.3 * ed_prior

    # route 2: scalar-energy adapter + Langevin MCMC
    e = EqMEnergy.from_loss(eqm.replace(model=field))
    lang = LangevinDynamics(e, step_size=0.01, noise_scale=0.3)
    gen_mcmc = lang.sample(
        jax.random.fold_in(key, 73), x=gen_field, n_steps=200
    )
    assert energy_distance(gen_mcmc, data) < 0.3 * ed_prior

    # mode coverage through the MCMC route (the fragile one)
    ang = jnp.arange(8) * (2 * jnp.pi / 8)
    centers = 2.0 * jnp.stack([jnp.cos(ang), jnp.sin(ang)], -1)
    nearest = jnp.argmin(
        jnp.linalg.norm(gen_mcmc[:, None, :] - centers[None], axis=-1), axis=1
    )
    counts = np.bincount(np.asarray(nearest), minlength=8)
    assert (counts > 10).all(), counts


def test_energy_matching_two_phase_cd_engages(key):
    """EM two-phase training (the two-regime loss whose CD term can silently
    collapse): after the flow warm-up, the joint phase's CD term must actually
    engage (finite, non-degenerate cd_loss; negatives produced), and the
    trained potential must rank data below off-manifold points with
    temperature-swept Langevin samples near the data law."""
    from torchebm_tpu.core import TemperatureScheduler

    net = MLPEnergy(hidden_dims=(128, 128))
    params = net.init(key, jnp.zeros((1, 2)))
    energy = WrappedEnergy(fn=net.apply, params=params)
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    warm = EnergyMatchingLoss(model=energy, lambda_cd=0.0, coupling="sinkhorn", sigma=0.05)
    joint = EnergyMatchingLoss(
        model=energy, lambda_cd=2.0, coupling="sinkhorn", sigma=0.05,
        n_langevin_steps=40,
    )

    def make_step(loss):
        @jax.jit
        def step(p, s, x, k):
            l, g = jax.value_and_grad(lambda pp: loss(pp, x, k))(p)
            u, s = opt.update(g, s)
            return optax.apply_updates(p, u), s, l
        return step

    for phase, loss, steps in (("warm", warm, 500), ("joint", joint, 150)):
        step = make_step(loss)
        for i in range(steps):
            k = jax.random.fold_in(key, (0 if phase == "warm" else 10_000) + i)
            params, opt_state, _ = step(
                params, opt_state, make_two_moons(k, 256, noise=0.05),
                jax.random.fold_in(k, 1),
            )

    # the CD term engages: terms dict has finite, non-zero cd machinery
    terms = joint.training_losses(
        params, make_two_moons(jax.random.fold_in(key, 77), 256, noise=0.05),
        jax.random.fold_in(key, 78),
    )
    assert np.isfinite(float(terms["loss"]))
    assert np.isfinite(float(terms["cd_loss"]))
    assert float(terms["cd_loss"]) != 0.0  # engaged, not silently collapsed
    negs = np.asarray(terms["negatives"])
    assert negs.shape == (256, 2) and np.isfinite(negs).all()

    trained = energy.replace(params=params)
    data = make_two_moons(jax.random.fold_in(key, 80), 512, noise=0.05)
    off = jax.random.uniform(jax.random.fold_in(key, 81), (512, 2), minval=-3, maxval=3)
    assert float(jnp.mean(trained(data))) < float(jnp.mean(trained(off))) - 0.3

    # generation: one temperature-swept Langevin pass (the EM sampling recipe)
    n_steps = 200
    temp = TemperatureScheduler(epsilon_max=0.15, tau_star=0.8, n_steps=n_steps)
    gen = LangevinDynamics(trained, step_size=0.01, noise_scale=temp).sample(
        jax.random.fold_in(key, 82),
        x=jax.random.normal(jax.random.fold_in(key, 83), (1024, 2)),
        n_steps=n_steps,
    )
    noise = jax.random.normal(jax.random.fold_in(key, 84), (1024, 2))
    assert energy_distance(gen, data) < 0.5 * energy_distance(noise, data)


def test_pcd_conv_energy_images(key):
    """PCD + ConvEnergy2D on real (digits-fallback) images — BASELINE config 4
    as a QUALITY test, not just throughput: the trained energy must rank
    held-out data below noise, and replay-buffer samples must be closer to the
    data manifold than noise is."""
    from torchebm_tpu.datasets import load_mnist
    from torchebm_tpu.models import ConvEnergy2D

    x_all, _ = load_mnist("train")
    x_all = jax.image.resize(
        x_all, (x_all.shape[0], 1, 14, 14), method="bilinear"
    )  # CPU-CI budget: quarter the pixels
    train, held = x_all[:1024], x_all[1024:1280]

    net = ConvEnergy2D(channels=(16, 32))
    params = net.init(key, train[:1])
    energy = WrappedEnergy(fn=net.apply, params=params)
    # image-EBM Langevin recipe: strong gradient steps, small noise
    sampler = LangevinDynamics(
        energy, step_size=1.0, noise_scale=0.05, clamp=(-1.0, 1.0), fused="off"
    )
    cd = ContrastiveDivergence(
        model=energy, sampler=sampler, k_steps=20,
        persistent=True, buffer_size=512, init_steps=0,
    )
    buffer = cd.init_buffer(key, (1, 14, 14))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, b, x, k):
        (l, (_, b2)), g = jax.value_and_grad(
            lambda pp: cd(pp, x, k, b), has_aux=True
        )(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, b2, l

    batch = 64
    for i in range(150):
        k = jax.random.fold_in(key, i)
        idx = jax.random.randint(k, (batch,), 0, train.shape[0])
        params, opt_state, buffer, _ = step(
            params, opt_state, buffer, train[idx], jax.random.fold_in(k, 1)
        )

    trained = energy.replace(params=params)
    noise = jax.random.uniform(
        jax.random.fold_in(key, 90), held.shape, minval=-1.0, maxval=1.0
    )
    e_held = float(jnp.mean(trained(held)))
    e_noise = float(jnp.mean(trained(noise)))
    assert e_held < e_noise, (e_held, e_noise)

    # buffer negatives sit closer to the data manifold than noise does:
    # mean distance to the nearest training image, buffer vs noise
    def mean_nearest_dist(a, b):
        af = a.reshape(a.shape[0], -1)
        bf = b.reshape(b.shape[0], -1)
        d = jnp.linalg.norm(af[:, None, :] - bf[None, :, :], axis=-1)
        return float(jnp.mean(jnp.min(d, axis=1)))

    buf = buffer.samples[:256]
    assert mean_nearest_dist(buf, train[:512]) < mean_nearest_dist(noise, train[:512])


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

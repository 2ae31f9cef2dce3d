"""HMC + dual averaging + RMHMC tests (reference ``tests/samplers/test_hmc.py``, 1,516 LoC)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchebm_tpu.core import DoubleWellEnergy, GaussianEnergy
from torchebm_tpu.samplers import HamiltonianMonteCarlo, RiemannianManifoldHMC


def test_gaussian_moments(key):
    mean = jnp.array([2.0, -1.0])
    cov = jnp.array([[1.0, 0.0], [0.0, 2.0]])
    hmc = HamiltonianMonteCarlo(GaussianEnergy.create(mean, cov), step_size=0.2, n_leapfrog_steps=10)
    samples = hmc.sample(key, dim=2, n_samples=2000, n_steps=500)
    np.testing.assert_allclose(jnp.mean(samples, 0), mean, atol=0.12)
    np.testing.assert_allclose(jnp.var(samples, 0), jnp.diagonal(cov), rtol=0.15)


def test_acceptance_rate_behavior(key):
    """Small step size -> acceptance near 1; huge step size -> low acceptance."""
    e = GaussianEnergy.standard(2)
    small = HamiltonianMonteCarlo(e, step_size=0.05, n_leapfrog_steps=5)
    _, d_small = small.sample(key, dim=2, n_samples=256, n_steps=50, return_diagnostics=True)
    assert float(d_small["acceptance_rate"].mean()) > 0.95
    big = HamiltonianMonteCarlo(e, step_size=2.5, n_leapfrog_steps=5)
    _, d_big = big.sample(key, dim=2, n_samples=256, n_steps=50, return_diagnostics=True)
    assert float(d_big["acceptance_rate"].mean()) < 0.6


def test_mass_matrix(key):
    e = GaussianEnergy.standard(2)
    hmc_s = HamiltonianMonteCarlo(e, step_size=0.2, n_leapfrog_steps=5, mass=2.0)
    hmc_v = HamiltonianMonteCarlo(e, step_size=0.2, n_leapfrog_steps=5, mass=jnp.array([2.0, 2.0]))
    a = hmc_s.sample(key, dim=2, n_samples=64, n_steps=20)
    b = hmc_v.sample(key, dim=2, n_samples=64, n_steps=20)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_reproducibility(key):
    hmc = HamiltonianMonteCarlo(GaussianEnergy.standard(2), step_size=0.2, n_leapfrog_steps=5)
    a = hmc.sample(key, dim=2, n_samples=32, n_steps=20)
    b = hmc.sample(key, dim=2, n_samples=32, n_steps=20)
    np.testing.assert_array_equal(a, b)


def test_validation():
    with pytest.raises(ValueError):
        HamiltonianMonteCarlo(GaussianEnergy.standard(2), n_leapfrog_steps=0)
    with pytest.raises(TypeError):
        HamiltonianMonteCarlo(GaussianEnergy.standard(2), integrator="generalised_leapfrog")


@pytest.mark.slow
def test_dual_averaging_hits_target(key):
    """Build addition (BASELINE): warmup adapts step size toward target acceptance."""
    e = GaussianEnergy.standard(2)
    hmc = HamiltonianMonteCarlo(e, step_size=1.9, n_leapfrog_steps=5, dual_averaging=True, target_accept=0.8)
    x, eps = hmc.warmup(key, dim=2, n_warmup=400, n_samples=512)
    assert 0.05 < eps < 1.9  # adapted downward from a too-large start
    _, diag = hmc.replace(step_size=eps).sample(
        jax.random.fold_in(key, 1), x=x, n_steps=200, return_diagnostics=True
    )
    acc = float(diag["acceptance_rate"].mean())
    assert 0.6 < acc <= 1.0, acc


def test_double_well_both_modes(key):
    hmc = HamiltonianMonteCarlo(DoubleWellEnergy(), step_size=0.1, n_leapfrog_steps=10)
    s = hmc.sample(key, dim=1, n_samples=1000, n_steps=300)
    frac_pos = float(jnp.mean(s > 0))
    assert 0.2 < frac_pos < 0.8  # both wells populated


# ---------------------------------------------------------------- RMHMC


def _identity_metric(x):
    d = x.shape[-1]
    return jnp.broadcast_to(jnp.eye(d), (x.shape[0], d, d))


def test_rmhmc_identity_metric_moments(key):
    e = GaussianEnergy.standard(2)
    rm = RiemannianManifoldHMC(e, metric_fn=_identity_metric, step_size=0.3, n_leapfrog_steps=5)
    s = rm.sample(key, dim=2, n_samples=500, n_steps=300)
    np.testing.assert_allclose(jnp.mean(s, 0), jnp.zeros(2), atol=0.15)
    np.testing.assert_allclose(jnp.var(s, 0), jnp.ones(2), rtol=0.25)


def test_rmhmc_position_dependent_metric_runs(key):
    e = GaussianEnergy.standard(2)

    def metric(x):
        d = x.shape[-1]
        scale = 1.0 + jnp.sum(x**2, axis=-1, keepdims=True)[..., None]
        return scale * jnp.broadcast_to(jnp.eye(d), (x.shape[0], d, d))

    rm = RiemannianManifoldHMC(e, metric_fn=metric, step_size=0.1, n_leapfrog_steps=3)
    s, diag = rm.sample(key, dim=2, n_samples=64, n_steps=50, return_diagnostics=True)
    assert bool(jnp.all(jnp.isfinite(s)))
    assert float(diag["acceptance_rate"].mean()) > 0.5


def test_rmhmc_validation():
    e = GaussianEnergy.standard(2)
    with pytest.raises(TypeError):
        RiemannianManifoldHMC(e, metric_fn=None)
    with pytest.raises(TypeError):
        RiemannianManifoldHMC(e, metric_fn=_identity_metric, integrator="leapfrog")


class TestFusedDispatch:
    """Eager TPU calls on 2D mixtures route to the whole-run Pallas HMC kernel
    (stubbed here — real-kernel tests live in tests/ops/test_fused_langevin.py)."""

    def _stub(self, calls):
        def stub(x0, means, n_draws, step_size, n_leapfrog, *, scale, log_weights,
                 mass=None, seed, interpret=False):
            calls.append((x0.shape, means.shape, n_draws, step_size, n_leapfrog))
            return x0, jnp.ones(x0.shape[0])
        return stub

    def test_force_routes_mixture(self, key, monkeypatch):
        from torchebm_tpu.core import GaussianMixtureEnergy
        import torchebm_tpu.ops.fused_hmc as fh

        calls = []
        monkeypatch.setattr(fh, "mixture_hmc_chain", self._stub(calls))
        mix = GaussianMixtureEnergy.eight_gaussians()
        hmc = HamiltonianMonteCarlo(mix, step_size=0.3, n_leapfrog_steps=7, fused="force")
        out = hmc.sample(key, dim=2, n_samples=32, n_steps=9)
        assert calls == [((32, 2), (8, 2), 9, 0.3, 7)]
        assert out.shape == (32, 2)

    def test_force_routes_ddim_mixture(self, key, monkeypatch):
        """Round-2 widening: d>2 mixtures dispatch to the general-d kernel."""
        from torchebm_tpu.core import GaussianMixtureEnergy
        import torchebm_tpu.ops.fused_hmc as fh

        calls = []
        monkeypatch.setattr(fh, "mixture_hmc_chain", self._stub(calls))
        means = jax.random.normal(key, (3, 6))
        mix = GaussianMixtureEnergy.create(means, scale=0.5)
        hmc = HamiltonianMonteCarlo(mix, step_size=0.2, fused="force")
        out = hmc.sample(key, dim=6, n_samples=16, n_steps=4)
        assert calls == [((16, 6), (3, 6), 4, 0.2, 10)]
        assert out.shape == (16, 6)

    def test_auto_never_dispatches_on_cpu(self, key, monkeypatch):
        from torchebm_tpu.core import GaussianMixtureEnergy
        import torchebm_tpu.ops.fused_hmc as fh

        def boom(*a, **k):  # pragma: no cover
            raise AssertionError("fused HMC kernel called on CPU under 'auto'")

        monkeypatch.setattr(fh, "mixture_hmc_chain", boom)
        mix = GaussianMixtureEnergy.eight_gaussians()
        hmc = HamiltonianMonteCarlo(mix, step_size=0.3, fused="auto")
        assert hmc.sample(key, dim=2, n_samples=8, n_steps=3).shape == (8, 2)

    def test_diagnostics_fall_back(self, key, monkeypatch):
        from torchebm_tpu.core import GaussianMixtureEnergy
        import torchebm_tpu.ops.fused_hmc as fh

        def boom(*a, **k):  # pragma: no cover
            raise AssertionError("must not dispatch")

        monkeypatch.setattr(fh, "mixture_hmc_chain", boom)
        monkeypatch.setattr(fh, "mixture_hmc_chain_trajectory", boom)
        mix = GaussianMixtureEnergy.eight_gaussians()
        hmc = HamiltonianMonteCarlo(mix, step_size=0.3, fused="force")
        hmc.sample(key, dim=2, n_samples=8, n_steps=3, return_diagnostics=True)

    def test_trajectory_routes_to_trajectory_kernel(self, key, monkeypatch):
        """Round-3: return_trajectory rides the DMA trajectory kernel — the
        R̂/ESS workload no longer falls back to the scan."""
        from torchebm_tpu.core import GaussianMixtureEnergy
        import torchebm_tpu.ops.fused_hmc as fh

        calls = []

        def stub(x0, means, n_draws, step_size, n_leapfrog, *, thin, mass=None,
                 seed=0, interpret=False, **target_kw):
            calls.append((x0.shape, n_draws, thin, n_leapfrog))
            n_kept = n_draws // thin
            return (
                jnp.zeros((n_kept, *x0.shape)),
                x0,
                jnp.ones(x0.shape[0]),
            )

        monkeypatch.setattr(fh, "mixture_hmc_chain_trajectory", stub)
        mix = GaussianMixtureEnergy.eight_gaussians()
        hmc = HamiltonianMonteCarlo(
            mix, step_size=0.3, n_leapfrog_steps=5, fused="force"
        )
        out = hmc.sample(
            key, dim=2, n_samples=8, n_steps=9, thin=3, return_trajectory=True
        )
        assert calls == [((8, 2), 9, 3, 5)]
        assert out.shape == (8, 3, 2)

    def test_nonmixture_falls_back(self, key, monkeypatch):
        import torchebm_tpu.ops.fused_hmc as fh

        def boom(*a, **k):  # pragma: no cover
            raise AssertionError("must not dispatch")

        monkeypatch.setattr(fh, "mixture_hmc_chain", boom)
        HamiltonianMonteCarlo(DoubleWellEnergy(), step_size=0.1, fused="force").sample(
            key, dim=2, n_samples=4, n_steps=2
        )

    def test_diag_mass_dispatches(self, key, monkeypatch):
        """Round-2 widening: scalar / (d,) diagonal mass (the
        warmup(adapt_mass=True) output) stays on the kernel path."""
        from torchebm_tpu.core import GaussianMixtureEnergy
        import torchebm_tpu.ops.fused_hmc as fh

        seen = []

        def stub(x0, means, n_draws, step_size, n_leapfrog, *, mass=None, **kw):
            seen.append(None if mass is None else jnp.asarray(mass))
            return x0, jnp.ones(x0.shape[0])

        monkeypatch.setattr(fh, "mixture_hmc_chain", stub)
        mix = GaussianMixtureEnergy.eight_gaussians()
        HamiltonianMonteCarlo(mix, step_size=0.3, mass=2.0, fused="force").sample(
            key, dim=2, n_samples=4, n_steps=2
        )
        HamiltonianMonteCarlo(
            mix, step_size=0.3, mass=jnp.array([1.0, 4.0]), fused="force"
        ).sample(key, dim=2, n_samples=4, n_steps=2)
        assert float(seen[0]) == 2.0
        assert seen[1].tolist() == [1.0, 4.0]

    def test_gaussian_routes_with_precision(self, key, monkeypatch):
        """Round-3 widening: concrete full-covariance Gaussians dispatch to
        the precision-packed HMC kernel (the corr-Gaussian ESS workload)."""
        from torchebm_tpu.core import GaussianEnergy
        import torchebm_tpu.ops.fused_hmc as fh

        calls = []

        def stub(x0, means, n_draws, step_size, n_leapfrog, *, precision,
                 mass=None, seed=0, interpret=False):
            calls.append((x0.shape, means.shape, precision.shape, n_leapfrog))
            return x0, jnp.ones(x0.shape[0])

        monkeypatch.setattr(fh, "mixture_hmc_chain", stub)
        e = GaussianEnergy.create(
            jnp.zeros(2), jnp.array([[2.0, 0.9], [0.9, 1.0]])
        )
        hmc = HamiltonianMonteCarlo(
            e, step_size=0.2, n_leapfrog_steps=7, fused="force"
        )
        out = hmc.sample(key, dim=2, n_samples=8, n_steps=3)
        assert calls == [((8, 2), (1, 2), (2, 2), 7)]
        assert out.shape == (8, 2)

    def test_traced_calls_fall_back(self, key, monkeypatch):
        from torchebm_tpu.core import GaussianMixtureEnergy
        import torchebm_tpu.ops.fused_hmc as fh

        def boom(*a, **k):  # pragma: no cover
            raise AssertionError("must not dispatch under trace")

        monkeypatch.setattr(fh, "mixture_hmc_chain", boom)
        mix = GaussianMixtureEnergy.eight_gaussians()
        hmc = HamiltonianMonteCarlo(mix, step_size=0.3, fused="force")

        @jax.jit
        def run(k):
            return hmc.sample(k, dim=2, n_samples=4, n_steps=2)

        assert run(key).shape == (4, 2)

    def test_invalid_flag_raises(self):
        with pytest.raises(ValueError, match="fused"):
            HamiltonianMonteCarlo(DoubleWellEnergy(), fused="always")


class TestMassAdaptation:
    def test_adapted_mass_matches_inverse_variance(self, key):
        """Anisotropic Gaussian diag(1, 25): Stan-style adaptation should
        recover mass ~ [1, 0.04] (inverse posterior variance)."""
        cov = jnp.diag(jnp.array([1.0, 25.0]))
        hmc = HamiltonianMonteCarlo(
            GaussianEnergy.create(jnp.zeros(2), cov),
            step_size=0.3, n_leapfrog_steps=10, dual_averaging=True,
        )
        x, eps, mass = hmc.warmup(
            key, dim=2, n_warmup=600, n_samples=256, adapt_mass=True
        )
        assert mass.shape == (2,)
        assert 0.4 < float(mass[0]) < 2.5
        assert 0.015 < float(mass[1]) < 0.1
        assert float(mass[0]) / float(mass[1]) > 8.0

    def test_adapted_mass_improves_mixing(self, key):
        """Short trajectories (L=2) on a 1-vs-400 anisotropic Gaussian: with
        unit mass the step size is pinned by the tight dimension and the wide
        one random-walks; the adapted metric rescales both to unit scale, so
        the min-ESS gap is large."""
        from torchebm_tpu.samplers import summarize_chains

        cov = jnp.diag(jnp.array([1.0, 400.0]))
        e = GaussianEnergy.create(jnp.zeros(2), cov)
        hmc = HamiltonianMonteCarlo(e, step_size=0.2, n_leapfrog_steps=2,
                                    dual_averaging=True)
        k1, k2 = jax.random.split(key)
        x, eps, mass = hmc.warmup(k1, dim=2, n_warmup=500, n_samples=64,
                                  adapt_mass=True)
        plain = hmc.replace(step_size=eps)
        tuned = hmc.replace(step_size=eps, mass=mass)
        t_plain = plain.sample(k2, x=x, n_steps=400, return_trajectory=True)
        t_tuned = tuned.sample(k2, x=x, n_steps=400, return_trajectory=True)
        ess_plain = float(jnp.min(summarize_chains(t_plain)["ess"]))
        ess_tuned = float(jnp.min(summarize_chains(t_tuned)["ess"]))
        assert ess_tuned > 2.0 * ess_plain, (ess_plain, ess_tuned)

    def test_default_return_signature_unchanged(self, key):
        hmc = HamiltonianMonteCarlo(GaussianEnergy.standard(2), step_size=0.2)
        out = hmc.warmup(key, dim=2, n_warmup=50, n_samples=16)
        assert len(out) == 2


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="in-kernel PRNG requires TPU hardware"
)
def test_gaussian_kernel_moments_on_tpu(key):
    """Round-3: the precision-packed HMC kernel preserves a correlated
    Gaussian's moments (statistical check; exact parity is pinned by the
    injected-randomness tests in tests/ops/test_chain_parity.py)."""
    cov = jnp.array([[1.0, 0.8], [0.8, 1.0]])
    e = GaussianEnergy.create(jnp.zeros(2), cov)
    x0 = e.sample(key, 512)
    hmc = HamiltonianMonteCarlo(e, step_size=0.2, n_leapfrog_steps=8)
    traj = hmc.sample(
        jax.random.fold_in(key, 1), x=x0, n_steps=300, return_trajectory=True
    )
    flat = traj.reshape(-1, 2)
    np.testing.assert_allclose(np.asarray(jnp.mean(flat, 0)), np.zeros(2), atol=0.1)
    np.testing.assert_allclose(np.asarray(jnp.cov(flat.T)), np.asarray(cov), atol=0.12)

"""Exact-parity CI tests for the whole-ladder parallel-tempering kernel.

Round-5 verdict item 3: PT rides the fused kernels. Same correctness pattern
as the other chain kernels (injected noise — and here also injected exchange
uniforms — vs a plain-jnp reference loop mirroring the kernel's op order,
interpret mode on CPU). The swap delta uses the kernels' *unnormalized*
log-density (the Gaussian normalization constant cancels algebraically in the
pair difference; the reference loop mirrors that form so float32 parity is
tight).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchebm_tpu.ops.fused_pt import pt_langevin_chain

from test_chain_parity import _clip, _mix_grad_logp

INTERPRET = jax.default_backend() != "tpu"


def _ref_pt(
    reps, means, logw, inv_var, betas, n_steps, swap_every, h, ns, noise,
    swap_u, clamp=None,
):
    """Plain-jnp PT reference with the kernel's math staging."""
    R = reps.shape[0]
    coef = ns * math.sqrt(2 * h)
    n_sweeps = n_steps // swap_every
    x = reps
    for s in range(n_sweeps):
        for t in range(swap_every):
            i = s * swap_every + t
            new = []
            for r in range(R):
                g, _ = _mix_grad_logp(x[r], means, logw, inv_var)
                new.append(_clip(x[r] - (h * betas[r]) * g + coef * noise[i, r], clamp))
            x = jnp.stack(new)
        # exchange sweep
        logps = [
            _mix_grad_logp(x[r], means, logw, inv_var)[1] for r in range(R)
        ]
        xs = [x[r] for r in range(R)]
        for r in range(R - 1):
            active = ((s % 2) == (r % 2)) if R > 2 else (r % 2 == 0)
            delta = (betas[r] - betas[r + 1]) * (logps[r + 1] - logps[r])
            p = jnp.minimum(jnp.exp(jnp.clip(delta, -50.0, 50.0)), 1.0)
            do = jnp.logical_and(active, swap_u[s, r] < p)
            lo, hi = xs[r], xs[r + 1]
            xs[r] = jnp.where(do[:, None], hi, lo)
            xs[r + 1] = jnp.where(do[:, None], lo, hi)
            e_lo, e_hi = logps[r], logps[r + 1]
            logps[r] = jnp.where(do, e_hi, e_lo)
            logps[r + 1] = jnp.where(do, e_lo, e_hi)
        x = jnp.stack(xs)
    for t in range(n_sweeps * swap_every, n_steps):
        new = []
        for r in range(R):
            g, _ = _mix_grad_logp(x[r], means, logw, inv_var)
            new.append(_clip(x[r] - (h * betas[r]) * g + coef * noise[t, r], clamp))
        x = jnp.stack(new)
    return x


@pytest.mark.parametrize("R,clamp", [(2, None), (4, None), (3, (-5.0, 5.0))])
def test_pt_chain_noise_parity(key, R, clamp):
    n_steps, swap_every, B, d = 17, 5, 41, 2  # non-aligned B, remainder steps
    h, ns = 0.04, 1.0
    means = jnp.array([[2.0, 0.0], [-2.0, 0.0], [0.0, 2.0]])
    logw = jnp.log(jnp.array([0.5, 0.3, 0.2]))
    scale = 0.7
    betas = tuple(1.0 / (1.6**r) for r in range(R))
    reps = jax.random.normal(key, (R, B, d))
    noise = jax.random.normal(jax.random.fold_in(key, 1), (n_steps, R, B, d))
    n_sweeps = n_steps // swap_every
    swap_u = jax.random.uniform(jax.random.fold_in(key, 2), (n_sweeps, R - 1, B))

    ladder, acc = pt_langevin_chain(
        reps, means, n_steps, h, ns, betas, swap_every,
        scale=scale, log_weights=logw, clamp=clamp,
        noise=noise, swap_uniform=swap_u, interpret=INTERPRET,
    )
    want = _ref_pt(
        reps, means, logw, 1.0 / scale**2, betas, n_steps, swap_every, h, ns,
        noise, swap_u, clamp=clamp,
    )
    assert ladder.shape == (R, B, d)
    np.testing.assert_allclose(np.asarray(ladder), np.asarray(want), atol=2e-5)


def test_pt_chain_swaps_actually_fire(key):
    """With a cold/hot pair started in different basins, forced uniforms (0)
    must exchange states at the sweep — pinning that the in-kernel Metropolis
    test is wired to the right pair and direction."""
    means = jnp.array([[4.0, 0.0], [-4.0, 0.0]])
    B, d = 8, 2
    # replica 0 deep in mode A, replica 1 deep in mode B; no dynamics (h tiny)
    reps = jnp.stack([jnp.tile(jnp.array([4.0, 0.0]), (B, 1)),
                      jnp.tile(jnp.array([-4.0, 0.0]), (B, 1))])
    n_steps, swap_every = 5, 5
    noise = jnp.zeros((n_steps, 2, B, d))
    swap_u = jnp.zeros((1, 1, B))  # u=0 < p always -> swap if attempted
    ladder, _ = pt_langevin_chain(
        reps, means, n_steps, 1e-6, 0.0, (1.0, 0.5), swap_every,
        scale=0.5, noise=noise, swap_uniform=swap_u, interpret=INTERPRET,
    )
    # states exchanged (symmetric energies -> p = 1)
    np.testing.assert_allclose(np.asarray(ladder[0, :, 0]), -4.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ladder[1, :, 0]), 4.0, atol=1e-3)


def test_pt_chain_gaussian_precision_target(key):
    """Full-covariance Gaussian target rides the precision-packed evaluator."""
    cov = jnp.array([[2.0, 0.6], [0.6, 1.0]])
    prec = jnp.linalg.inv(cov)
    mean = jnp.array([1.0, -1.0])
    R, B, d = 2, 16, 2
    n_steps, swap_every = 6, 3
    reps = jax.random.normal(key, (R, B, d))
    noise = jax.random.normal(jax.random.fold_in(key, 1), (n_steps, R, B, d))
    swap_u = jax.random.uniform(jax.random.fold_in(key, 2), (2, 1, B))
    betas = (1.0, 0.5)
    h, ns = 0.05, 1.0

    ladder, _ = pt_langevin_chain(
        reps, mean[None, :], n_steps, h, ns, betas, swap_every,
        precision=prec, noise=noise, swap_uniform=swap_u, interpret=INTERPRET,
    )

    # reference with the kernel's Gaussian staging: grad = P (x - mu),
    # logp = -0.5 (x-mu)^T P (x-mu) (constant dropped)
    def g_grad_logp(x):
        diff = x - mean
        grad = jnp.stack(
            [sum(prec[i, j] * diff[:, j] for j in range(d)) for i in range(d)], -1
        )
        logp = -0.5 * jnp.sum(diff * grad, axis=-1)
        return grad, logp

    coef = ns * math.sqrt(2 * h)
    x = reps
    for s in range(2):
        for t in range(swap_every):
            i = s * swap_every + t
            new = []
            for r in range(R):
                g, _ = g_grad_logp(x[r])
                new.append(x[r] - (h * betas[r]) * g + coef * noise[i, r])
            x = jnp.stack(new)
        logps = [g_grad_logp(x[r])[1] for r in range(R)]
        delta = (betas[0] - betas[1]) * (logps[1] - logps[0])
        p = jnp.minimum(jnp.exp(jnp.clip(delta, -50.0, 50.0)), 1.0)
        do = swap_u[s, 0] < p
        lo, hi = x[0], x[1]
        x = jnp.stack([jnp.where(do[:, None], hi, lo), jnp.where(do[:, None], lo, hi)])
    np.testing.assert_allclose(np.asarray(ladder), np.asarray(x), atol=2e-5)


def test_pt_chain_validation():
    reps = jnp.zeros((2, 8, 2))
    means = jnp.zeros((1, 2))
    with pytest.raises(ValueError, match="betas"):
        pt_langevin_chain(reps, means, 4, 0.01, 1.0, (1.0,), 2, interpret=True)
    with pytest.raises(ValueError, match="swap_every"):
        pt_langevin_chain(reps, means, 4, 0.01, 1.0, (1.0, 0.5), 0, interpret=True)
    with pytest.raises(ValueError, match="both"):
        pt_langevin_chain(
            reps, means, 4, 0.01, 1.0, (1.0, 0.5), 2,
            noise=jnp.zeros((4, 2, 8, 2)), interpret=True,
        )
    with pytest.raises(ValueError, match="noise must have shape"):
        pt_langevin_chain(
            reps, means, 4, 0.01, 1.0, (1.0, 0.5), 2,
            noise=jnp.zeros((3, 2, 8, 2)), swap_uniform=jnp.zeros((2, 1, 8)),
            interpret=True,
        )


def test_pt_trajectory_noise_parity(key):
    """Trajectory variant: kept cold states (post-swap on exchange steps)
    match the reference loop's per-step cold snapshots."""
    from torchebm_tpu.ops.fused_pt import pt_langevin_chain_trajectory

    R, B, d = 3, 33, 2
    n_steps, swap_every, thin = 12, 4, 2
    h, ns = 0.04, 1.0
    means = jnp.array([[2.0, 0.0], [-2.0, 0.0], [0.0, 2.0]])
    logw = jnp.log(jnp.array([0.5, 0.3, 0.2]))
    scale = 0.7
    betas = tuple(1.0 / (1.6**r) for r in range(R))
    reps = jax.random.normal(key, (R, B, d))
    noise = jax.random.normal(jax.random.fold_in(key, 1), (n_steps, R, B, d))
    n_sweeps = n_steps // swap_every
    swap_u = jax.random.uniform(jax.random.fold_in(key, 2), (n_sweeps, R - 1, B))

    traj, ladder, _ = pt_langevin_chain_trajectory(
        reps, means, n_steps, h, ns, betas, swap_every, thin=thin,
        scale=scale, log_weights=logw, noise=noise, swap_uniform=swap_u,
        interpret=INTERPRET,
    )
    assert traj.shape == (n_steps // thin, B, d)
    assert ladder.shape == (R, B, d)

    # reference: per-step cold snapshots with the same post-swap semantics
    inv_var = 1.0 / scale**2
    x = reps
    kept = []
    import math as _math
    coef = ns * _math.sqrt(2 * h)
    for i in range(n_steps):
        new = []
        for r in range(R):
            g, _ = _mix_grad_logp(x[r], means, logw, inv_var)
            new.append(x[r] - (h * betas[r]) * g + coef * noise[i, r])
        x = jnp.stack(new)
        if i % swap_every == swap_every - 1:
            s = i // swap_every
            logps = [_mix_grad_logp(x[r], means, logw, inv_var)[1] for r in range(R)]
            xs = [x[r] for r in range(R)]
            for r in range(R - 1):
                active = ((s % 2) == (r % 2)) if R > 2 else (r % 2 == 0)
                delta = (betas[r] - betas[r + 1]) * (logps[r + 1] - logps[r])
                p = jnp.minimum(jnp.exp(jnp.clip(delta, -50.0, 50.0)), 1.0)
                do = jnp.logical_and(active, swap_u[s, r] < p)
                lo, hi = xs[r], xs[r + 1]
                xs[r] = jnp.where(do[:, None], hi, lo)
                xs[r + 1] = jnp.where(do[:, None], lo, hi)
                e_lo, e_hi = logps[r], logps[r + 1]
                logps[r] = jnp.where(do, e_hi, e_lo)
                logps[r + 1] = jnp.where(do, e_lo, e_hi)
            x = jnp.stack(xs)
        if (i + 1) % thin == 0:
            kept.append(x[0])
    want = jnp.stack(kept)
    np.testing.assert_allclose(np.asarray(traj), np.asarray(want), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ladder[0]), np.asarray(x[0]), atol=2e-5)


def test_pt_short_chain_no_sweep_injected(key):
    """n_steps < swap_every with injected randomness: zero sweeps must run
    (regression: the uniforms staging crashed on an empty jnp.stack before
    its zero-sweep guard could apply)."""
    R, B, d = 2, 16, 2
    means = jnp.array([[2.0, 0.0], [-2.0, 0.0]])
    n_steps, swap_every = 3, 5
    reps = jax.random.normal(key, (R, B, d))
    noise = jax.random.normal(jax.random.fold_in(key, 1), (n_steps, R, B, d))
    swap_u = jnp.zeros((0, R - 1, B))
    ladder, acc = pt_langevin_chain(
        reps, means, n_steps, 0.04, 1.0, (1.0, 0.5), swap_every,
        scale=0.7, noise=noise, swap_uniform=swap_u, interpret=INTERPRET,
    )
    want = _ref_pt(
        reps, means, jnp.log(jnp.full((2,), 0.5)), 1.0 / 0.7**2, (1.0, 0.5),
        n_steps, swap_every, 0.04, 1.0, noise, swap_u,
    )
    np.testing.assert_allclose(np.asarray(ladder), np.asarray(want), atol=2e-5)

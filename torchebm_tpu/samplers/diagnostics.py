r"""Cross-chain MCMC convergence diagnostics: split-R̂ and effective sample size.

**Build addition** (BASELINE.md): the reference's diagnostics stop at per-step
batch mean/var/energy/acceptance (``base_sampler.py:21-34``); this module adds
the standard cross-chain statistics (Gelman et al., *Bayesian Data Analysis*
3rd ed. §11.4-11.5; Vehtari et al. 2021 rank-normalization omitted for
simplicity). Everything is pure ``jnp`` and jittable, so pooled multi-host
diagnostics reduce over the chain axis with one ``psum``-backed mean when the
chain dimension is sharded over a mesh.

Convention: trajectories are ``(n_chains, n_draws, dim)`` — the layout produced
by ``BaseSampler.sample(..., return_trajectory=True)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

__all__ = ["potential_scale_reduction", "effective_sample_size", "summarize_chains"]


def _split_chains(traj: Array) -> Array:
    """Split each chain in half: (C, N, D) -> (2C, N//2, D) (drops odd draw)."""
    c, n = traj.shape[0], traj.shape[1]
    half = n // 2
    first = traj[:, :half]
    second = traj[:, half : 2 * half]
    return jnp.concatenate([first, second], axis=0)


def potential_scale_reduction(traj: Array, split: bool = True) -> Array:
    r"""Split-:math:`\hat R` per dimension.

    .. math::
        \hat R = \sqrt{\frac{\frac{N-1}{N} W + \frac1N B}{W}}

    with between-chain variance ``B`` and within-chain variance ``W``.
    Values near 1 indicate convergence; > 1.01 is suspect.

    Args:
        traj: ``(n_chains, n_draws, dim)`` trajectory.
        split: Use split chains (detects within-chain trends). Default True.

    Returns:
        ``(dim,)`` array of R̂ values.
    """
    if traj.ndim == 2:
        traj = traj[..., None]
    if split:
        traj = _split_chains(traj)
    m, n = traj.shape[0], traj.shape[1]
    chain_means = jnp.mean(traj, axis=1)  # (M, D)
    chain_vars = jnp.var(traj, axis=1, ddof=1)  # (M, D)
    w = jnp.mean(chain_vars, axis=0)
    b = n * jnp.var(chain_means, axis=0, ddof=1)
    var_plus = (n - 1) / n * w + b / n
    return jnp.sqrt(var_plus / jnp.maximum(w, 1e-30))


def _autocov_fft(x: Array) -> Array:
    """Per-chain autocovariance via FFT. x: (M, N) -> (M, N) lags 0..N-1."""
    n = x.shape[1]
    xc = x - jnp.mean(x, axis=1, keepdims=True)
    # zero-pad to 2n so the circular FFT correlation equals the linear one
    f = jnp.fft.rfft(xc, n=2 * n, axis=1)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=2 * n, axis=1)[:, :n]
    return acov / n


def effective_sample_size(traj: Array, split: bool = True) -> Array:
    r"""Bulk effective sample size per dimension (Geyer initial-monotone estimator).

    .. math::
        \text{ESS} = \frac{MN}{1 + 2\sum_{t=1}^{T} \hat\rho_t}

    with combined-chain autocorrelations :math:`\hat\rho_t` truncated at the
    first sum of adjacent pairs that goes negative (Geyer 1992), enforced
    monotone non-increasing.

    Args:
        traj: ``(n_chains, n_draws, dim)`` trajectory.

    Returns:
        ``(dim,)`` ESS estimates.
    """
    if traj.ndim == 2:
        traj = traj[..., None]
    if split:
        traj = _split_chains(traj)
    m, n, d = traj.shape

    def per_dim(x):  # x: (M, N)
        acov = _autocov_fft(x)  # (M, N)
        chain_var = acov[:, 0] * n / jnp.maximum(n - 1, 1)  # (M,)
        w = jnp.mean(chain_var)
        mean_acov = jnp.mean(acov, axis=0)  # (N,)
        if m > 1:
            b_over_n = jnp.var(jnp.mean(x, axis=1), ddof=1)
        else:
            b_over_n = jnp.float32(0.0)
        var_plus = (n - 1) / n * w + b_over_n
        rho = 1.0 - (w - mean_acov) / jnp.maximum(var_plus, 1e-30)  # (N,)

        # Geyer pairs: P_k = rho_{2k} + rho_{2k+1}; truncate at first negative,
        # then force monotone non-increasing.
        n_pairs = n // 2
        pairs = rho[: 2 * n_pairs].reshape(n_pairs, 2).sum(axis=1)
        positive = pairs > 0
        keep = jnp.cumprod(positive.astype(jnp.float32))
        pairs = pairs * keep
        pairs = jax.lax.associative_scan(jnp.minimum, pairs)
        pairs = jnp.maximum(pairs, 0.0)
        # tau = -1 + 2 * sum P_k  (rho_0 = 1 included in the first pair)
        tau = -1.0 + 2.0 * jnp.sum(pairs)
        return m * n / jnp.maximum(tau, 1.0 / jnp.float32(m * n))

    return jax.vmap(per_dim, in_axes=2)(traj)


def summarize_chains(traj: Array) -> dict:
    """Convenience bundle: mean, std, split-R̂, ESS per dimension."""
    if traj.ndim == 2:
        traj = traj[..., None]
    flat = traj.reshape(-1, traj.shape[-1])
    return {
        "mean": jnp.mean(flat, axis=0),
        "std": jnp.std(flat, axis=0),
        "r_hat": potential_scale_reduction(traj),
        "ess": effective_sample_size(traj),
        "n_chains": traj.shape[0],
        "n_draws": traj.shape[1],
    }

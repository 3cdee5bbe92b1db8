"""MCMC convergence diagnostics: split R-hat and effective sample size.

Standard definitions (Gelman et al., BDA3 / Vehtari et al. 2021 split-R-hat;
ESS via the initial-positive-sequence autocorrelation estimator), vectorized
over parameters. Both functions are pure jnp — they compose with ``jit``
(all shapes static), and ``ess`` computes every autocovariance lag in one
FFT instead of a Python loop over lags (one dispatch instead of
O(max_lag)).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

__all__ = ["split_rhat", "ess"]


def _split(chains: jnp.ndarray) -> jnp.ndarray:
    """[c, n, ...] -> [2c, n//2, ...]"""
    c, n = chains.shape[:2]
    half = n // 2
    a = chains[:, :half]
    b = chains[:, half: 2 * half]
    return jnp.concatenate([a, b], axis=0)


def split_rhat(chains: jnp.ndarray) -> jnp.ndarray:
    """Split-R-hat. ``chains``: [n_chains, n_samples, ...] -> [...]."""
    x = _split(jnp.asarray(chains))
    c, n = x.shape[:2]
    chain_means = x.mean(axis=1)  # [c, ...]
    chain_vars = x.var(axis=1, ddof=1)  # [c, ...]
    between = n * chain_means.var(axis=0, ddof=1)
    within = chain_vars.mean(axis=0)
    var_est = (n - 1) / n * within + between / n
    return jnp.sqrt(var_est / within)


def ess(chains: jnp.ndarray, max_lag: int | None = None) -> jnp.ndarray:
    """Bulk effective sample size. ``chains``: [n_chains, n_samples, ...].

    All lags' autocovariances come from one zero-padded FFT
    (``acov[k] = ifft(|fft(xc)|^2)[k] / n``), so the whole estimator is a
    fixed-shape jnp program: it runs under ``jit`` and costs one dispatch
    regardless of ``max_lag`` (the previous implementation looped over lags
    in Python — O(max_lag) eager dispatches).
    """
    x = _split(jnp.asarray(chains))
    c, n = x.shape[:2]
    if max_lag is None:
        max_lag = min(n - 1, 1000)
    max_lag = min(int(max_lag), n)
    xc = x - x.mean(axis=1, keepdims=True)
    # autocovariance at every lag via one FFT (padded to avoid circularity)
    size = 1 << int(np.ceil(np.log2(max(2 * n, 2))))
    f = jnp.fft.rfft(xc, n=size, axis=1)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=size, axis=1)[:, :max_lag] / n
    rho_per_chain = jnp.moveaxis(acov, 1, 0)  # [L, c, ...]
    var0 = rho_per_chain[0]
    # combine with between-chain variance (Vehtari et al. 2021 eq. 10)
    chain_means = x.mean(axis=1)
    w = var0.mean(axis=0)
    between = chain_means.var(axis=0, ddof=1)
    var_plus = w * (n - 1) / n + between
    rho = 1.0 - (w - rho_per_chain.mean(axis=1)) / var_plus  # [L, ...]
    # initial positive sequence: sum pairs until a pair goes negative
    even = rho[0::2][: max_lag // 2]
    odd = rho[1::2][: max_lag // 2]
    pair = even + odd
    pos = jnp.cumprod(pair > 0, axis=0).astype(rho.dtype)
    tau = -1.0 + 2.0 * jnp.sum(pair * pos, axis=0)
    tau = jnp.maximum(tau, 1e-3)
    return c * n / tau

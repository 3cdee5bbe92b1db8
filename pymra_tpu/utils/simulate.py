"""Gaussian-random-field simulators.

Equivalents of the reference simulators (pyMRA/MRATools.py:395-484) built on
``jax.random`` with explicit PRNG keys (the reference seeds the numpy global
RNG; SURVEY quirk #5 shows why implicit RNG state is a correctness bug here).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["simulate_grf", "make_observations"]


def simulate_grf(key, locs, covfn, mean=0.0, jitter: float = 0.0):
    """Draw one sample of a GRF with covariance ``covfn`` at ``locs``.

    Equivalent of ``simulateGRF``/``simulate1D`` (MRATools.py:395-484): dense
    Cholesky of the covariance times standard normals. ``covfn`` may be a
    callable ``locs -> cov`` (e.g. a :class:`pymra_tpu.kernels.Kernel`), a
    dense covariance matrix, or a pre-computed Cholesky factor wrapped in a
    tuple ``("chol", L)``.

    Returns a ``[n]`` vector (the reference returns matrix shapes that
    callers immediately reshape around — SURVEY quirk #12).
    """
    locs = jnp.asarray(locs)
    n = locs.shape[0]
    if isinstance(covfn, tuple) and covfn[0] == "chol":
        chol = covfn[1]
    else:
        cov = covfn(locs) if callable(covfn) else jnp.asarray(covfn)
        if jitter:
            cov = cov + jitter * jnp.eye(n, dtype=cov.dtype)
        chol = jnp.linalg.cholesky(cov)
    z = jax.random.normal(key, (n,), dtype=chol.dtype)
    return chol @ z + mean


def make_observations(key, x, me_scale, frac_obs: float = 1.0):
    """Add measurement error and knock out a fraction of values as missing.

    Mirrors the observation-generation pattern of the reference test scripts
    (pyMRA/tests/unit-tests.py:35-45): ``y = x + sqrt(R) * eps`` with a random
    subset observed and the rest NaN.

    Returns ``(y_obs, obs_mask)`` where ``y_obs`` has NaN at missing entries.
    """
    x = jnp.asarray(x).ravel()
    n = x.shape[0]
    k_eps, k_obs = jax.random.split(key)
    y = x + jnp.sqrt(me_scale) * jax.random.normal(k_eps, (n,), dtype=x.dtype)
    n_obs = int(round(n * frac_obs))
    perm = jax.random.permutation(k_obs, n)
    mask = jnp.zeros(n, dtype=bool).at[perm[:n_obs]].set(True)
    y_obs = jnp.where(mask, y, jnp.nan)
    return y_obs, mask

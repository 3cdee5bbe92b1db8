"""Gaussian-random-field simulators.

Equivalents of the reference simulators (pyMRA/MRATools.py:395-484) built on
``jax.random`` with explicit PRNG keys (the reference seeds the numpy global
RNG; SURVEY quirk #5 shows why implicit RNG state is a correctness bug here).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["simulate_grf", "simulate_grf_grid", "make_observations"]


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


def simulate_grf_grid(seed, nx, covfn, ny=0, lbx=0.0, ubx=1.0,
                      lby=0.0, uby=1.0, dtype="float32"):
    """Exact stationary-GRF sample on a regular 2-D grid in O(N log N).

    Circulant embedding: the grid covariance is nested-block-Toeplitz, so
    embedding it in a doubly-circulant matrix on a ``2nx x 2ny`` torus
    diagonalizes it by the 2-D DFT. One FFT of the base row gives the
    eigenvalues; one inverse FFT of spectrally-scaled complex normals gives
    TWO independent samples (real and imaginary parts); the ``ny x nx``
    corner is an exact draw of the field. The reference can only simulate
    via dense Cholesky (pyMRA/MRATools.py:435-484) — O(N^3), infeasible
    beyond ~2*10^4 points; this generates the N=10^6 benchmark fields
    exactly.

    The embedding uses the torus minimum-image distance; for points inside
    the corner that equals the true distance, so the restriction is exact
    whenever the eigenvalues come out non-negative (tiny negative values
    from float round-off are clipped; a warning is raised if the clipped
    mass is material).

    Args:
      seed: integer seed (numpy RNG; host-side sampling).
      nx, ny: grid size, matching :func:`gen_locations_2d` (row order:
        x fastest).
      covfn: isotropic covariance of distance, e.g. a
        :class:`pymra_tpu.kernels.Kernel` (called with two point sets) or a
        callable ``d -> cov(d)``.

    Returns:
      ``[nx * ny]`` float array in ``gen_locations_2d`` row order.
    """
    import warnings

    import numpy as np

    if not ny:
        ny = nx
    dx = (ubx - lbx) / (nx - 1) if nx > 1 else 1.0
    dy = (uby - lby) / (ny - 1) if ny > 1 else 1.0
    mx, my = 2 * nx, 2 * ny
    ix = np.minimum(np.arange(mx), mx - np.arange(mx)) * dx
    iy = np.minimum(np.arange(my), my - np.arange(my)) * dy
    d = np.sqrt(ix[None, :] ** 2 + iy[:, None] ** 2)  # [my, mx]
    # Kernel-style callable of two point sets vs plain ``d -> cov(d)``:
    # only an arity mismatch (TypeError) on the probe call falls back to
    # the distance form — any other failure inside a Kernel must surface,
    # not be silently re-tried with a distance matrix (wrong base row).
    try:
        covfn(np.zeros((1, 2)), np.zeros((1, 2)))
        two_point_sets = True
    except TypeError:
        two_point_sets = False
    if two_point_sets:
        base = np.asarray(
            covfn(np.stack([d.ravel(), np.zeros(d.size)], -1),
                  np.zeros((1, 2)))
        ).reshape(d.shape)
    else:
        base = np.asarray(covfn(d))
    lam = np.fft.fft2(base).real
    neg = lam < 0
    if neg.any():
        mass = -lam[neg].sum() / lam[~neg].sum()
        if mass > 1e-6:
            warnings.warn(
                f"circulant embedding clipped {mass:.2e} negative spectral "
                "mass; sample is approximate (enlarge the embedding)"
            )
        lam = np.maximum(lam, 0.0)
    rng = np.random.default_rng(seed)
    e = rng.standard_normal((my, mx)) + 1j * rng.standard_normal((my, mx))
    f = np.fft.fft2(np.sqrt(lam / (mx * my)) * e)
    sample = f.real[:ny, :nx]  # one of the two independent draws
    return sample.reshape(-1).astype(dtype)

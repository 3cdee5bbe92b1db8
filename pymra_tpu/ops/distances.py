"""Pairwise-distance primitives for covariance evaluation.

TPU-native replacement for the reference's ``scipy.spatial.distance`` usage
(reference: pyMRA/MRATools.py:229-245 ``dist`` with the optional circular
(periodic unit-interval) metric). Distances are computed with the
``|a|^2 + |b|^2 - 2 a.b`` expansion so the inner product rides the MXU, and
everything is batched/broadcastable so callers can ``vmap`` over node batches.
"""
from __future__ import annotations

import jax.numpy as jnp


def _as2d(x: jnp.ndarray) -> jnp.ndarray:
    x = jnp.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    return x


def sqdist(locs1: jnp.ndarray, locs2: jnp.ndarray | None = None) -> jnp.ndarray:
    """Squared Euclidean distance matrix, MXU-friendly.

    Args:
      locs1: ``[..., n, d]`` points.
      locs2: ``[..., m, d]`` points (defaults to ``locs1``).

    Returns:
      ``[..., n, m]`` squared distances, clamped at zero to absorb the
      cancellation error of the quadratic expansion.
    """
    a = _as2d(locs1)
    self_pair = locs2 is None
    b = a if self_pair else _as2d(locs2)
    d = a.shape[-1]
    if d <= 4:
        # Low-dimensional (spatial) case: direct coordinate differences.
        # This is both cheaper than an MXU matmul at d=2-3 and numerically
        # exact for nearby points — the |a|^2+|b|^2-2ab expansion loses all
        # significance when points are ~1e-3 apart on a unit domain (fatal
        # for fine-grid covariance blocks in float32, especially with TPU
        # matmul accumulation).
        diff = a[..., :, None, :] - b[..., None, :, :]
        return jnp.sum(diff * diff, axis=-1)
    a2 = jnp.sum(a * a, axis=-1)[..., :, None]
    b2 = jnp.sum(b * b, axis=-1)[..., None, :]
    ab = jnp.matmul(a, jnp.swapaxes(b, -1, -2), precision="highest")
    d2 = jnp.maximum(a2 + b2 - 2.0 * ab, 0.0)
    if self_pair:
        # exact zeros on the diagonal (cancellation leaves ~eps residue,
        # which would break kernels that test d == 0)
        n = a.shape[-2]
        d2 = d2 * (1.0 - jnp.eye(n, dtype=d2.dtype))
        d2 = 0.5 * (d2 + jnp.swapaxes(d2, -1, -2))
    return d2


def dist(
    locs1: jnp.ndarray,
    locs2: jnp.ndarray | None = None,
    circular: bool = False,
) -> jnp.ndarray:
    """Distance matrix between two point sets.

    Mirrors the reference ``dist`` (pyMRA/MRATools.py:229-245): Euclidean by
    default; with ``circular=True`` the 1-D unit-interval wrap-around metric
    ``min(|a-b|, 1-|a-b|)`` used by the periodic-domain kernels.
    """
    if circular:
        a = _as2d(locs1)[..., :, 0]
        b = a if locs2 is None else _as2d(locs2)[..., :, 0]
        diff = jnp.abs(a[..., :, None] - b[..., None, :])
        return jnp.minimum(diff, 1.0 - diff)
    return jnp.sqrt(sqdist(locs1, locs2))

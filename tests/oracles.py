"""Exact dense-GP oracles for validating the MRA sweep.

This replicates the oracle *pattern* of the reference's unit tests
(pyMRA/tests/unit-tests.py:54-71): exact kriging and the exact marginal
likelihood computed by dense numpy linear algebra, against which MRA is
provably exact in screening configurations (M=0; or 1-D exponential kernel
with knots on partition boundaries).
"""
from __future__ import annotations

import numpy as np


def exact_gp(sig: np.ndarray, y_obs: np.ndarray, r_scalar: float):
    """Dense-GP reference answers.

    Args:
      sig: [N, N] prior covariance at all locations.
      y_obs: [N] observations, NaN = missing.
      r_scalar: measurement-error variance (scalar, [N] diagonal, or a
        full [N, N] covariance matrix).

    Returns:
      dict with 'objective' (= logdet(Sigma_y) + y^T Sigma_y^{-1} y, the
      reference getLikelihood convention), 'loglik', 'mean' [N], 'sd' [N].
    """
    y_obs = np.asarray(y_obs, dtype=np.float64).ravel()
    mask = np.isfinite(y_obs)
    yo = y_obs[mask]
    n_obs = int(mask.sum())
    sig_oo = sig[np.ix_(mask, mask)]
    r_arr = np.asarray(r_scalar, dtype=np.float64)
    if r_arr.ndim == 2:
        sig_y = sig_oo + r_arr[np.ix_(mask, mask)]
    else:
        r_diag = np.broadcast_to(r_arr, y_obs.shape)
        sig_y = sig_oo + np.diag(r_diag[mask])
    chol = np.linalg.cholesky(sig_y)
    alpha = np.linalg.solve(sig_y, yo)
    logdet = 2.0 * np.sum(np.log(np.diag(chol)))
    quad = float(yo @ alpha)
    objective = logdet + quad
    loglik = -0.5 * (objective + n_obs * np.log(2 * np.pi))

    # posterior over ALL locations
    sig_ao = sig[:, mask]
    mean = sig_ao @ alpha
    half = np.linalg.solve(chol, sig_ao.T)
    var = np.diag(sig) - np.sum(half * half, axis=0)
    return {
        "objective": objective,
        "loglik": loglik,
        "mean": mean,
        "sd": np.sqrt(np.maximum(var, 0.0)),
    }

"""Evaluation / scoring metrics.

Equivalents of the reference scoring toolbox (pyMRA/MRATools.py:62-139):
``MSE`` -> :func:`rmse`, ``KLdiv`` -> :func:`kl_divergence`,
``logscore`` -> :func:`logscore`. Pure jnp, Cholesky-based (no explicit
inverses), differentiable.
"""
from __future__ import annotations

import jax.numpy as jnp
import jax.scipy.linalg as jsl

__all__ = ["rmse", "mse", "kl_divergence", "logscore"]


def rmse(x_pred, x_true=0.0):
    """Root-mean-square error (the reference's ``MSE``, MRATools.py:62-67,
    which despite its name returns the *root* MSE)."""
    x_pred = jnp.asarray(x_pred)
    diff = (x_pred - x_true).ravel()
    return jnp.sqrt(jnp.mean(diff * diff))


# Alias kept for reference-API familiarity; see :func:`rmse` docstring.
mse = rmse


def kl_divergence(mu0, mu1, sig0, sig1):
    """KL(N(mu0, sig0) || N(mu1, sig1)) between dense Gaussians.

    Same quantity as the reference ``KLdiv`` (MRATools.py:97-113) but computed
    through Cholesky factors: trace and log-det terms via triangular solves.
    """
    mu0 = jnp.asarray(mu0).ravel()
    mu1 = jnp.asarray(mu1).ravel()
    n = mu0.shape[0]
    l0 = jnp.linalg.cholesky(jnp.asarray(sig0))
    l1 = jnp.linalg.cholesky(jnp.asarray(sig1))
    m = jsl.solve_triangular(l1, l0, lower=True)
    trace_term = jnp.sum(m * m) - n
    logdet_term = 2.0 * (jnp.sum(jnp.log(jnp.diag(l1))) - jnp.sum(jnp.log(jnp.diag(l0))))
    w = jsl.solve_triangular(l1, mu1 - mu0, lower=True)
    mean_term = jnp.sum(w * w)
    return 0.5 * (trace_term + logdet_term + mean_term)


def logscore(obs, mu_pred, sig_pred):
    """Gaussian log-density of the predictive at the observed entries.

    Equivalent of ``logscore`` (MRATools.py:121-139): restrict to the finite
    entries of ``obs`` and evaluate ``log N(y_obs; mu, Sig)`` there. Uses a
    NaN-masked Cholesky on the observed sub-matrix (host callers should pass
    the dense predictive covariance).
    """
    obs = jnp.asarray(obs).ravel()
    mu = jnp.asarray(mu_pred).ravel()
    mask = jnp.isfinite(obs)
    idx = jnp.where(mask)[0]  # host-side (concrete) selection
    y = obs[idx]
    m = mu[idx]
    sig = jnp.asarray(sig_pred)[jnp.ix_(idx, idx)]
    n = y.shape[0]
    chol = jnp.linalg.cholesky(sig)
    w = jsl.solve_triangular(chol, y - m, lower=True)
    return (
        -0.5 * jnp.sum(w * w)
        - jnp.sum(jnp.log(jnp.diag(chol)))
        - 0.5 * n * jnp.log(2.0 * jnp.pi)
    )

"""Maximum-likelihood estimation of kernel hyper-parameters.

The reference does MLE by wrapping a full tree rebuild in
``scipy.optimize.minimize(..., method='nelder-mead')`` (README.md:96-105,
SURVEY §3.3) at ~0.25 evaluations/second. Here the tree plan is static and
the likelihood differentiable, so we offer:

  * :func:`fit_mle` with ``method='nelder-mead'`` — reference-parity
    derivative-free optimization, but each objective evaluation is one jitted
    sweep instead of a tree rebuild;
  * ``method='adam'`` / ``'lbfgs'`` — gradient-based optimization of the same
    objective via optax, impossible in the reference.

Positive parameters are optimized in log-space.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fit_mle", "nelder_mead"]


def nelder_mead(f: Callable, x0: np.ndarray, *, max_iter: int = 200,
                xatol: float = 1e-5, fatol: float = 1e-7):
    """Minimize ``f`` with scipy's Nelder-Mead (host loop, jitted objective).

    Mirrors the reference's optimizer call (README.md:103-104).
    """
    import scipy.optimize as opt

    res = opt.minimize(
        lambda x: float(f(jnp.asarray(x))),
        np.asarray(x0, dtype=np.float64),
        method="nelder-mead",
        options={"maxiter": max_iter, "xatol": xatol, "fatol": fatol},
    )
    return res


def fit_mle(
    loglik_fn: Callable,
    theta0: dict,
    *,
    method: str = "lbfgs",
    steps: int = 200,
    learning_rate: float = 5e-2,
    positive: tuple = None,
):
    """Maximize ``loglik_fn(theta)`` over a dict of scalar parameters.

    Args:
      loglik_fn: differentiable ``theta_dict -> loglik`` (e.g. from
        :meth:`pymra_tpu.tree.model.MRAModel.loglik_fn` composed with a
        kernel builder).
      theta0: initial parameter dict (e.g. ``{"l": 0.3, "sig": 1.0}``).
      method: ``'lbfgs'``, ``'adam'``, or ``'nelder-mead'``.
      positive: names optimized in log-space; default = all.

    Returns:
      dict with ``theta`` (optimum), ``loglik``, ``converged``, ``history``.
    """
    names = sorted(theta0)
    if positive is None:
        positive = tuple(names)

    def pack(theta: dict) -> jnp.ndarray:
        return jnp.stack([
            jnp.log(jnp.asarray(theta[k], dtype=jnp.result_type(float)))
            if k in positive else jnp.asarray(theta[k])
            for k in names
        ])

    def unpack(x: jnp.ndarray) -> dict:
        return {
            k: jnp.exp(x[i]) if k in positive else x[i]
            for i, k in enumerate(names)
        }

    def neg_obj(x):
        return -loglik_fn(unpack(x))

    x0 = pack(theta0)

    if method == "nelder-mead":
        f = jax.jit(neg_obj)
        res = nelder_mead(f, np.asarray(x0), max_iter=50 * steps)
        xopt = jnp.asarray(res.x)
        return {
            "theta": {k: float(v) for k, v in unpack(xopt).items()},
            "loglik": -float(res.fun),
            "converged": bool(res.success),
            "n_evals": int(res.nfev),
        }

    import optax

    if method == "adam":
        solver = optax.adam(learning_rate)

        @jax.jit
        def step(x, state):
            value, grad = jax.value_and_grad(neg_obj)(x)
            updates, state = solver.update(grad, state)
            return optax.apply_updates(x, updates), state, value

    elif method == "lbfgs":
        solver = optax.lbfgs()
        value_and_grad = optax.value_and_grad_from_state(neg_obj)

        @jax.jit
        def step(x, state):
            value, grad = value_and_grad(x, state=state)
            updates, state = solver.update(
                grad, state, x, value=value, grad=grad, value_fn=neg_obj
            )
            return optax.apply_updates(x, updates), state, value

    else:
        raise ValueError(f"unknown method {method!r}")

    x = x0
    state = solver.init(x)
    history = []
    prev = np.inf
    converged = False
    for i in range(steps):
        x, state, value = step(x, state)
        v = float(value)
        history.append(v)
        if np.isfinite(prev) and abs(prev - v) < 1e-10 * max(1.0, abs(v)):
            converged = True
            break
        prev = v
    theta = unpack(x)
    return {
        "theta": {k: float(v) for k, v in theta.items()},
        "loglik": -float(neg_obj(x)),
        "converged": converged,
        "history": history,
    }

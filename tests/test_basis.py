"""Basis-matrix assembly tests: the covariance-reconstruction identities the
reference checks by hand in pyMRA/tests/debug-posterior.py:82-98 and
pyMRA/tests/test-row-order.py:98-102."""
import jax
import numpy as np

from pymra_tpu import kernels
from pymra_tpu.tree.basis import basis_matrix
from pymra_tpu.tree.model import MRAModel
from pymra_tpu.utils import gen_locations, make_observations, simulate_grf

from .oracles import exact_gp


def _setup(n=45, r=2, M=2, J=3, me=1e-2, seed=11):
    locs = gen_locations(n)
    kern = kernels.Kernel("exponential", l=0.3)
    x = simulate_grf(jax.random.key(seed), locs, kern, jitter=1e-10)
    y, _ = make_observations(jax.random.key(seed + 1), x, me, 0.5)
    model = MRAModel(locs, r=r, M=M, J=J)
    return locs, kern, np.asarray(y), model


class TestPriorBasis:
    def test_prior_reconstruction_screening(self):
        """In the 1-D exponential screening config the MRA prior is exact:
        B_kc @ B_kc.T must equal the full covariance."""
        locs, kern, y, model = _setup()
        B = basis_matrix(model, kern, times_kc=True)
        sigma = np.asarray(kern(locs))
        np.testing.assert_allclose(B @ B.T, sigma, atol=1e-8)

    def test_shapes_and_block_structure(self):
        locs, kern, y, model = _setup()
        Bs = basis_matrix(model, kern, group_by_resolution=True)
        assert Bs[0].shape == (45, model.plan.r)  # root block
        # level-1 columns: one r-block per interior node
        g1 = model.plan.levels[1]
        assert Bs[1].shape[1] == g1.n_int * model.plan.r + int(
            g1.leaf_is_knot.sum()
        )
        # total basis count = N (each location is a knot exactly once)
        total = sum(b.shape[1] for b in Bs)
        assert total == 45

    def test_leaf_order_permutation(self):
        locs, kern, y, model = _setup()
        B_root = basis_matrix(model, kern)
        B_leaves = basis_matrix(model, kern, order="leaves")
        # same rows, permuted
        assert sorted(map(tuple, B_root.round(12))) == sorted(
            map(tuple, B_leaves.round(12))
        )


class TestPosteriorBasis:
    def test_posterior_reconstruction_screening(self):
        """BTil_kc @ BTil_kc.T must equal the exact posterior covariance in
        the screening config (the debug-posterior identity)."""
        locs, kern, y, model = _setup(me=1e-2)
        B = basis_matrix(model, kern, y=y, R=1e-2, distr="posterior",
                         times_kc=True)
        sigma = np.asarray(kern(locs))
        mask = np.isfinite(y)
        h = np.eye(len(locs))[mask]
        sig_post = np.linalg.inv(
            np.linalg.inv(sigma) + h.T @ h / 1e-2
        )
        np.testing.assert_allclose(B @ B.T, sig_post, atol=1e-7)

    def test_posterior_diag_matches_sweep_var(self):
        locs, kern, y, model = _setup()
        res = model.sweep(kern, y, 1e-2)
        B = basis_matrix(model, kern, y=y, R=1e-2, distr="posterior",
                         times_kc=True)
        np.testing.assert_allclose(
            np.sum(B * B, axis=1), np.asarray(res.var), atol=1e-8
        )


class TestViz:
    def test_draw_functions_run_headless(self, tmp_path):
        import matplotlib

        matplotlib.use("Agg")
        from pymra_tpu.utils import viz

        locs, kern, y, model = _setup(n=27, M=1)
        viz.draw_knots(model, fname=tmp_path / "knots.png")
        viz.draw_b_matrix(model, kern, fname=tmp_path / "b.png")
        viz.draw_sparsity_pattern(model, kern, fname=tmp_path / "sp.png")
        viz.draw_basis_functions(model, kern, fname=tmp_path / "bf.png")
        viz.draw_grid_and_obs(model, y, fname=tmp_path / "grid.png")
        assert (tmp_path / "knots.png").exists()
        assert (tmp_path / "b.png").exists()

    def test_get_layout_and_filter(self):
        from pymra_tpu.utils.viz import filter_nnz, get_layout

        assert get_layout(0, 3, 2) == (1, 2)
        assert get_layout(1, 3, 2) == (2, 3)
        x = np.array([[0.0, 1e-12], [3.0, -2.0]])
        np.testing.assert_array_equal(
            filter_nnz(x, tol=1e-10), [[0, 0], [1, 1]]
        )


class TestAncestorBasisAccessors:
    """Public getB_lk / getKNode diagnostics (reference MRATree.py:359-430 —
    degenerate at reference HEAD, SURVEY quirk #3; functional here)."""

    def test_getknode_walks_path(self):
        from pymra_tpu.tree.model import MRATree

        locs, kern, y, _ = _setup()
        tree = MRATree(locs, 2, kern, y, 1e-2, M=2, J=3)
        leaves = [nd for nd in tree.model.plan.nodes[2] if nd.is_leaf]
        leaf = leaves[0]
        ID = leaf.node_id
        assert ID[0] == "r" and len(ID) == 3
        assert tree.getKNode(ID, 0) is tree.model.plan.nodes[0][0]
        assert tree.getKNode(ID, 2) is leaf
        assert tree.getKNode(ID, 1) is leaf.parent

    def test_getb_lk_matches_sweep_chain_blocks(self):
        """getB_lk's dense joint-conditioning must reproduce the device
        sweep's per-leaf ancestor-basis blocks (Bstack)."""
        from pymra_tpu.tree.model import MRATree
        from pymra_tpu.tree.sweep import mra_sweep

        locs, kern, y, _ = _setup()
        tree = MRATree(locs, 2, kern, y, 1e-2, M=2, J=3)
        model = tree.model
        r = model.plan.r
        _, internals = mra_sweep(
            model.dplan, kern, y, 1e-2, compute_posterior=True,
            jitter=0.0, keep_internals=True,
        )
        m = 2
        leaves = [nd for nd in model.plan.nodes[m] if nd.is_leaf]
        assert leaves, "test premise: leaves at the deepest level"
        for li in (0, len(leaves) - 1):
            leaf = leaves[li]
            ID = leaf.node_id
            Bstack = np.asarray(internals["leaf"][m]["Bstack"][li])
            for k in range(m):
                got = tree.getB_lk(ID, k)
                want = Bstack[: leaf.n_locs, k * r:(k + 1) * r]
                np.testing.assert_allclose(got, want, atol=1e-9)

    def test_getb_lk_restricted_l(self):
        from pymra_tpu.tree.model import MRATree

        locs, kern, y, _ = _setup()
        tree = MRATree(locs, 2, kern, y, 1e-2, M=2, J=3)
        leaves = [nd for nd in tree.model.plan.nodes[2] if nd.is_leaf]
        ID = leaves[0].node_id
        full = tree.getB_lk(ID, 0, l=1)  # ancestor-1's whole domain
        sub = tree.getB_lk(ID, 0)  # just the leaf's rows
        parent = tree.getKNode(ID, 1)
        rows = np.searchsorted(parent.loc_gidx, leaves[0].loc_gidx)
        np.testing.assert_allclose(full[rows], sub, atol=1e-12)

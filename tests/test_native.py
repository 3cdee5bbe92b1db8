"""Native (C++) planner-core tests: build, correctness vs numpy, determinism,
and end-to-end use inside the tree planner."""
import numpy as np
import pytest

from pymra_tpu.ops import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no compiler / native lib unavailable"
)


class TestKMeans:
    def test_clusters_well_separated(self):
        rng = np.random.default_rng(0)
        pts = np.concatenate([
            rng.normal(loc, 0.05, size=(50, 2))
            for loc in ([0, 0], [5, 0], [0, 5])
        ])
        centers, labels = native.kmeans(pts, 3, seed=1)
        # each true cluster maps to exactly one label
        for lo in range(0, 150, 50):
            assert len(set(labels[lo:lo + 50].tolist())) == 1
        assert len(set(labels.tolist())) == 3
        # centers near the true means
        got = np.sort(centers, axis=0)
        want = np.sort(np.array([[0, 0], [5, 0], [0, 5]]), axis=0)
        np.testing.assert_allclose(got, want, atol=0.1)

    def test_deterministic(self):
        rng = np.random.default_rng(1)
        pts = rng.uniform(size=(80, 2))
        c1, l1 = native.kmeans(pts, 4, seed=7)
        c2, l2 = native.kmeans(pts, 4, seed=7)
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_array_equal(l1, l2)

    def test_inertia_close_to_sklearn(self):
        sklearn = pytest.importorskip("sklearn.cluster")
        rng = np.random.default_rng(2)
        pts = rng.uniform(size=(120, 2))
        centers, labels = native.kmeans(pts, 5, seed=3)
        inertia = sum(
            ((pts[labels == c] - centers[c]) ** 2).sum() for c in range(5)
        )
        sk = sklearn.KMeans(n_clusters=5, random_state=0, n_init=10).fit(pts)
        assert inertia < 1.3 * sk.inertia_

    def test_batch(self):
        rng = np.random.default_rng(3)
        sets = [rng.uniform(size=(n, 2)) for n in (30, 55, 17)]
        pts = np.concatenate(sets)
        offsets = np.array([0, 30, 85, 102])
        centers, labels = native.kmeans_batch(pts, offsets, 4, seed=5)
        assert centers.shape == (3, 4, 2)
        # batch result matches per-set calls with the derived seeds
        for i, (lo, hi) in enumerate(zip(offsets[:-1], offsets[1:])):
            c, l = native.kmeans(pts[lo:hi], 4, seed=5 + i)
            np.testing.assert_array_equal(labels[lo:hi], l)

    def test_k_equals_n(self):
        pts = np.random.default_rng(4).uniform(size=(5, 2))
        centers, labels = native.kmeans(pts, 5, seed=0)
        assert sorted(labels.tolist()) == [0, 1, 2, 3, 4]


class TestQuadrantSplit:
    def test_matches_numpy(self):
        rng = np.random.default_rng(5)
        pts = rng.uniform(size=(200, 2))
        labels = native.quadrant_split(pts)
        mx, my = pts[:, 0].mean(), pts[:, 1].mean()
        want = (pts[:, 0] > mx).astype(int) * 2 + (pts[:, 1] > my).astype(int)
        np.testing.assert_array_equal(labels, want)


class TestPlannerIntegration:
    def test_native_plan_valid(self):
        from pymra_tpu.tree.plan import PlanConfig, build_plan
        from pymra_tpu.utils.locations import gen_locations_2d

        from .test_plan import _check_invariants

        locs = gen_locations_2d(12)
        cfg = PlanConfig(r=4, kmeans_impl="native")
        plan = build_plan(locs, 4, M=2, config=cfg)
        _check_invariants(plan)

    def test_native_plan_numerics(self):
        """A natively-planned tree is a valid MRA tree: likelihood close to
        the sklearn-planned one and posterior close to kriging."""
        import jax

        from pymra_tpu import kernels
        from pymra_tpu.tree.model import MRAModel
        from pymra_tpu.tree.plan import PlanConfig
        from pymra_tpu.utils import (
            gen_locations_2d,
            make_observations,
            simulate_grf,
        )

        from .oracles import exact_gp

        locs = gen_locations_2d(10)
        kern = kernels.Kernel("matern32", l=0.5)
        x = simulate_grf(jax.random.key(0), locs, kern, jitter=1e-10)
        y, _ = make_observations(jax.random.key(1), x, 1e-4, 0.7)
        y = np.asarray(y)
        oracle = exact_gp(np.asarray(kern(locs)), y, 1e-4)

        m_native = MRAModel(locs, r=4, M=2, J=4,
                            config=PlanConfig(r=4, kmeans_impl="native"))
        res = m_native.sweep(kern, y, 1e-4)
        err = np.abs(np.asarray(res.mean) - oracle["mean"]).max()

        m_sk = MRAModel(locs, r=4, M=2, J=4,
                        config=PlanConfig(r=4, kmeans_impl="sklearn"))
        res_sk = m_sk.sweep(kern, y, 1e-4)
        err_sk = np.abs(np.asarray(res_sk.mean) - oracle["mean"]).max()
        # a natively-planned tree must be at least comparable in quality to
        # the sklearn-planned one (max pointwise error is plan-noisy at
        # small r; on this config the native plan is actually better)
        assert err < 1.5 * err_sk + 1e-6

"""Planner structural invariants (reference semantics per MRANode.py:34-60,
179-340 and MRATree.py:31-50)."""
import numpy as np
import pytest

from pymra_tpu.tree.plan import PlanConfig, build_plan, derive_tree_shape
from pymra_tpu.utils import gen_locations, gen_locations_2d


class TestShapeDerivation:
    def test_defaults_1d(self):
        # reference default for 1-D is J = r + 1 (fixing the MRATree.py:33
        # no-op comparison bug, SURVEY quirk #1)
        M, J = derive_tree_shape(100, r=2, d=1)
        assert J == 3

    def test_defaults_2d(self):
        M, J = derive_tree_shape(100, r=4, d=2)
        assert J == 4
        # maxM = int(log(N*J/r + 1)/log(J)) - 1  (MRATree.py:41-43)
        assert M == int(np.log(100 * 4 / 4 + 1) / np.log(4)) - 1

    def test_m_clamped(self):
        M, J = derive_tree_shape(100, r=4, d=2, M=99)
        assert M == int(np.log(101) / np.log(4)) - 1


def _check_invariants(plan):
    n = plan.n_locs
    # every level's nodes partition all N locations
    for m, nodes in enumerate(plan.nodes):
        if not nodes:
            continue
        all_locs = np.sort(np.concatenate([nd.loc_gidx for nd in nodes]))
        covered = set(all_locs.tolist())
        # levels below may already have ended in leaves; collect leaves above
        for mm in range(m):
            for nd in plan.nodes[mm]:
                if nd.is_leaf:
                    covered |= set(nd.loc_gidx.tolist())
        assert covered == set(range(n)), f"level {m} does not cover all locations"
    # knots are disjoint across the whole tree and cover everything
    all_knots = np.concatenate(
        [nd.knot_gidx for nodes in plan.nodes for nd in nodes]
    )
    assert len(all_knots) == len(set(all_knots.tolist())), "knot reuse"
    assert set(all_knots.tolist()) == set(range(n)), "knots+leaves must cover"
    # interior nodes have exactly r knots
    for nodes in plan.nodes:
        for nd in nodes:
            if not nd.is_leaf:
                assert nd.n_knots == plan.r
    # children partition parents
    for nodes in plan.nodes:
        for nd in nodes:
            if nd.children:
                ch = np.sort(np.concatenate([c.loc_gidx for c in nd.children]))
                assert np.array_equal(ch, np.sort(nd.loc_gidx))


class TestPlans:
    @pytest.mark.parametrize(
        "n,d,r,M,J",
        [
            (100, 1, 2, 3, 3),
            (100, 2, 4, -1, -1),
            (30, 1, 2, 3, 3),  # early leaves
            (300, 2, 4, 2, -1),  # coord-split path (N > 100)
            (64, 2, 3, 2, 3),  # kmeans J-splits
        ],
    )
    def test_invariants(self, n, d, r, M, J):
        if d == 1:
            locs = gen_locations(n)
        else:
            side = int(np.sqrt(n))
            locs = gen_locations_2d(side, ny=n // side)
        plan = build_plan(locs, r, M=M, J=J, seed=0)
        _check_invariants(plan)

    def test_determinism(self):
        locs = gen_locations_2d(20)  # 400 locs -> random knot path
        p1 = build_plan(locs, 4, seed=7)
        p2 = build_plan(locs, 4, seed=7)
        for g1, g2 in zip(p1.levels, p2.levels):
            np.testing.assert_array_equal(g1.int_knot_gidx, g2.int_knot_gidx)
            np.testing.assert_array_equal(g1.leaf_loc_gidx, g2.leaf_loc_gidx)

    def test_seed_changes_random_knots(self):
        locs = gen_locations_2d(20)
        p1 = build_plan(locs, 4, seed=1)
        p2 = build_plan(locs, 4, seed=2)
        same = all(
            np.array_equal(g1.int_knot_gidx, g2.int_knot_gidx)
            for g1, g2 in zip(p1.levels, p2.levels)
        )
        assert not same

    def test_screening_split_mode(self):
        """1-D J=r+1: splits at the knots; each knot starts the next child
        (MRANode.py:300-306)."""
        locs = gen_locations(27)
        plan = build_plan(locs, 2, M=1, J=3)
        root = plan.nodes[0][0]
        knots = np.sort(root.knot_gidx)
        children = [np.sort(c.loc_gidx) for c in root.children]
        assert len(children) == 3
        assert children[1][0] == knots[0]
        assert children[2][0] == knots[1]

    def test_dfs_order_contiguous_subtrees(self):
        """Leaves of each level-1 subtree occupy a contiguous range of the
        leaf axis (the sharding invariant)."""
        locs = gen_locations_2d(16)  # 256 locs
        plan = build_plan(locs, 4, M=3)
        g = plan.levels[-1]
        if g.n_leaf == 0:
            pytest.skip("no leaves at bottom level")
        # leaf_path[:, 1] gives each leaf's level-1 ancestor; DFS order must
        # make this non-decreasing in blocks
        anc = g.leaf_path[:, 1]
        changes = np.flatnonzero(np.diff(anc) != 0)
        assert len(np.unique(anc)) == len(changes) + 1

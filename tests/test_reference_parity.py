"""Live parity against the actual reference implementation.

Runs the real pyMRA from ``/root/reference`` (via the shims in
``reference_compat``) on deterministic configurations (every node has <= 100
knot candidates, so the reference's unseeded random path — SURVEY quirk #5 —
is never taken) and requires our sweep to reproduce its tree, likelihood and
posterior to float64 accuracy.
"""
import numpy as np
import pytest

from pymra_tpu import kernels
from pymra_tpu.tree.model import MRAModel
from pymra_tpu.utils import gen_locations_2d

from .reference_compat import import_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def reference():
    return import_reference()


def _data_2d(n_side, seed, frac=0.7):
    import jax

    from pymra_tpu.utils import make_observations, simulate_grf

    locs = gen_locations_2d(n_side)
    kern = kernels.Kernel("matern32", l=0.5, sig=1.0)
    x = simulate_grf(jax.random.key(seed), locs, kern, jitter=1e-10)
    y, _ = make_observations(jax.random.key(seed + 1), x, 1e-4, frac)
    return locs, kern, np.asarray(y)


class TestLiveParity:
    def test_2d_tree_and_posterior(self, reference):
        RefMRATree, mt = reference
        locs, kern, y = _data_2d(10, 12)
        model = MRAModel(locs, r=2, M=2, J=3)
        res = model.sweep(kern, y, 1e-4)

        covf = lambda l1, l2: mt.Matern32(l1, l2, l=0.5, sig=1.0)
        ref = RefMRATree(locs, 2, covf, y.reshape(-1, 1).copy(), 1e-4, M=2, J=3)
        x_ref, sd_ref = ref.predict()
        np.testing.assert_allclose(
            np.asarray(res.mean), np.asarray(x_ref).ravel(), atol=1e-7
        )
        np.testing.assert_allclose(
            np.sqrt(np.asarray(res.var)), np.asarray(sd_ref).ravel(), atol=1e-7
        )
        np.testing.assert_allclose(
            float(res.objective), float(ref.getLikelihood()), rtol=1e-5
        )

    def test_bundled_small_dataset(self, reference):
        """The README example config on the reference's own bundled data
        (README.md:25-35: r0=4, ExpCovFun l=2, me_scale=1e-4)."""
        RefMRATree, mt = reference
        from pymra_tpu.data.loader import load_data

        locs, y_obs = load_data("small", source="reference")
        kern = kernels.Kernel("exponential", l=2.0)
        model = MRAModel(locs, r=4)
        res = model.sweep(kern, y_obs, 1e-4)

        covf = lambda l1, l2: mt.ExpCovFun(l1, l2, l=2.0)
        ref = RefMRATree(
            locs, 4, covf, y_obs.reshape(-1, 1).copy(), 1e-4
        )
        ref_obj = float(ref.getLikelihood())
        np.testing.assert_allclose(float(res.objective), ref_obj, rtol=1e-6)
        # NOTE: BASELINE.md records 914.4418 for this config, but that value
        # is an artifact of the measuring session's sklearn-KMeans shim: 2-D
        # knot selection snaps to KMeans centers (MRANode.py:195-202), so
        # the objective depends on the clustering implementation. This
        # session's reference run gives 966.7985 with our Lloyd shim. The
        # invariant worth anchoring is live agreement (asserted above) plus
        # the deterministic 1-D anchor (tests/test_golden_anchors.py).
        x_ref, sd_ref = ref.predict()
        scale = np.abs(np.asarray(x_ref)).max()
        np.testing.assert_allclose(
            np.asarray(res.mean), np.asarray(x_ref).ravel(), atol=1e-6 * scale
        )
        np.testing.assert_allclose(
            np.sqrt(np.asarray(res.var)), np.asarray(sd_ref).ravel(),
            atol=1e-6 * scale,
        )

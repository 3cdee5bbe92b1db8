"""Auxiliary-subsystem tests: checkpoint/resume, profiling, logging, chain
sharding (the subsystems SURVEY §5 lists as absent in the reference)."""
import jax
import jax.numpy as jnp
import numpy as np

from pymra_tpu import kernels
from pymra_tpu.tree.model import MRAModel
from pymra_tpu.utils import checkpoint, profiling
from pymra_tpu.utils import logging as plog
from pymra_tpu.utils import gen_locations, make_observations, simulate_grf


def _data(n=40, seed=0):
    locs = gen_locations(n)
    kern = kernels.Kernel("exponential", l=0.3)
    x = simulate_grf(jax.random.key(seed), locs, kern, jitter=1e-10)
    y, _ = make_observations(jax.random.key(seed + 1), x, 1e-2, 0.5)
    return locs, kern, np.asarray(y)


class TestCheckpoint:
    def test_plan_roundtrip(self, tmp_path):
        locs, kern, y = _data()
        model = MRAModel(locs, r=2, M=2, J=3)
        ref = model.sweep(kern, y, 1e-2)

        path = tmp_path / "plan.npz"
        checkpoint.save_plan(path, model.plan)
        plan2 = checkpoint.load_plan(path)
        model2 = MRAModel(locs, r=2, plan=plan2)
        res = model2.sweep(kern, y, 1e-2)
        np.testing.assert_allclose(
            float(res.objective), float(ref.objective), rtol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(res.mean), np.asarray(ref.mean), atol=1e-12
        )

    def test_pytree_roundtrip(self, tmp_path):
        tree = {"a": jnp.arange(5.0), "b": {"c": jnp.ones((2, 3))}}
        path = tmp_path / "state.npz"
        checkpoint.save_pytree(path, tree)
        loaded = checkpoint.load_pytree(path, like=tree)
        np.testing.assert_array_equal(np.asarray(loaded["a"]), np.arange(5.0))
        np.testing.assert_array_equal(
            np.asarray(loaded["b"]["c"]), np.ones((2, 3))
        )

    def test_pytree_roundtrip_without_template(self, tmp_path):
        """Structure must be recoverable with no `like` template (round-1
        VERDICT #7: str(treedef) is not deserializable)."""
        tree = {
            "params": {"l": jnp.asarray(0.3), "sig": jnp.ones(4)},
            "trace": [jnp.zeros((2, 2)), (jnp.arange(3), None)],
            7: jnp.asarray(1.5),
        }
        path = tmp_path / "state2.npz"
        checkpoint.save_pytree(path, tree)
        loaded = checkpoint.load_pytree(path)
        assert set(loaded.keys()) == {"params", "trace", 7}
        np.testing.assert_array_equal(
            np.asarray(loaded["params"]["sig"]), np.ones(4)
        )
        assert isinstance(loaded["trace"], list)
        inner = loaded["trace"][1]
        assert isinstance(inner, tuple) and inner[1] is None
        np.testing.assert_array_equal(np.asarray(inner[0]), np.arange(3))
        np.testing.assert_allclose(float(loaded[7]), 1.5)


class TestProfiling:
    def test_phase_timer(self):
        timer = profiling.PhaseTimer()
        with timer("phase_a"):
            sum(range(1000))
        x = jnp.ones(8)
        with timer("phase_b", sync=x):
            x = x * 2
        rep = timer.report()
        assert "phase_a" in rep and "phase_b" in rep
        d = timer.as_dict()
        assert d["phase_a"]["calls"] == 1

    def test_trace_annotation_runs(self):
        with profiling.trace_annotation("test-region"):
            jnp.ones(4).sum().block_until_ready()


class TestLogging:
    def test_configure_idempotent(self):
        log1 = plog.configure(level="DEBUG")
        log2 = plog.configure(level="INFO")
        assert log1 is log2
        assert len(log1.handlers) == 1
        child = plog.get_logger("tree.plan")
        assert child.name == "pymra_tpu.tree.plan"


class TestChainSharding:
    def test_sharded_chains_match_local(self):
        import pytest

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from pymra_tpu.infer import hmc
        from pymra_tpu.parallel import make_mesh
        from pymra_tpu.parallel.chains import shard_chains

        mesh = make_mesh({"chain": 8})

        def logp(theta):
            return -0.5 * jnp.sum(theta["x"] ** 2)

        init = {"x": jax.random.normal(jax.random.key(0), (8, 2))}
        res_local = hmc(logp, init, jax.random.key(1), num_warmup=50,
                        num_samples=50, num_leapfrog=4)
        init_sharded = shard_chains(init, mesh)
        res_sharded = hmc(logp, init_sharded, jax.random.key(1),
                          num_warmup=50, num_samples=50, num_leapfrog=4)
        np.testing.assert_allclose(
            np.asarray(res_local.samples["x"]),
            np.asarray(res_sharded.samples["x"]),
            atol=1e-10,
        )


class TestFailureRecovery:
    """Failure detection + elastic-recovery recipe (utils/health.py).

    The reference's failure handling is pdb.set_trace() in library code
    and a fork parallelism that hangs on dead children (SURVEY §5);
    these tests inject the actual failure modes and assert structured
    detection + a working checkpoint/resume continuation."""

    def test_healthy_sweep_reports_ok(self):
        import jax.numpy as jnp

        from pymra_tpu import kernels
        from pymra_tpu.tree.model import MRAModel
        from pymra_tpu.utils import gen_locations_2d
        from pymra_tpu.utils.health import check_result

        locs = gen_locations_2d(8)
        rng = np.random.default_rng(0)
        y = rng.standard_normal(len(locs))
        model = MRAModel(locs, r=4, M=1, J=4)
        res = model.sweep(kernels.Kernel("exponential", l=0.3), y, 1e-3)
        rep = check_result(res)
        assert rep.ok, str(rep)

    def test_injected_nan_theta_detected(self):
        """Fault injection: a NaN hyper-parameter poisons the whole sweep;
        check_result must localize it instead of letting NaNs flow on."""
        import jax.numpy as jnp

        from pymra_tpu import kernels
        from pymra_tpu.tree.model import MRAModel
        from pymra_tpu.utils import gen_locations_2d
        from pymra_tpu.utils.health import SweepHealthError, check_result

        locs = gen_locations_2d(8)
        rng = np.random.default_rng(0)
        y = rng.standard_normal(len(locs))
        model = MRAModel(locs, r=4, M=1, J=4)
        res = model.sweep(
            kernels.Kernel("exponential", l=jnp.float64(np.nan)), y, 1e-3
        )
        rep = check_result(res)
        assert not rep.ok and "objective" in rep.nonfinite
        import pytest
        with pytest.raises(SweepHealthError):
            check_result(res, raise_on_failure=True)

    def test_duplicate_points_recovered_by_escalation(self):
        """Near-duplicate locations make conditional blocks numerically
        indefinite — the jitter-escalation path must keep the sweep
        finite (the reference's eigh-abs repair analog)."""
        from pymra_tpu import kernels
        from pymra_tpu.tree.model import MRAModel
        from pymra_tpu.utils import gen_locations_2d
        from pymra_tpu.utils.health import check_result

        locs = np.asarray(gen_locations_2d(8), dtype=np.float64)
        locs[1] = locs[0] + 1e-13  # exact-duplicate pair
        locs[17] = locs[16] + 1e-13
        rng = np.random.default_rng(1)
        y = rng.standard_normal(len(locs))
        model = MRAModel(locs, r=4, M=1, J=4, jitter=1e-8)
        res = model.sweep(kernels.Kernel("gaussian", l=0.4), y, 1e-3)
        rep = check_result(res, var_tol=1e-5)
        assert rep.ok, str(rep)

    def test_sampler_checkpoint_resume(self, tmp_path):
        """Elastic-recovery recipe: checkpoint retained draws mid-run,
        'lose the host', reload and continue from resume_state — the
        continuation must be a working chain (finite, moving)."""
        import jax
        import jax.numpy as jnp

        from pymra_tpu.infer import hmc
        from pymra_tpu.utils.checkpoint import load_pytree, save_pytree
        from pymra_tpu.utils.health import check_samples, resume_state

        def logp(th):
            return -0.5 * jnp.sum(th["x"] ** 2)

        init = {"x": jnp.zeros((2, 3))}
        res1 = hmc(logp, init, jax.random.key(0), num_warmup=50,
                   num_samples=30)
        assert check_samples(res1.samples).ok
        path = str(tmp_path / "draws.npz")
        save_pytree(path, res1.samples)

        # "failure"; reload and continue
        restored = load_pytree(path, like=res1.samples)
        init2 = resume_state(restored)
        assert jax.tree.leaves(init2)[0].shape == (2, 3)
        res2 = hmc(logp, init2, jax.random.key(1), num_warmup=20,
                   num_samples=30)
        rep = check_samples(res2.samples)
        assert rep.ok, str(rep)
        # the continuation actually moved from the restart point
        d0 = np.asarray(res2.samples["x"])[:, -1] - np.asarray(
            init2["x"])
        assert np.any(np.abs(d0) > 1e-6)

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

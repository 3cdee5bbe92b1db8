"""Measure the sharded-execution overhead on ONE chip (VERDICT r3 weak #4).

Runs the same likelihood+posterior evaluation three ways on a single TPU
device and reports chained per-eval times:

  * ``serial``   — ``mra_sweep`` on the unpadded plan (the headline path);
  * ``sharded1`` — ``sharded_sweep`` on a 1-device mesh: identical math,
    but through ``pad_plan_for_sharding`` + ``shard_map`` + per-level psum
    (degenerate collectives), i.e. exactly the per-device program a
    multi-chip run executes. The serial/sharded1 gap bounds the cost of
    the sharded code path itself, separate from communication.

Round 3's sharded path additionally paid materialized parent-stash gathers
(``iota_groups=False``) and scatter-add posterior reassembly; round 4
carries shard-contiguous dynamic-slice reads and the fill-gather + psum
reassembly through ``pad_plan_for_sharding`` (``DevicePlan.shard_groups``),
so the gap should now be small. Run:

    python benchmarks/bench_sharded_overhead.py [side]

(side=100 -> N=10^4 by default; side=1000 -> the N=10^6 flagship shape).
"""
from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(side: int = 100):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from pymra_tpu.kernels import Kernel
    from pymra_tpu.parallel.sharded import (
        pad_plan_for_sharding,
        sharded_sweep,
    )
    from pymra_tpu.tree.model import MRAModel
    from pymra_tpu.tree.plan import PlanConfig, tpu_shaped_M
    from pymra_tpu.tree.sweep import mra_sweep, prepare_obs
    from pymra_tpu.utils.cache import enable_persistent_cache
    from pymra_tpu.utils.locations import gen_locations_2d
    from pymra_tpu.utils.profiling import chained_throughput

    enable_persistent_cache()
    locs = gen_locations_2d(side)
    rng = np.random.default_rng(0)
    y = rng.standard_normal(len(locs)).astype(np.float32)
    y[rng.random(len(locs)) > 0.9] = np.nan
    r = 8 if side >= 500 else 4
    M = tpu_shaped_M(len(locs), r) if side >= 500 else -1
    me = 1e-2 if side >= 500 else 1e-4
    model = MRAModel(locs, r=r, M=M, dtype=jnp.float32,
                     config=PlanConfig(r=r, kmeans_impl="native"))
    dplan = model.dplan
    jitter = model.jitter
    yj = jnp.asarray(y)
    lo, hi = (0.04, 0.06) if side >= 500 else (1.5, 2.5)
    thetas = jnp.asarray(np.linspace(lo, hi, 9), dtype=model.dtype)

    # --- serial -----------------------------------------------------------
    prep = prepare_obs(dplan, yj, me)

    def eval_serial(l, dplan, yj, prep):
        res = mra_sweep(dplan, Kernel("exponential", l=l), yj, me,
                        compute_posterior=True, jitter=jitter, prep=prep)
        return res.objective, res.mean, res.var

    s = chained_throughput(eval_serial, thetas, dplan, yj, prep, n_evals=8)
    print(f"serial:   {1000 * s['per_eval_s']:.3f} ms/eval "
          f"(compile {s['compile_s']:.1f}s)")

    # --- sharded on a 1-device mesh --------------------------------------
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("data",))
    dplan_p = pad_plan_for_sharding(dplan, 1)
    prep_p = prepare_obs(dplan_p, yj, me)

    def eval_sharded(l, dplan_p, yj, prep_p):
        res = sharded_sweep(dplan_p, Kernel("exponential", l=l), yj, me,
                            mesh, compute_posterior=True, jitter=jitter,
                            prep=prep_p)
        return res.objective, res.mean, res.var

    sh = chained_throughput(eval_sharded, thetas, dplan_p, yj, prep_p,
                            n_evals=8)
    print(f"sharded1: {1000 * sh['per_eval_s']:.3f} ms/eval "
          f"(compile {sh['compile_s']:.1f}s)")
    ratio = sh["per_eval_s"] / s["per_eval_s"]
    print(f"overhead: {100 * (ratio - 1):.1f}% "
          f"({1000 * (sh['per_eval_s'] - s['per_eval_s']):.3f} ms)")

    # numerical equivalence smoke check (rigorous f64 serial==sharded
    # equivalence lives in tests/test_sharded.py; f32 at N=10^6 carries
    # reduction-order noise of ~1e-4 between the psum+fill-gather and
    # direct-gather reassembly paths)
    r1 = eval_serial(thetas[0], dplan, yj, prep)
    r2 = eval_sharded(thetas[0], dplan_p, yj, prep_p)
    # f32 mean tolerances: the sharded program's mean path sums the same
    # contributions under different groupings (order-of-reassociation
    # noise up to ~3e-3 on O(1) values at N=10^6; the variance path is
    # bit-identical and f64 serial==sharded is exact in tests)
    np.testing.assert_allclose(float(r1[0]), float(r2[0]), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(r1[1]), np.asarray(r2[1]),
                               atol=1e-2)
    print("serial == sharded1 (objective rtol 1e-4, mean atol 1e-2)")
    return {"serial_ms": 1000 * s["per_eval_s"],
            "sharded1_ms": 1000 * sh["per_eval_s"],
            "overhead_pct": 100 * (ratio - 1)}


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100)

"""Stretch benchmark: 1M-location 2-D field (BASELINE.json config #5).

Plans a 1000x1000 grid with the native planner, runs the f32 sweep on the
TPU, and reports likelihood(+posterior) evaluations per second. The
reference extrapolates to ~1/11500 evals/s at this size (O(N) scaling of
its measured 115 s at N=10^4).
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, str(__import__('pathlib').Path(__file__).resolve().parent.parent))


def main(r=8, M=-1):
    import jax
    import jax.numpy as jnp

    from pymra_tpu.kernels import Kernel
    from pymra_tpu.tree.model import MRAModel
    from pymra_tpu.tree.plan import PlanConfig
    from pymra_tpu.tree.sweep import mra_sweep
    from pymra_tpu.utils.locations import gen_locations_2d

    locs = gen_locations_2d(1000)
    rng = np.random.default_rng(0)
    y = rng.standard_normal(len(locs)).astype(np.float32)
    y[rng.random(len(locs)) > 0.9] = np.nan

    t0 = time.time()
    model = MRAModel(locs, r=r, M=M, dtype=jnp.float32,
                     config=PlanConfig(r=r, M=M, kmeans_impl="native"))
    t_plan = time.time() - t0
    print(f"# plan: {t_plan:.1f}s  {model.describe()!s}", file=sys.stderr)

    dplan = model.dplan
    yj = jnp.asarray(y)
    jitter = model.jitter

    # dplan/yj as jit arguments (not closure constants): constants would be
    # fetched device->host array-by-array during lowering, which stalls
    # through this environment's remote-TPU tunnel.
    @jax.jit
    def evaluate(l, dplan, yj):
        res = mra_sweep(dplan, Kernel("exponential", l=l), yj, 1e-2,
                        compute_posterior=True, jitter=jitter)
        return res.objective, res.mean

    t0 = time.time()
    obj, mean = evaluate(jnp.float32(0.05), dplan, yj)
    obj.block_until_ready()
    t_compile = time.time() - t0
    print(f"# compile+first: {t_compile:.1f}s", file=sys.stderr)

    n_evals = 10
    t0 = time.time()
    for l in np.linspace(0.04, 0.06, n_evals):
        obj, mean = evaluate(jnp.float32(l), dplan, yj)
    obj.block_until_ready()
    mean.block_until_ready()
    dt = time.time() - t0
    eps = n_evals / dt
    print(json.dumps({
        "metric": "mra_likelihood_predict_evals_per_sec_n1M",
        "value": round(eps, 3),
        "unit": "evals/s",
        "vs_baseline": round(eps * 11500.0, 1),
    }))
    print(f"# {n_evals} evals in {dt:.2f}s; objective {float(obj):.1f}; "
          f"mean[0] {float(mean[0]):.3f}", file=sys.stderr)


if __name__ == "__main__":
    main()

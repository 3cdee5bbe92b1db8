"""Stretch benchmark: 1M-location 2-D field (BASELINE.json config #5).

Plans a 1000x1000 grid with the native planner, runs the f32 sweep on the
TPU, and reports likelihood(+posterior) evaluations per second. The
reference extrapolates to ~1/11500 evals/s at this size (O(N) scaling of
its measured 115 s at N=10^4).

Timing is chained (``utils.profiling.chained_throughput``): K dependent
sweeps inside one jit, one fetch — honest device throughput on a platform
where ``block_until_ready`` may not wait (round-1 VERDICT finding; the
previous version of this script printed a physically impossible number).
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, str(__import__('pathlib').Path(__file__).resolve().parent.parent))


def main(r=8, M=-1, n_evals=8, posterior=True):
    import jax
    import jax.numpy as jnp

    from pymra_tpu.kernels import Kernel
    from pymra_tpu.tree.model import MRAModel
    from pymra_tpu.tree.plan import PlanConfig
    from pymra_tpu.tree.sweep import mra_sweep
    from pymra_tpu.utils.locations import gen_locations_2d
    from pymra_tpu.utils.profiling import chained_throughput

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

    def evaluate(l, dplan, yj):
        res = mra_sweep(dplan, Kernel("exponential", l=l), yj, 1e-2,
                        compute_posterior=posterior, jitter=jitter)
        return res.objective, res.mean, res.var

    thetas = jnp.asarray(np.linspace(0.04, 0.06, n_evals + 1),
                         dtype=model.dtype)
    stats = chained_throughput(evaluate, thetas, dplan, yj, n_evals=n_evals)
    eps = stats["evals_per_sec"]
    print(json.dumps({
        "metric": "mra_likelihood_predict_evals_per_sec_n1M",
        "value": round(eps, 3),
        "unit": "evals/s",
        "vs_baseline": round(eps * 11500.0, 1),
    }))
    print(
        f"# compile {stats['compile_s']:.1f}s; chained {n_evals} evals in "
        f"{stats['chain_s']:.2f}s = {1000 * stats['per_eval_s']:.1f} ms/eval; "
        f"naive dispatch rate {stats['dispatch_evals_per_sec']:.1f}/s "
        f"(NOT the headline)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()

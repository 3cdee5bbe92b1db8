"""Headline benchmark: MRA likelihood evaluations per second on TPU.

Config matches the reference's heaviest measured workload (BASELINE.md): the
bundled ``large`` dataset — a 100x100 grid (N=10,000), r0=4, derived tree
M=5, J=4, exponential covariance. The reference CPU baseline is one full
build+likelihood+predict in 115 s serial (74.2 s fork-parallel on 2 cores),
i.e. ~0.0087 evals/s.

Here the tree is planned once (host) and each evaluation re-runs the full
numeric sweep — likelihood AND posterior mean/sd — with *different* kernel
hyper-parameters each time (as an MLE/HMC loop would), so XLA cannot cache
anything across evaluations beyond the compiled program.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_EVALS_PER_SEC = 1.0 / 115.0  # reference serial, BASELINE.md


def main():
    import jax
    import jax.numpy as jnp

    from pymra_tpu.data.loader import load_data
    from pymra_tpu.kernels import Kernel
    from pymra_tpu.tree.model import MRAModel
    from pymra_tpu.tree.plan import PlanConfig
    from pymra_tpu.tree.sweep import mra_sweep

    locs, y_obs = load_data("large")
    t0 = time.time()
    model = MRAModel(locs, r=4, dtype=jnp.float32,
                     config=PlanConfig(r=4, kmeans_impl="native"))
    plan_s = time.time() - t0

    y = jnp.asarray(y_obs, dtype=model.dtype)
    dplan = model.dplan
    jitter = model.jitter

    # NOTE: dplan/y are jit *arguments*, not closure constants — embedding
    # device arrays as constants forces a device->host fetch of every plan
    # array during MLIR lowering, which stalls for minutes through the
    # remote-TPU tunnel of this environment (and bloats the module anywhere).
    @jax.jit
    def evaluate(l_scale, dplan, y):
        kern = Kernel("exponential", l=l_scale)
        res = mra_sweep(dplan, kern, y, 1e-4, compute_posterior=True,
                        jitter=jitter)
        return res.objective, res.mean, res.var

    # compile + warmup
    t0 = time.time()
    obj, mean, var = evaluate(jnp.asarray(2.0, dtype=model.dtype), dplan, y)
    obj.block_until_ready()
    compile_s = time.time() - t0

    ls = np.linspace(1.5, 2.5, 20)
    t0 = time.time()
    for l in ls:
        obj, mean, var = evaluate(jnp.asarray(l, dtype=model.dtype), dplan, y)
    obj.block_until_ready()
    mean.block_until_ready()
    elapsed = time.time() - t0
    evals_per_sec = len(ls) / elapsed

    result = {
        "metric": "mra_likelihood_predict_evals_per_sec_n10k",
        "value": round(evals_per_sec, 3),
        "unit": "evals/s",
        "vs_baseline": round(evals_per_sec / BASELINE_EVALS_PER_SEC, 1),
    }
    print(json.dumps(result))
    # auxiliary detail on stderr-ish (still stdout but after the JSON line)
    import sys

    print(
        f"# plan {plan_s:.1f}s, compile {compile_s:.1f}s, "
        f"{len(ls)} evals in {elapsed:.2f}s on {jax.devices()[0].platform}, "
        f"objective@l=2.5: {float(obj):.2f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()

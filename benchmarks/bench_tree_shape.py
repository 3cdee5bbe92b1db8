"""Tree-shape sweep for the N=1M flagship config: speed AND accuracy by M.

The planner's reference-derived default (M=8 at r=8) yields 65,536 leaves of
P=28 at 54% slot fill — every per-leaf tensor pads its 28-wide lane
dimension to 128 (4.6x HBM tax) and half the padded slots are dead. One
level up (M=7) the same domain becomes 16,384 leaves of P=64 at 95% fill —
lane-half alignment and near-zero dead work — while making the
approximation *richer*, not poorer: each leaf covariance block is exact, so
growing leaves 28->64 strictly increases the resolved local structure at
the same r (the coarse levels it replaces contribute the least — Katzfuss
2017 resolution decay).

Speed: chained-timing of the full sweep per M. Accuracy: predictive
log-score and RMSE on a held-out subset (no exact oracle exists at N=1M;
held-out scoring is the standard model-selection metric, SURVEY #14).

Usage: python benchmarks/bench_tree_shape.py   (env: PYMRA_SHAPE_MS=8,7,6)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, str(__import__('pathlib').Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache_tpu"))

import jax
import jax.numpy as jnp
import numpy as np

from pymra_tpu.kernels import Kernel
from pymra_tpu.tree.model import MRAModel
from pymra_tpu.tree.plan import PlanConfig
from pymra_tpu.tree.sweep import mra_sweep, prepare_obs
from pymra_tpu.utils.locations import gen_locations_2d
from pymra_tpu.utils.profiling import chained_throughput

from pymra_tpu.utils.config import flag as _flag

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main():
    side = int(_flag("PYMRA_SHAPE_SIDE"))
    r = int(_flag("PYMRA_SHAPE_R"))
    Ms = [int(x) for x in _flag("PYMRA_SHAPE_MS").split(",")]
    locs = gen_locations_2d(side)
    rng = np.random.default_rng(0)
    # an actual exponential GRF (circulant embedding, exact at any N) plus
    # measurement noise — iid data would make the accuracy columns
    # meaningless; hold out 5% of the observed entries for scoring
    from pymra_tpu.utils.simulate import simulate_grf_grid

    f_true = np.asarray(simulate_grf_grid(
        1, side, covfn=lambda d: np.exp(-d / 0.05), dtype="float64"))
    y_full = (f_true + 0.1 * rng.standard_normal(len(locs))).astype(
        np.float32)
    missing = rng.random(len(locs)) > 0.9
    hold = (~missing) & (rng.random(len(locs)) < 0.05)
    y = y_full.copy()
    y[missing | hold] = np.nan
    hold_idx = np.flatnonzero(hold)

    rows = []
    for M in Ms:
        t0 = time.time()
        model = MRAModel(locs, r=r, M=M, dtype=jnp.float32,
                         config=PlanConfig(r=r, kmeans_impl="native"))
        plan_s = time.time() - t0
        lvl = [g for g in model.dplan.levels if g.leaf_locs.shape[0]][0]
        yj = jnp.asarray(y)
        prep = prepare_obs(model.dplan, yj, 1e-2)
        jitter = model.jitter

        def evaluate(l, dplan, yj, prep):
            res = mra_sweep(dplan, Kernel("exponential", l=l), yj, 1e-2,
                            compute_posterior=True, jitter=jitter, prep=prep)
            return res.objective, res.mean, res.var

        thetas = jnp.asarray(np.linspace(0.04, 0.06, 9), dtype=jnp.float32)
        stats = chained_throughput(evaluate, thetas, model.dplan, yj, prep,
                                   n_evals=8)
        # accuracy on held-out points at the data-generating theta
        res = jax.jit(evaluate)(jnp.float32(0.05), model.dplan, yj, prep)
        mean = np.asarray(res[1])[hold_idx]
        var = np.maximum(np.asarray(res[2])[hold_idx], 1e-12) + 1e-2
        truth = y_full[hold_idx]
        rmse = float(np.sqrt(np.mean((mean - truth) ** 2)))
        logscore = float(np.mean(
            -0.5 * (np.log(2 * np.pi * var) + (truth - mean) ** 2 / var)
        ))
        row = {
            "M": M, "n_leaf": int(lvl.leaf_locs.shape[0]),
            "P": int(lvl.leaf_locs.shape[1]),
            "per_eval_ms": round(1000 * stats["per_eval_s"], 2),
            "compile_s": round(stats["compile_s"], 1),
            "plan_s": round(plan_s, 1),
            "holdout_rmse": round(rmse, 5),
            "holdout_logscore": round(logscore, 5),
        }
        rows.append(row)
        print(row, flush=True)
    print(json.dumps({"side": side, "r": r, "rows": rows}))


if __name__ == "__main__":
    main()

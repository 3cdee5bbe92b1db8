"""Headline benchmark: MRA likelihood evaluations per second on TPU.

Config matches the reference's heaviest measured workload (BASELINE.md): the
bundled ``large`` dataset — a 100x100 grid (N=10,000), r0=4, derived tree
M=5, J=4, exponential covariance. The reference CPU baseline is one full
build+likelihood+predict in 115 s serial (74.2 s fork-parallel on 2 cores),
i.e. ~0.0087 evals/s.

The tree is planned once (host) and each evaluation re-runs the full numeric
sweep — likelihood AND posterior mean/sd — with *different* kernel
hyper-parameters each time (as an MLE/HMC loop would).

Timing is *chained*: K sweeps run sequentially inside one jitted
``lax.fori_loop`` with a data dependency between iterations, and one scalar
is fetched at the end (``utils.profiling.chained_throughput``). On this
environment's remote-TPU platform ``block_until_ready`` can return before
execution completes, so a naive loop measures dispatch rate — round 1
published a 7x inflated number that way (VERDICT r1). The dispatch rate is
still reported, clearly labeled, in the trailing comment.

Compilation: the persistent XLA compilation cache is enabled
(``pymra_tpu.utils.cache``; opt out with PYMRA_NO_CACHE=1), so ``compile_s``
reflects a warm cache after the first-ever run on a machine. Round 2's
533.8 s cold compile at N=10^4 was root-caused to the posterior scatter-add
inside the chained fori_loop (a pathological TPU-compile interaction);
round 3 replaced the scatter with a static gather (tree/sweep.py
``post_inv``), which brought the cold compile back to tens of seconds —
see the regression note in BENCHNOTES.md.

Also runs the N=1M flagship config (1000x1000 grid, r=8), a NUTS
samples/sec measurement, and static MFU / HBM-bandwidth-utilization and
multi-chip scaling-projection accounting (utils/accounting.py,
benchmarks/scaling_model.py) — all recorded in the ``extra`` field.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_EVALS_PER_SEC = 1.0 / 115.0  # reference serial at N=10^4, BASELINE.md
# reference O(N) extrapolation to N=10^6: 115 s * 100 per eval
BASELINE_1M_EVALS_PER_SEC = 1.0 / 11500.0

# single-chip peaks used for utilization numbers (TPU v5e / "v5 lite"):
PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BPS = 819e9


def _util_extras(prefix, dplan, per_eval_s, extra):
    from pymra_tpu.utils.accounting import sweep_cost

    cost = sweep_cost(dplan, compute_posterior=True)
    extra[f"{prefix}_mfu"] = round(
        cost.flops / per_eval_s / PEAK_BF16_FLOPS, 5)
    extra[f"{prefix}_hbm_bw_util"] = round(
        cost.hbm_bytes / per_eval_s / PEAK_HBM_BPS, 4)
    extra[f"{prefix}_flops_per_eval"] = float(f"{cost.flops:.4g}")
    extra[f"{prefix}_hbm_gb_per_eval"] = round(cost.hbm_bytes / 1e9, 3)
    return cost


def _bench_n10k():
    import jax
    import jax.numpy as jnp

    from pymra_tpu.data.loader import load_data
    from pymra_tpu.kernels import Kernel
    from pymra_tpu.tree.model import MRAModel
    from pymra_tpu.tree.plan import PlanConfig
    from pymra_tpu.tree.sweep import mra_sweep, prepare_obs
    from pymra_tpu.utils.profiling import chained_throughput

    locs, y_obs = load_data("large")
    t0 = time.time()
    model = MRAModel(locs, r=4, dtype=jnp.float32,
                     config=PlanConfig(r=4, kmeans_impl="native"))
    plan_s = time.time() - t0

    y = jnp.asarray(y_obs, dtype=model.dtype)
    dplan = model.dplan
    jitter = model.jitter
    # observation tensors are theta-independent: prepared once, outside the
    # timed loop, exactly as an MLE/HMC driver would (sweep.prepare_obs)
    prep = prepare_obs(dplan, y, 1e-4)

    def evaluate(l_scale, dplan, y, prep):
        kern = Kernel("exponential", l=l_scale)
        res = mra_sweep(dplan, kern, y, 1e-4, compute_posterior=True,
                        jitter=jitter, prep=prep)
        return res.objective, res.mean, res.var

    thetas = jnp.asarray(np.linspace(1.5, 2.5, 33), dtype=model.dtype)
    stats = chained_throughput(evaluate, thetas, dplan, y, prep, n_evals=32)
    stats["plan_s"] = plan_s
    stats["dplan"] = dplan
    return stats


def _bench_n1m(r=8, M=None):
    """N=10^6 flagship. The tree is TPU-shaped by default
    (``plan.tpu_shaped_M``: leaves ~64 points, 95% slot fill, minor dims
    half a lane register) rather than the reference-derived depth (leaves
    ~28 points at 54% fill, 4.6x lane-padding tax) — measured 1.55x faster
    at statistically equal-or-better held-out accuracy
    (benchmarks/bench_tree_shape.py, BENCHNOTES.md). Pass ``M`` to pin a
    depth; the reference-derived shape is also timed each run and recorded
    as ``n1M_refshape_per_eval_ms``."""
    import jax
    import jax.numpy as jnp

    from pymra_tpu.kernels import Kernel
    from pymra_tpu.tree.model import MRAModel
    from pymra_tpu.tree.plan import PlanConfig, tpu_shaped_M
    from pymra_tpu.tree.sweep import mra_sweep, prepare_obs
    from pymra_tpu.utils.locations import gen_locations_2d
    from pymra_tpu.utils.profiling import chained_throughput

    locs = gen_locations_2d(1000)
    rng = np.random.default_rng(0)
    y = rng.standard_normal(len(locs)).astype(np.float32)
    y[rng.random(len(locs)) > 0.9] = np.nan
    if M is None:
        M = tpu_shaped_M(len(locs), r)

    t0 = time.time()
    model = MRAModel(locs, r=r, M=M, dtype=jnp.float32,
                     config=PlanConfig(r=r, kmeans_impl="native"))
    plan_s = time.time() - t0

    dplan = model.dplan
    yj = jnp.asarray(y)
    jitter = model.jitter
    prep = prepare_obs(dplan, yj, 1e-2)

    def evaluate(l, dplan, yj, prep):
        res = mra_sweep(dplan, Kernel("exponential", l=l), yj, 1e-2,
                        compute_posterior=True, jitter=jitter, prep=prep)
        return res.objective, res.mean, res.var

    thetas = jnp.asarray(np.linspace(0.04, 0.06, 9), dtype=model.dtype)
    stats = chained_throughput(evaluate, thetas, dplan, yj, prep, n_evals=8)
    stats["plan_s"] = plan_s
    stats["dplan"] = dplan
    return stats


def _bench_nuts(chains=8, warmup=25, samples=25):
    """NUTS samples/s on the bundled N=10^4 dataset (chained-discipline:
    the whole warmup+sampling run is ONE jitted program; wall clock of the
    second call covers every transition)."""
    import jax
    import jax.numpy as jnp

    from pymra_tpu.data.loader import load_data
    from pymra_tpu.infer import nuts
    from pymra_tpu.kernels import Kernel
    from pymra_tpu.tree.model import MRAModel
    from pymra_tpu.tree.plan import PlanConfig

    locs, y_obs = load_data("large")
    model = MRAModel(locs, r=4, dtype=jnp.float32,
                     config=PlanConfig(r=4, kmeans_impl="native"))
    f = model.loglik_fn(
        y_obs, 1e-4,
        kernel_builder=lambda th: Kernel("exponential",
                                         l=jnp.exp(th["log_l"])),
    )

    def logp(th):
        return f(th) - 0.5 * (th["log_l"] - jnp.log(2.0)) ** 2

    init = {"log_l": jnp.linspace(0.2, 1.2, chains, dtype=model.dtype)}
    run = jax.jit(lambda i, k: nuts(
        logp, i, k, num_warmup=warmup, num_samples=samples, max_depth=6,
        init_step_size=0.2,
    ))
    t0 = time.time()
    res = run(init, jax.random.key(0))
    jax.block_until_ready(res.samples)
    compile_s = time.time() - t0
    t0 = time.time()
    res = run(init, jax.random.key(1))
    jax.block_until_ready(res.samples)
    dt = time.time() - t0
    # warmup transitions cost the same as sampling transitions; report
    # retained samples over their share of the wall clock
    sps = chains * samples / (dt * samples / (warmup + samples))
    return {
        "samples_per_sec": sps,
        "compile_s": compile_s,
        "run_s": dt,
        "accept": float(res.accept_rate.mean()),
        "divergent": int(res.num_divergent.sum()),
    }


def main():
    import jax

    from pymra_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    s10k = _bench_n10k()
    eps = s10k["evals_per_sec"]

    extra = {
        "n10k_dispatch_evals_per_sec": round(s10k["dispatch_evals_per_sec"], 1),
        "n10k_per_eval_ms": round(1000 * s10k["per_eval_s"], 3),
        "n10k_compile_s": round(s10k["compile_s"], 1),
    }
    _util_extras("n10k", s10k["dplan"], s10k["per_eval_s"], extra)

    if os.environ.get("PYMRA_BENCH_SKIP_NUTS", "0") != "1":
        try:
            sn = _bench_nuts()
            extra["nuts_samples_per_sec"] = round(sn["samples_per_sec"], 2)
            extra["nuts_accept"] = round(sn["accept"], 3)
        except Exception as e:
            extra["nuts_error"] = repr(e)[:200]
            sn = None
    else:
        sn = None

    if os.environ.get("PYMRA_BENCH_SKIP_1M", "0") != "1":
        try:
            s1m = _bench_n1m()
            extra["n1M_evals_per_sec"] = round(s1m["evals_per_sec"], 3)
            extra["n1M_per_eval_ms"] = round(1000 * s1m["per_eval_s"], 1)
            extra["n1M_vs_baseline"] = round(
                s1m["evals_per_sec"] / BASELINE_1M_EVALS_PER_SEC, 1
            )
            extra["n1M_compile_s"] = round(s1m["compile_s"], 1)
            _util_extras("n1M", s1m["dplan"], s1m["per_eval_s"], extra)
            # static multi-chip scaling projection for the flagship config
            sys.path.insert(0, os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "benchmarks"))
            from scaling_model import project

            proj = project(s1m["dplan"], 1000 * s1m["per_eval_s"])
            extra["n1M_scaling_eff_8chip"] = proj["projection"][3][
                "scaling_efficiency"]
            extra["n1M_scaling_eff_32chip"] = proj["projection"][5][
                "scaling_efficiency"]
            extra["n1M_psum_total_mbytes"] = proj["psum_total_mbytes"]
            extra["n1M_M"] = s1m["dplan"].M
            # reference-derived tree shape (leaves ~r points), for
            # comparability with rounds 1-2 and the reference semantics
            if os.environ.get("PYMRA_BENCH_SKIP_REFSHAPE", "0") != "1":
                s1m_ref = _bench_n1m(M=-1)
                extra["n1M_refshape_per_eval_ms"] = round(
                    1000 * s1m_ref["per_eval_s"], 1)
                extra["n1M_refshape_M"] = s1m_ref["dplan"].M
        except Exception as e:  # never lose the headline to the stretch run
            extra["n1M_error"] = repr(e)[:200]
            s1m = None
    else:
        s1m = None

    print(json.dumps({
        "metric": "mra_likelihood_predict_evals_per_sec_n10k",
        "value": round(eps, 3),
        "unit": "evals/s",
        "vs_baseline": round(eps / BASELINE_EVALS_PER_SEC, 1),
        "extra": extra,
    }))
    print(
        f"# n10k: plan {s10k['plan_s']:.1f}s, compile {s10k['compile_s']:.1f}s,"
        f" chained {s10k['n_evals']} evals in {s10k['chain_s']:.2f}s"
        f" ({1000 * s10k['per_eval_s']:.2f} ms/eval device-sequential;"
        f" naive dispatch-rate would claim"
        f" {s10k['dispatch_evals_per_sec']:.0f}/s)"
        f" on {jax.devices()[0].platform}",
        file=sys.stderr,
    )
    if sn is not None:
        print(
            f"# nuts: compile {sn['compile_s']:.1f}s, run {sn['run_s']:.1f}s,"
            f" {sn['samples_per_sec']:.1f} samples/s, accept {sn['accept']:.2f},"
            f" divergent {sn['divergent']}",
            file=sys.stderr,
        )
    if s1m is not None:
        print(
            f"# n1M: plan {s1m['plan_s']:.1f}s, compile {s1m['compile_s']:.1f}s,"
            f" chained {s1m['n_evals']} evals in {s1m['chain_s']:.2f}s"
            f" ({1000 * s1m['per_eval_s']:.1f} ms/eval)",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()

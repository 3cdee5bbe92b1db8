"""Multi-chip scaling projection from static plan analysis (no hardware).

The sweep's communication under leaf-axis sharding is exactly one ``psum``
of the per-parent message blocks per interior level (plus one for the
posterior mean/var outputs) — volumes that are static functions of the
plan (``pymra_tpu.utils.accounting.sweep_cost``). Combined with a measured
(or roofline-derived) single-chip time this yields a projected scaling
curve without multi-chip hardware: the virtual-mesh dryrun proves the
sharded program *correct*; this model projects its *efficiency* against
BASELINE.md's >=85%-at->=2-hosts north star.

Model:
  T(n) = t_leaf / n + t_interior + sum_l allreduce(bytes_l, n, bw)
  allreduce(b, n, bw) = 2 b (n-1) / (n bw)          (ring/bidirectional)

t_leaf / t_interior split the measured single-chip time by the plan's
leaf vs interior FLOP shares (the leaf share also carries the HBM-heavy
work, so attributing by FLOPs is the conservative choice for scaling: it
over-assigns time to the replicated interior part).

Bandwidth assumptions (documented, conservative, per chip / per host):
  ICI (v5e, within slice): 45 GB/s effective per link direction x 2
  DCN (between hosts):      25 GB/s effective per host

Usage: python benchmarks/scaling_model.py [--side 1000 --r 8 \
           --measured-ms 161]
Prints a JSON report and a human-readable table.
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, str(__import__('pathlib').Path(__file__).resolve().parent.parent))

ICI_GBPS = 90.0  # effective all-reduce bandwidth per chip over ICI
DCN_GBPS = 25.0  # effective per-host DCN bandwidth


def allreduce_s(bytes_, n, gbps):
    if n <= 1:
        return 0.0
    return 2.0 * bytes_ * (n - 1) / (n * gbps * 1e9)


def project(dplan, measured_ms: float, chips=(1, 2, 4, 8, 16, 32),
            chips_per_host: int = 4, compute_posterior: bool = True,
            sharded_overhead_ms: float = 0.0):
    """Projected per-eval time and scaling efficiency at each chip count.

    ``sharded_overhead_ms``: MEASURED fixed cost of the per-device sharded
    program relative to the serial sweep (``benchmarks/
    bench_sharded_overhead.py`` on a 1-device mesh — shard_map
    bookkeeping, the fill-gather reassembly, degenerate-collective
    dispatch). Charged whenever n > 1 — calibrating the projection
    against the code path that would actually run, not just the
    communication model.

    Each chip count is projected with ITS OWN critical depth
    (``parallel.sharded.int_shard_level``): the fine interior levels
    shard across the mesh, so both the replicated-compute fraction and
    the psum volume shrink with what that chip count's padded plan would
    actually run."""
    from pymra_tpu.parallel.sharded import int_shard_level
    from pymra_tpu.utils.accounting import sweep_cost

    rows = []
    per_n = {}
    for n in chips:
        crit = int_shard_level(dplan, n) if n > 1 else 10 ** 9
        cost = per_n.get(crit)
        if cost is None:
            cost = per_n[crit] = sweep_cost(
                dplan, compute_posterior=compute_posterior,
                int_shard_from=crit)
        shardable_frac = cost.leaf_flops / max(cost.flops, 1.0)
        t1 = measured_ms / 1e3
        t_shard = t1 * shardable_frac
        t_rep = t1 * (1.0 - shardable_frac)
        comm = 0.0
        for _, b in cost.psum_bytes_per_level:
            if n <= chips_per_host:
                comm += allreduce_s(b, n, ICI_GBPS)
            else:
                # hierarchical all-reduce: ICI within each host, DCN across
                n_hosts = n // chips_per_host
                comm += allreduce_s(b, chips_per_host, ICI_GBPS)
                comm += allreduce_s(b, n_hosts, DCN_GBPS)
        tn = t_shard / n + t_rep + comm + (
            sharded_overhead_ms / 1e3 if n > 1 else 0.0)
        eff = t1 / (n * tn)
        rows.append({
            "chips": n,
            "hosts": max(1, n // chips_per_host),
            "int_shard_from": crit if crit < 10 ** 9 else None,
            "per_eval_ms": round(1e3 * tn, 3),
            "evals_per_sec": round(1.0 / tn, 2),
            "comm_ms": round(1e3 * comm, 3),
            "psum_mbytes": round(sum(
                b for _, b in cost.psum_bytes_per_level) / 1e6, 3),
            "shardable_flop_fraction": round(shardable_frac, 4),
            "scaling_efficiency": round(eff, 4),
        })
    # headline psum volume: the multi-chip (critDepth) plan's
    cost_mc = per_n.get(min(k for k in per_n), None) or next(
        iter(per_n.values()))
    psum_total = float(sum(b for _, b in cost_mc.psum_bytes_per_level))
    return {
        "psum_bytes_per_level": [
            {"level": l, "mbytes": round(b / 1e6, 3)}
            for l, b in cost_mc.psum_bytes_per_level
        ],
        "psum_total_mbytes": round(psum_total / 1e6, 3),
        "assumptions": {
            "ici_gbps": ICI_GBPS, "dcn_gbps": DCN_GBPS,
            "chips_per_host": chips_per_host,
            "measured_single_chip_ms": measured_ms,
            "sharded_overhead_ms": sharded_overhead_ms,
            "model": ("T(n) = t_shardable/n + t_replicated +"
                      " sharded_overhead + ring-allreduce(psums),"
                      " critDepth per chip count"),
        },
        "projection": rows,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", type=int, default=1000)
    ap.add_argument("--r", type=int, default=8)
    ap.add_argument("--measured-ms", type=float, default=161.0,
                    help="measured single-chip per-eval ms (BENCH_r*.json)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from pymra_tpu.tree.model import MRAModel
    from pymra_tpu.tree.plan import PlanConfig
    from pymra_tpu.utils.locations import gen_locations_2d

    locs = gen_locations_2d(args.side)
    model = MRAModel(locs, r=args.r, dtype=jnp.float32,
                     config=PlanConfig(r=args.r, kmeans_impl="native"))
    rep = project(model.dplan, args.measured_ms)
    print(json.dumps(rep))
    print(f"# N={len(locs)} r={args.r} M={model.dplan.M}", file=sys.stderr)
    for row in rep["projection"]:
        print(f"#  {row['chips']:3d} chips ({row['hosts']} host(s)): "
              f"{row['per_eval_ms']:9.3f} ms/eval  "
              f"comm {row['comm_ms']:7.3f} ms  "
              f"crit {str(row['int_shard_from']):>4s}  "
              f"psum {row['psum_mbytes']:7.2f} MB  "
              f"eff {100 * row['scaling_efficiency']:5.1f}%", file=sys.stderr)


if __name__ == "__main__":
    main()

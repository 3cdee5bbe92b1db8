"""Device-time breakdown of one MRA sweep (VERDICT r1 weak #4 / next #3).

`block_until_ready` does not synchronize on this environment's remote-TPU
platform, so per-op profiling via trace timestamps is unreliable; instead
the sweep is measured by *cumulative ablation*: each stage S_i is a jitted
function running stages 1..i, timed with chained (data-dependent) repeats
via ``utils.profiling.chained_throughput``. Differences between consecutive
stages give honest per-stage device times.

Stages (matching tree/sweep._mra_sweep_impl):
  interior_prior   Pass A: conditional prior over interior levels
  leaf_cond        + leaf-level conditional pass (W_list, C_own)
  leaf_asm         + Bstack concat, A/omega formation (the big einsum)
  lik              full likelihood (adds leaf chol/solves + Pass C upward)
  full             + Pass D posterior mean/var at every location

Usage:  PYMRA_PROF_SIDE=1000 python benchmarks/profile_sweep.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, str(__import__('pathlib').Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache_tpu"))

import jax
import jax.numpy as jnp

from pymra_tpu.kernels import Kernel
from pymra_tpu.tree import sweep as sw
from pymra_tpu.tree.model import MRAModel
from pymra_tpu.tree.plan import PlanConfig
from pymra_tpu.utils.locations import gen_locations_2d
from pymra_tpu.utils.profiling import chained_throughput

from pymra_tpu.utils.config import flag as _flag

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def build(side: int, r: int):
    locs = gen_locations_2d(side)
    rng = np.random.default_rng(0)
    y = rng.standard_normal(len(locs)).astype(np.float32)
    y[rng.random(len(locs)) > 0.9] = np.nan
    t0 = time.time()
    M = int(_flag("PYMRA_PROF_M"))
    model = MRAModel(locs, r=r, M=M, dtype=jnp.float32,
                     config=PlanConfig(r=r, kmeans_impl="native"))
    print(f"# plan: N={len(locs)} M={model.dplan.M} r={r} "
          f"({time.time() - t0:.1f}s)")
    for m, lvl in enumerate(model.dplan.levels):
        print(f"#   level {m}: n_int={lvl.int_knots.shape[0]} "
              f"n_leaf={lvl.leaf_locs.shape[0]} P={lvl.leaf_locs.shape[1]}")
    return model, jnp.asarray(y)


def make_stages(dplan, jitter):
    from pymra_tpu.ops.pallas.linalg import triangular_inverse_lower

    def _prior(covfn, dplan):
        r = dplan.r
        dt = jnp.float32
        prior_L = [None] * (dplan.M + 1)
        chain_Q = [None] * (dplan.M + 1)
        chain_GG = [None] * (dplan.M + 1)
        for m, lvl in enumerate(dplan.levels):
            n_int = lvl.int_knots.shape[0]
            if n_int == 0:
                continue
            Q = lvl.int_knots
            if m == 0:
                C_own = covfn(Q, Q)
                Zt = None
            else:
                Zt, C_own, _, _ = sw._chain_cond(
                    covfn, Q, lvl.int_parent, chain_Q[m - 1],
                    chain_GG[m - 1], jitter)
            L = sw._chol(C_own, jitter)
            LinvT = jnp.swapaxes(triangular_inverse_lower(L), -1, -2)
            prior_L[m] = L
            eye_r = jnp.broadcast_to(jnp.eye(r, dtype=dt), (n_int, r, r))
            if m == 0:
                chain_Q[m] = Q
                chain_GG[m] = jnp.concatenate([LinvT, eye_r], axis=-1)
            else:
                S = m * r
                GGp = chain_GG[m - 1][lvl.int_parent]
                GpT, GLTp = GGp[..., :S], GGp[..., S:]
                neg = -jnp.matmul(GpT, jnp.swapaxes(Zt, -1, -2))
                zb = jnp.zeros((n_int, r, S), dt)
                chain_GG[m] = jnp.concatenate([
                    jnp.concatenate([GpT, jnp.matmul(neg, LinvT),
                                     GLTp, neg], axis=-1),
                    jnp.concatenate([zb, LinvT, zb, eye_r], axis=-1),
                ], axis=-2)
                chain_Q[m] = jnp.concatenate(
                    [chain_Q[m - 1][lvl.int_parent], Q], axis=-2)
        return prior_L, chain_Q, chain_GG

    def interior_prior(l, dplan, y):
        covfn = Kernel("exponential", l=l)
        with jax.default_matmul_precision("float32"):
            prior_L, _, _ = _prior(covfn, dplan)
            return sum(jnp.sum(x) for x in prior_L if x is not None)

    def _leafcond(covfn, dplan):
        outs = []
        prior_L, chain_Q, chain_GG = _prior(covfn, dplan)
        for m, lvl in enumerate(dplan.levels):
            n_leaf = lvl.leaf_locs.shape[0]
            if n_leaf == 0:
                continue
            X = lvl.leaf_locs
            grp = 0
            if m and dplan.groups is not None:
                c_leaf, _, gn_leaf, _ = dplan.groups[m]
                if c_leaf and n_leaf == gn_leaf:
                    grp = c_leaf
            if m == 0:
                C_own = covfn(X, X)
                W = None
            else:
                _, C_own, W, _ = sw._chain_cond(
                    covfn, X, lvl.leaf_parent, chain_Q[m - 1],
                    chain_GG[m - 1], jitter, want_W=True,
                    group=grp, iota=dplan.iota_groups)
            B_own = C_own * lvl.leaf_is_knot.astype(X.dtype)[:, None, :]
            outs.append((m, lvl, W, B_own, C_own))
        return prior_L, outs

    def leaf_cond(l, dplan, y):
        covfn = Kernel("exponential", l=l)
        with jax.default_matmul_precision("float32"):
            prior_L, outs = _leafcond(covfn, dplan)
            out = sum(jnp.sum(x) for x in prior_L if x is not None)
            for m, lvl, W, B_own, C_own in outs:
                out = out + jnp.sum(C_own) + jnp.sum(B_own)
                if W is not None:
                    out = out + jnp.sum(W)
            return out

    def leaf_asm(l, dplan, y):
        covfn = Kernel("exponential", l=l)
        dtype = jnp.float32
        y_ext = jnp.concatenate([jnp.asarray(y, dtype), jnp.zeros(1, dtype)])
        with jax.default_matmul_precision("float32"):
            prior_L, outs = _leafcond(covfn, dplan)
            out = sum(jnp.sum(x) for x in prior_L if x is not None)
            for m, lvl, W, B_own, C_own in outs:
                gidx = lvl.leaf_loc_gidx
                y_leaf = y_ext[gidx]
                obs = jnp.isfinite(y_leaf) & lvl.leaf_loc_mask
                y0 = jnp.where(obs, y_leaf, 0.0)
                w = jnp.where(obs, 1.0 / 1e-2, 0.0)
                wy = w * y0
                out = out + jnp.sum(jnp.einsum(
                    "npa,np,npb->nab", B_own, w, B_own, precision="highest"))
                out = out + jnp.sum(jnp.einsum(
                    "npa,np->na", B_own, wy, precision="highest"))
                if W is not None:
                    out = out + jnp.sum(jnp.einsum(
                        "npa,np,npb->nab", B_own, w, W, precision="highest"))
                    out = out + jnp.sum(jnp.einsum(
                        "npa,np,npb->nab", W, w, W, precision="highest"))
                    out = out + jnp.sum(jnp.einsum(
                        "npa,np->na", W, wy, precision="highest"))
            return out

    def lik(l, dplan, y):
        res = sw.mra_sweep(dplan, Kernel("exponential", l=l), y, 1e-2,
                           compute_posterior=False, jitter=jitter)
        return res.objective

    def full(l, dplan, y):
        res = sw.mra_sweep(dplan, Kernel("exponential", l=l), y, 1e-2,
                           compute_posterior=True, jitter=jitter)
        return res.objective, res.mean, res.var

    return [("interior_prior", interior_prior), ("leaf_cond", leaf_cond),
            ("leaf_asm", leaf_asm), ("lik", lik), ("full", full)]


def main():
    side = int(_flag("PYMRA_PROF_SIDE"))
    r = int(_flag("PYMRA_PROF_R"))
    n_evals = int(_flag("PYMRA_PROF_EVALS"))
    print(f"# devices: {jax.devices()}")
    model, y = build(side, r)
    thetas = jnp.asarray(np.linspace(0.04, 0.06, max(n_evals + 1, 9)),
                         dtype=jnp.float32)
    stages = make_stages(model.dplan, model.jitter)
    sel = _flag("PYMRA_PROF_STAGES")
    if sel:
        want = set(sel.split(","))
        stages = [(n, f) for n, f in stages if n in want]
    rows = []
    prev = 0.0
    for name, fn in stages:
        stats = chained_throughput(fn, thetas, model.dplan, y,
                                   n_evals=n_evals)
        ms = 1000 * stats["per_eval_s"]
        print(f"{name:16s} cum {ms:9.2f} ms/eval   delta {ms - prev:9.2f} ms"
              f"   (compile {stats['compile_s']:.0f}s)")
        rows.append({"stage": name, "cum_ms": round(ms, 3),
                     "delta_ms": round(ms - prev, 3)})
        prev = ms
    print(json.dumps({"side": side, "r": r, "breakdown": rows}))


if __name__ == "__main__":
    main()

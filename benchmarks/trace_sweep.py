"""Per-op device-time breakdown of one MRA sweep via an xprof trace.

Complements ``profile_sweep.py``'s cumulative ablation (which gives honest
stage totals but no per-op attribution): captures a JAX profiler trace of a
few chained sweep executions and aggregates XLA op durations from the
device plane with ``jax.profiler.ProfileData`` — no TensorBoard needed.

Usage:  PYMRA_PROF_SIDE=1000 python benchmarks/trace_sweep.py
"""
from __future__ import annotations

import collections
import glob
import os
import re
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
from pymra_tpu.tree import sweep as sw
from pymra_tpu.tree.model import MRAModel
from pymra_tpu.tree.plan import PlanConfig
from pymra_tpu.utils.locations import gen_locations_2d

from pymra_tpu.utils.config import flag as _flag

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main():
    side = int(_flag("PYMRA_PROF_SIDE"))
    r = int(_flag("PYMRA_PROF_R"))
    reps = int(_flag("PYMRA_PROF_REPS"))
    posterior = _flag("PYMRA_PROF_POSTERIOR") == "1"
    locs = gen_locations_2d(side)
    rng = np.random.default_rng(0)
    y = rng.standard_normal(len(locs)).astype(np.float32)
    y[rng.random(len(locs)) > 0.9] = np.nan
    M = int(_flag("PYMRA_PROF_M"))
    model = MRAModel(locs, r=r, M=M, dtype=jnp.float32,
                     config=PlanConfig(r=r, kmeans_impl="native"))
    yj = jnp.asarray(y)
    prep = (sw.prepare_obs(model.dplan, yj, 1e-2)
            if _flag("PYMRA_PROF_PREP") == "1" else None)

    @jax.jit
    def run(l, yy):
        res = sw.mra_sweep(model.dplan, Kernel("exponential", l=l), yy, 1e-2,
                           compute_posterior=posterior, jitter=model.jitter,
                           prep=prep)
        if posterior:
            return res.objective, res.mean, res.var
        return res.objective

    out = run(jnp.float32(0.05), yj)
    jax.block_until_ready(out)
    # chained warm run so the trace covers back-to-back device work
    logdir = "/tmp/pymra_trace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        o = yj
        for i in range(reps):
            res = run(jnp.float32(0.05 + 0.001 * i), o)
            jax.block_until_ready(res)
        time.sleep(0.5)

    pbs = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    if not pbs:
        print("no xplane.pb captured", file=sys.stderr)
        return
    pd = jax.profiler.ProfileData.from_serialized_xspace(
        open(pbs[-1], "rb").read())
    per_op = collections.Counter()
    per_cat = collections.Counter()
    total = 0.0
    for plane in pd.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                dur = ev.duration_ns / 1e6  # ms
                name = ev.name
                per_op[name] += dur
                total += dur
                # bucket: strip fusion suffixes / numbers
                base = re.sub(r"[.\d]+$", "", name)
                per_cat[base] += dur
    print(f"# total device time {total:.1f} ms over {reps} reps "
          f"-> {total / reps:.1f} ms/eval")
    print("# top ops (summed over reps):")
    for name, dur in per_op.most_common(45):
        print(f"  {dur / reps:9.3f} ms/eval  {name[:110]}")


if __name__ == "__main__":
    main()

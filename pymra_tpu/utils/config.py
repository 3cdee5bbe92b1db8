"""Single source of truth for every ``PYMRA_*`` runtime flag.

The reference has no config system at all (SURVEY §5: constructor args
only); this framework steers a handful of TPU dispatch decisions with
environment variables so they can be A/B-flipped without code changes
(the benchmark methodology in BENCHNOTES.md depends on that). VERDICT r4
flagged the flags as scattered: every flag is now declared HERE, with its
default, legal values, and purpose, and every library read goes through
:func:`flag`. ``python -m pymra_tpu.utils.config`` prints the table.

Flags are read from the environment AT CALL TIME (not import time): they
select trace-time dispatch inside jitted code, so changing one between
calls — after clearing caches or under a fresh shape — takes effect, which
is exactly how the A/B benchmarks use them.
"""
from __future__ import annotations

import os
from typing import NamedTuple

__all__ = ["FLAGS", "flag", "flag_bool", "describe"]


class Flag(NamedTuple):
    name: str
    default: str
    choices: tuple | None  # None = free-form
    purpose: str


#: every runtime flag the library reads, in one place
FLAGS: dict[str, Flag] = {f.name: f for f in [
    # --- kernel / dispatch selection (tree/sweep.py, ops/pallas/linalg.py)
    Flag("PYMRA_CHOL", "fused", ("fused", "cascade"),
         "Jittered-Cholesky escalation strategy on the TPU f32 path: "
         "'fused' = scalar-carry-while early-exit Pallas kernel (clean "
         "case factorizes once); 'cascade' = unconditional 3x jitter "
         "cascade (rounds 2-3 behavior, compile-safe fallback)."),
    Flag("PYMRA_TRI_SOLVE", "auto", ("auto", "pallas", "xla"),
         "Batched triangular-solve backend: 'auto' uses the lane-batched "
         "Pallas kernel for factors wider than ~16 (where it beats XLA's "
         "invert+matmul lowering) within the gate-proven width caps; "
         "'xla' forces the XLA custom-call everywhere."),
    Flag("PYMRA_LEAF_SOLVE", "auto", ("auto", "inv", "tri"),
         "Leaf-level solve strategy: 'inv' inverts the posterior factor "
         "once (triangular_inverse_lower) and turns the six-plus wide "
         "solves into MXU matmuls in the native layout (no lane-relayout "
         "round trips); 'tri' keeps per-call triangular solves; 'auto' "
         "picks 'inv' on TPU for P >= 16."),
    Flag("PYMRA_LEAF_FUSED", "1", ("1", "0"),
         "Whole-leaf-stage fusion (ops/pallas/linalg.leaf_factor): one "
         "kernel pass produces the prior log-determinant and the "
         "posterior inverse factor + log-determinant; K_leaf never "
         "exists in HBM. '0' falls back to the two-kernel path."),
    Flag("PYMRA_MATMUL", "highest", ("highest", "high", "default"),
         "MXU pass count for every matmul in the sweep: f32 matmuls are "
         "emulated on the bf16 systolic array in 6 ('highest'), 3 "
         "('high') or 1 ('default') passes. 'highest' is the default: "
         "'high' measured fine at the N=1M bench (rel err 5e-6) but "
         "produced a 4e-2 objective error on the N=10^4 config, whose "
         "tiny measurement error (1e-4) conditions the posterior blocks "
         "at ~1e4 and amplifies the 3-pass residual — caught by the "
         "bench's TPU numerical anchor. 'default' (single-pass bf16) "
         "NaNs deep conditional chains; both lower settings are for "
         "A/B only."),
    Flag("PYMRA_PALLAS", "", ("", "force", "interpret"),
         "'force'/'interpret': route Pallas kernels through interpret "
         "mode on CPU so the test suite covers TPU-only sweep branches "
         "(tests/conftest.py uses this)."),
    Flag("PYMRA_DISABLE_PALLAS", "0", ("0", "1"),
         "'1': disable all Pallas kernels, forcing the pure-XLA "
         "fallbacks (debugging / non-TPU backends)."),
    # --- compilation cache (utils/cache.py)
    Flag("PYMRA_NO_CACHE", "0", ("0", "1"),
         "'1': disable the persistent XLA compilation cache (cold-"
         "compile measurements; also skips cache writes)."),
    Flag("PYMRA_CACHE_DIR", "~/.cache/pymra_tpu/jax_cache", None,
         "Persistent compilation-cache directory."),
    # --- logging / data (utils/logging.py, data/loader.py)
    Flag("PYMRA_LOG_LEVEL", "INFO", None,
         "Root log level applied by pymra_tpu.utils.logging.configure."),
    Flag("PYMRA_REFERENCE_PATH", "/root/reference", None,
         "Path to the reference pyMRA checkout for data/loader.py's "
         "source='reference' option and the live parity tests."),
    # --- benchmark drivers (bench.py, benchmarks/*.py; script-level)
    Flag("PYMRA_BENCH_SKIP_GATE", "0", ("0", "1"),
         "bench.py: skip the cold Pallas compile gate stage."),
    Flag("PYMRA_BENCH_SKIP_NUTS", "0", ("0", "1"),
         "bench.py: skip the NUTS sampler stage."),
    Flag("PYMRA_BENCH_SKIP_VI", "0", ("0", "1"),
         "bench.py: skip the ADVI and SMC stages."),
    Flag("PYMRA_BENCH_SKIP_1M", "0", ("0", "1"),
         "bench.py: skip the N=10^6 flagship stage."),
    Flag("PYMRA_BENCH_SKIP_REFSHAPE", "0", ("0", "1"),
         "bench.py: skip the reference-shaped (M derived per the "
         "reference formula) N=10^6 comparison run."),
    Flag("PYMRA_BENCH_SKIP_BIGNUTS", "0", ("0", "1"),
         "bench.py: skip the large-N gradient-sampler stage."),
    Flag("PYMRA_RUN_1M", "0", ("0", "1"),
         "tests/test_golden_anchors.py: run the several-minute N=10^6 "
         "f64 ground-truth anchor."),
    Flag("PYMRA_PROF_SIDE", "1000", None,
         "benchmarks/profile_sweep.py & trace_sweep.py: grid side."),
    Flag("PYMRA_PROF_R", "8", None, "profiling scripts: knots per node."),
    Flag("PYMRA_PROF_M", "-1", None,
         "profiling scripts: pin tree depth; -1 = tpu_shaped_M."),
    Flag("PYMRA_PROF_EVALS", "8", None,
         "profile_sweep.py: chained evaluations per measurement."),
    Flag("PYMRA_PROF_REPS", "4", None, "trace_sweep.py: traced reps."),
    Flag("PYMRA_PROF_POSTERIOR", "1", ("1", "0"),
         "trace_sweep.py: include the posterior passes."),
    Flag("PYMRA_PROF_PREP", "1", ("1", "0"),
         "trace_sweep.py: hoist prepare_obs out of the traced loop."),
    Flag("PYMRA_PROF_STAGES", "", None,
         "profile_sweep.py: comma-separated stage subset."),
    Flag("PYMRA_SHAPE_SIDE", "1000", None,
         "bench_tree_shape.py: grid side."),
    Flag("PYMRA_SHAPE_R", "8", None, "bench_tree_shape.py: knots/node."),
    Flag("PYMRA_SHAPE_MS", "8,7,6", None,
         "bench_tree_shape.py: comma-separated depths to time."),
]}


def flag(name: str) -> str:
    """Read flag ``name`` from the environment (registry default if unset).

    Every library read of a ``PYMRA_*`` variable goes through here, so the
    registry above is authoritative: asking for an undeclared flag raises.
    """
    f = FLAGS[name]
    return os.environ.get(name, f.default)


def flag_bool(name: str) -> bool:
    """Boolean flags: unset / '' / '0' = False, anything else = True."""
    return flag(name) not in ("", "0")


def describe() -> str:
    """Human-readable table of every flag, its default, and its purpose."""
    lines = []
    for f in FLAGS.values():
        choices = f" {{{','.join(c if c else repr(c) for c in f.choices)}}}" \
            if f.choices else ""
        lines.append(f"{f.name} (default {f.default!r}){choices}\n"
                     f"    {f.purpose}")
    return "\n".join(lines)


if __name__ == "__main__":
    print(describe())

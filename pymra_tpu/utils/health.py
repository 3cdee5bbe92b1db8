"""Failure detection and recovery as a first-class subsystem.

The reference's failure handling is a debugger breakpoint —
``pdb.set_trace()`` in library code (pyMRA/MRANode.py:47,390,454,
MRATree.py:509) — and its fork-based parallelism can hang forever on a
dead child (``pipe.recv()``, MRANode.py:103; SURVEY §5). Here failure
handling is layered:

  * **in-sweep** — numerical failure (indefinite conditional blocks from
    near-duplicate points, deep-chain round-off) is handled *inside* the
    kernels by the per-matrix jitter-escalation cascade
    (``ops/pallas/linalg``: the scale-relative jitter retries at 1e2x /
    1e4x per batch member; replaces the reference's eigh-abs repair,
    MRANode.py:504-507). NaNs that survive escalation propagate to the
    outputs instead of crashing mid-pipeline;
  * **in-sampler** — NUTS/HMC treat non-finite energies as divergences
    (Stan semantics, ``infer/nuts.py``), so a pathological theta poisons
    one transition, not the chain;
  * **post-hoc** — :func:`check_result` / :func:`check_samples` below turn
    surviving problems into a structured :class:`HealthReport` (and
    optionally a :class:`SweepHealthError`) instead of silent NaNs in
    downstream statistics;
  * **recovery** — everything needed to resume interrupted work is
    checkpointable (``utils/checkpoint``): the plan (deterministic,
    seconds-to-minutes of host work at N=10^6), prepared observations,
    and sampler states. :func:`resume_state` reconstructs a sampler
    restart point from the last retained draws — the multi-chip analog of
    elastic recovery: lose a host, reload plan + last draws, continue
    (tested in tests/test_aux.py::TestFailureRecovery).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["HealthReport", "SweepHealthError", "check_result",
           "check_samples", "resume_state"]


class SweepHealthError(RuntimeError):
    """Raised by :func:`check_result`/:func:`check_samples` on demand when
    a result fails its health checks; carries the :class:`HealthReport`."""

    def __init__(self, report: "HealthReport"):
        super().__init__(str(report))
        self.report = report


class HealthReport(NamedTuple):
    ok: bool
    #: number of non-finite entries per field ({} when all finite)
    nonfinite: dict
    #: count of (numerically) negative posterior variances below -tol
    negative_var: int
    #: most negative variance observed (0.0 if none)
    min_var: float
    #: sampler divergence rate (divergent transitions / retained draws);
    #: 0.0 when not applicable — a dedicated field so the integer counts
    #: in ``nonfinite`` stay homogeneous (ADVICE r4)
    divergence_rate: float = 0.0

    def __str__(self):
        if self.ok:
            return "healthy"
        parts = []
        if self.nonfinite:
            parts.append(f"non-finite entries: {self.nonfinite}")
        if self.negative_var:
            parts.append(
                f"{self.negative_var} negative posterior variances "
                f"(min {self.min_var:.3e})")
        if self.divergence_rate:
            parts.append(f"divergence rate {self.divergence_rate:.3f}")
        return "; ".join(parts)


def check_result(result, var_tol: float = 1e-6,
                 raise_on_failure: bool = False) -> HealthReport:
    """Validate a :class:`pymra_tpu.tree.sweep.SweepResult`.

    Checks: objective/loglik finite; posterior mean finite; posterior
    variance finite and >= -var_tol (tiny negatives are float round-off
    of the rank-downdate chain; material negatives indicate a broken
    plan or insufficient jitter). Host-side (fetches the outputs); call
    it on results you are about to consume, not inside hot loops.
    """
    nonfinite = {}
    for name in ("objective", "loglik", "mean", "var"):
        val = getattr(result, name, None)
        if val is None:
            continue
        bad = int(np.sum(~np.isfinite(np.asarray(val))))
        if bad:
            nonfinite[name] = bad
    neg = 0
    min_var = 0.0
    if getattr(result, "var", None) is not None:
        v = np.asarray(result.var)
        finite = v[np.isfinite(v)]
        if finite.size:
            min_var = float(min(finite.min(), 0.0))
            neg = int(np.sum(finite < -var_tol))
    report = HealthReport(ok=not nonfinite and neg == 0,
                          nonfinite=nonfinite, negative_var=neg,
                          min_var=min_var)
    if raise_on_failure and not report.ok:
        raise SweepHealthError(report)
    return report


def check_samples(samples, divergences=None, max_divergence_rate=0.05,
                  raise_on_failure: bool = False) -> HealthReport:
    """Validate sampler output (pytree of [chains, draws, ...] arrays).

    Non-finite draws indicate an escaped NaN (the samplers' divergence
    handling should make this impossible — treat any hit as a bug);
    a divergence *rate* above ``max_divergence_rate`` flags a
    mis-adapted step size / pathological posterior.
    """
    nonfinite = {}
    total_bad = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(samples):
        bad = int(np.sum(~np.isfinite(np.asarray(leaf))))
        if bad:
            nonfinite[jax.tree_util.keystr(path)] = bad
            total_bad += bad
    div_ok = True
    div_rate = 0.0
    if divergences is not None:
        n_draws = max(
            int(np.prod(np.asarray(jax.tree_util.tree_leaves(samples)[0]
                                   ).shape[:2])), 1)
        div_rate = float(np.sum(np.asarray(divergences))) / n_draws
        div_ok = div_rate <= max_divergence_rate
    report = HealthReport(ok=not total_bad and div_ok,
                          nonfinite=nonfinite, negative_var=0, min_var=0.0,
                          divergence_rate=div_rate)
    if raise_on_failure and not report.ok:
        raise SweepHealthError(report)
    return report


def resume_state(samples):
    """Extract a restart point from retained draws: the last draw of each
    chain, as an init pytree for :func:`pymra_tpu.infer.nuts`/``hmc``.

    The elastic-recovery recipe: periodically ``save_pytree`` the sampler
    output; on failure, ``load_pytree`` + ``resume_state`` + rerun with a
    fresh key — statistically a valid continuation of the chains (warmup
    can be shortened or skipped by passing the previously adapted step
    size / mass via the sampler's init arguments).
    """
    return jax.tree.map(lambda a: jnp.asarray(a)[:, -1, ...], samples)

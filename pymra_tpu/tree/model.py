"""User-facing model API.

:class:`MRAModel` is the TPU-native interface: plan once, then evaluate the
differentiable likelihood / posterior for any kernel hyper-parameters without
re-planning (the reference rebuilds the whole tree per likelihood evaluation
— README.md:96-105, SURVEY §3.3).

:class:`MRATree` is an API-compatibility facade mirroring the reference
constructor and accessors (pyMRA/MRATree.py:23-94): ``MRATree(locs, r, cov,
obs, R, M, J, critDepth)``, ``getLikelihood()``, ``predict()``. ``critDepth``
(the reference's fork-parallelism switch, MRANode.py:64-116) is accepted and
ignored: parallelism here comes from the device mesh, not process forks.
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from pymra_tpu.tree.plan import PlanConfig, TreePlan, build_plan
from pymra_tpu.tree.sweep import (
    DevicePlan,
    SweepResult,
    make_device_plan,
    mra_sweep,
)

__all__ = ["MRAModel", "MRATree"]


def _wrap_cov(cov) -> Callable:
    """Make an arbitrary covariance callable jit-traceable as an argument."""
    treedef = jax.tree_util.tree_structure(cov)
    if jax.tree_util.treedef_is_leaf(treedef):
        # a bare function/lambda (the reference's covariance-lambda style,
        # README.md:98) — wrap so jit treats it as a static callable
        return jax.tree_util.Partial(cov)
    return cov  # already a parameterized pytree (e.g. kernels.Kernel)


@functools.partial(jax.jit, static_argnames=("compute_posterior", "jitter"))
def _sweep_jit(dplan, covfn, y, r_diag, compute_posterior, jitter,
               r_dense=None):
    return mra_sweep(
        dplan, covfn, y, r_diag,
        compute_posterior=compute_posterior, jitter=jitter, r_dense=r_dense,
    )


class MRAModel:
    """A planned MRA model over a fixed set of locations.

    Args:
      locs: ``[N, d]`` locations (1-D inputs may be ``[N]``).
      r: knots per interior node.
      M, J: resolutions / branching factor; defaults derived as in the
        reference (pyMRA/MRATree.py:31-50; 1-D default-J bug fixed).
      dtype: device dtype (float32 default; tests use x64 on CPU).
      jitter: Cholesky diagonal regularization. ``None`` selects 0 for
        float64 and 1e-6 for float32.
      seed / config: planner determinism and thresholds
        (:class:`pymra_tpu.tree.plan.PlanConfig`).
    """

    def __init__(self, locs, r: int, *, M: int = -1, J: int = -1,
                 seed: int = 0, dtype=None, jitter: float | None = None,
                 config: PlanConfig | None = None,
                 plan: TreePlan | None = None,
                 index_mode: bool = False):
        from pymra_tpu.utils.cache import enable_persistent_cache

        enable_persistent_cache()  # no-op when PYMRA_NO_CACHE=1
        if plan is None:
            plan = build_plan(locs, r, M=M, J=J, seed=seed, config=config)
        self.plan = plan
        if dtype is None:
            dtype = (jnp.float64 if jax.config.jax_enable_x64
                     else jnp.float32)
        self.dtype = dtype
        if jitter is None:
            jitter = 0.0 if dtype == jnp.float64 else 1e-6
        self.jitter = float(jitter)
        #: index_mode plans pass location indices (not coordinates) to the
        #: covariance — for dense-matrix covariances via
        #: :class:`pymra_tpu.kernels.MatrixKernel` (the reference's
        #: matrix-cov path, MRANode.py:73-75)
        self.index_mode = bool(index_mode)
        self.dplan: DevicePlan = make_device_plan(
            plan, dtype=dtype, index_points=index_mode
        )

    # -- core evaluations ---------------------------------------------------

    def sweep(self, cov, y, R, compute_posterior: bool = True) -> SweepResult:
        """Run the full batched sweep (likelihood + posterior moments).

        ``R`` may be a scalar, an ``[N]`` diagonal, or an ``[N, N]`` dense
        measurement-error covariance (honored within each leaf block — the
        reference's matrix-R slicing semantics, pyMRA/MRANode.py:85-88).
        """
        if np.ndim(R) == 2:
            return _sweep_jit(
                self.dplan, _wrap_cov(cov), jnp.asarray(y).ravel(),
                jnp.ones((), dtype=self.dtype), compute_posterior,
                self.jitter, r_dense=R,
            )
        return _sweep_jit(
            self.dplan, _wrap_cov(cov), jnp.asarray(y).ravel(), R,
            compute_posterior, self.jitter,
        )

    def objective(self, cov, y, R) -> jnp.ndarray:
        """The reference's ``getLikelihood()`` value: ``logdet + quadratic``
        minimization objective (= -2 loglik - n_obs log 2pi), pyMRA/
        MRATree.py:82-84."""
        return self.sweep(cov, y, R, compute_posterior=False).objective

    def loglik(self, cov, y, R) -> jnp.ndarray:
        """Proper marginal log-density of the observed data (new in this
        framework; the reference only exposes the objective — SURVEY quirk
        #7)."""
        return self.sweep(cov, y, R, compute_posterior=False).loglik

    def posterior(self, cov, y, R):
        """Posterior mean and pointwise sd at every location."""
        res = self.sweep(cov, y, R, compute_posterior=True)
        return res.mean, jnp.sqrt(jnp.maximum(res.var, 0.0))

    def loglik_fn(self, y, R, kernel_builder: Callable | None = None):
        """Return ``theta -> loglik`` for gradient-based inference.

        ``kernel_builder(theta)`` maps a parameter pytree to a covariance
        callable; defaults to treating ``theta`` itself as the covariance
        (e.g. a :class:`pymra_tpu.kernels.Kernel` pytree).

        The per-leaf observation tensors are prepared ONCE here
        (:func:`pymra_tpu.tree.sweep.prepare_obs`), so each evaluation of
        the returned function skips the slot-permutation gather of ``y``
        — the dominant theta-independent cost of a sweep at large N.
        """
        from pymra_tpu.tree.sweep import prepare_obs

        y = jnp.asarray(y).ravel()
        prep = prepare_obs(self.dplan, y, R)

        def fn(theta):
            cov = kernel_builder(theta) if kernel_builder else theta
            return mra_sweep(
                self.dplan, cov, y, R,
                compute_posterior=False, jitter=self.jitter, prep=prep,
            ).loglik

        return fn

    # -- tree telemetry (reference MRATree.py:136-157) ----------------------

    def leaf_sizes(self) -> np.ndarray:
        return self.plan.leaf_sizes()

    def describe(self) -> str:
        return self.plan.describe()


class MRATree:
    """Drop-in style facade over :class:`MRAModel` mirroring the reference
    ``MRATree`` (pyMRA/MRATree.py:23-94).

    Differences by design (each a reference bug/limitation per SURVEY):
      * deterministic, seeded planning (quirk #5);
      * ``critDepth`` accepted but ignored — use the mesh API in
        :mod:`pymra_tpu.parallel` for multi-chip execution (quirk #14);
      * ``predict`` returns ``(mean [N, 1], sd [N])`` exactly like the
        reference's (np.matrix, ndarray) shape asymmetry, minus np.matrix.
    """

    def __init__(self, locs, r, cov, obs, R, M=-1, J=-1, critDepth=-1,
                 verbose: bool = False, seed: int = 0, dtype=None):
        del critDepth, verbose
        # dense-matrix covariance (reference MRANode.py:73-75 matrix path)
        matrix_cov = isinstance(cov, (np.ndarray, jnp.ndarray)) and np.ndim(cov) == 2
        self.model = MRAModel(locs, r, M=M, J=J, seed=seed, dtype=dtype,
                              index_mode=matrix_cov)
        if matrix_cov:
            from pymra_tpu.kernels import MatrixKernel

            cov = MatrixKernel(jnp.asarray(cov, dtype=self.model.dtype))
        self.cov = cov
        self.obs = jnp.asarray(np.asarray(obs, dtype=np.float64).ravel())
        self.R = R
        self._result: SweepResult | None = None

    # Reference naming kept for familiarity.
    @property
    def M(self):
        return self.model.plan.M

    @property
    def J(self):
        return self.model.plan.J

    @property
    def r(self):
        return self.model.plan.r

    def _compute(self) -> SweepResult:
        if self._result is None:
            self._result = self.model.sweep(self.cov, self.obs, self.R)
        return self._result

    def getLikelihood(self) -> float:
        """Reference semantics (MRATree.py:82-84): ``logdet(Sigma_y) +
        y^T Sigma_y^{-1} y`` — a minimization objective, not a log-pdf."""
        return float(self._compute().objective)

    def getLogLik(self) -> float:
        """The actual marginal log-likelihood (new capability)."""
        return float(self._compute().loglik)

    def predict(self):
        res = self._compute()
        mean = np.asarray(res.mean).reshape(-1, 1)
        sd = np.sqrt(np.maximum(np.asarray(res.var), 0.0))
        return mean, sd

    # -- leaf telemetry (reference MRATree.py:136-157) ----------------------

    def avgLeafSize(self) -> float:
        return float(self.model.leaf_sizes().mean())

    def minLeaf(self) -> int:
        return int(self.model.leaf_sizes().min())

    def maxLeaf(self) -> int:
        return int(self.model.leaf_sizes().max())

    def setPrior(self, xF=None, Sigma=None):
        """Replace the covariance with an explicit dense matrix and reset
        cached results (reference ``setPrior``, MRATree.py:436-438 — whose
        ``xF`` argument is ignored there too, SURVEY quirk #12)."""
        del xF
        from pymra_tpu.kernels import MatrixKernel

        if not self.model.index_mode:
            self.model = MRAModel(
                self.model.plan.locs, self.r, M=self.M, J=self.J,
                plan=self.model.plan, index_mode=True,
                dtype=self.model.dtype,
            )
        self.cov = MatrixKernel(jnp.asarray(Sigma, dtype=self.model.dtype))
        self._result = None

    # -- tree traversal (reference MRATree.py:101-132) ----------------------

    def getNodesBFS(self, groupByResolution: bool = False):
        """Host node records in BFS order. Unlike the reference — whose tree
        is destroyed during construction (MRANode.py:108-111, SURVEY quirk
        #3) — the full structure is always available here."""
        per_level = self.model.plan.nodes
        if groupByResolution:
            return [list(nodes) for nodes in per_level if nodes]
        return [nd for nodes in per_level for nd in nodes]

    def getNodesDFS(self):
        out = []

        def visit(nd):
            out.append(nd)
            for ch in nd.children:
                visit(ch)

        visit(self.model.plan.nodes[0][0])
        return out

    # -- ancestor-basis diagnostics (reference MRATree.py:359-430) ----------

    def _node_by_id(self, node_id: str):
        if not node_id or node_id[0] != "r":
            raise ValueError(f"node IDs start with 'r', got {node_id!r}")
        node = self.model.plan.nodes[0][0]
        for ch in node_id[1:]:
            j = int(ch) - 1
            if j < 0 or j >= len(node.children):
                raise KeyError(f"no child {ch} under node {node.node_id!r}")
            node = node.children[j]
        return node

    def getKNode(self, callerID: str, k: int):
        """The resolution-``k`` ancestor on the path to ``callerID``
        (reference ``getKNode``, MRATree.py:401-430 — degenerate at
        reference HEAD because children are deleted post-build, SURVEY
        quirk #3; fully functional here)."""
        return self._node_by_id(callerID[: k + 1])

    def getB_lk(self, callerID: str, k: int, l: int | None = None):
        """Rows of ancestor ``k``'s prior basis matrix restricted to the
        resolution-``l`` node on the caller's path (reference ``getB_lk``,
        MRATree.py:359-396).

        Returns the conditional cross-covariance ``Sigma_k(X_l, Q_k)``
        between the l-node's locations and the k-ancestor's knots, given
        the knots of resolutions ``< k`` — sequential conditioning on
        nested knot sets equals joint conditioning (the chain identity the
        device sweep uses, tree/sweep.py ``_chain_cond``), so this is one
        dense solve against the joint ancestor-knot covariance.
        """
        import numpy as np

        node_l = self._node_by_id(callerID if l is None
                                  else callerID[: l + 1])
        node_k = self.getKNode(callerID, k)
        plan = self.model.plan

        def pts(gidx):
            if self.model.index_mode:
                return jnp.asarray(gidx, dtype=jnp.int32)[:, None]
            return jnp.asarray(plan.locs[gidx], dtype=self.model.dtype)

        X = pts(node_l.loc_gidx)
        Qk = pts(node_k.knot_gidx)
        B = self.cov(X, Qk)
        anc_gidx = []
        cur = node_k.parent
        while cur is not None:
            anc_gidx.append(cur.knot_gidx)
            cur = cur.parent
        if anc_gidx:
            Qa = pts(np.concatenate(anc_gidx[::-1]))
            Kaa = self.cov(Qa, Qa)
            rhs = self.cov(Qa, Qk)
            corr = self.cov(X, Qa) @ jnp.linalg.solve(
                Kaa + 1e-12 * jnp.eye(Kaa.shape[0], dtype=Kaa.dtype), rhs
            )
            B = B - corr
        return np.asarray(B)

    # -- basis matrix + drawing (reference MRATree.py:161-352, 445-511) -----

    def getBasisFunctionsMatrix(self, distr: str = "prior",
                                groupByResolution: bool = False,
                                order: str = "root", timesKC: bool = False):
        from pymra_tpu.tree.basis import basis_matrix

        y = self.obs if distr == "posterior" else None
        return basis_matrix(
            self.model, self.cov, y=y, R=self.R, distr=distr,
            group_by_resolution=groupByResolution, order=order,
            times_kc=timesKC,
        )

    def drawKnots(self, fname=None, show=False):
        from pymra_tpu.utils import viz

        return viz.draw_knots(self.model, fname=fname, show=show)

    def drawBMatrix(self, distr="prior", fname=None, show=False):
        from pymra_tpu.utils import viz

        return viz.draw_b_matrix(self.model, self.cov, y=self.obs, R=self.R,
                                 distr=distr, fname=fname, show=show)

    def drawSparsityPat(self, distr="prior", fname=None, show=False):
        from pymra_tpu.utils import viz

        return viz.draw_sparsity_pattern(self.model, self.cov, y=self.obs,
                                         R=self.R, distr=distr, fname=fname,
                                         show=show)

    def drawBasisFunctions(self, distr="prior", fname=None, show=False):
        from pymra_tpu.utils import viz

        return viz.draw_basis_functions(self.model, self.cov, y=self.obs,
                                        R=self.R, distr=distr, fname=fname,
                                        show=show)

    def drawGridAndObs(self, fname=None, show=False):
        from pymra_tpu.utils import viz

        return viz.draw_grid_and_obs(self.model, self.obs, fname=fname,
                                     show=show)

"""Covariance kernels.

TPU-native (jnp, batched, differentiable) equivalents of the reference kernel
toolbox (pyMRA/MRATools.py:253-388):

  * ``identity``      <- ``Iden``            (MRATools.py:256-262)
  * ``exponential``   <- ``ExpCovFun``       (MRATools.py:265-269)
  * ``matern``        <- ``Matern``          (MRATools.py:273-277, sklearn wrapper;
                          here closed-form for nu in {1/2, 3/2, 5/2, inf})
  * ``matern32``      <- ``Matern32``        (MRATools.py:289-293)
  * ``matern52``      <- ``Matern52``        (MRATools.py:281-285)
  * ``gaussian``      <- ``GaussianCovFun``  (MRATools.py:297-301)
  * ``kanter``        <- ``KanterCovFun``    (MRATools.py:305-324)
  * ``determine_radius``                     (MRATools.py:329-388)

All kernels are pure jnp functions of ``(locs1, locs2)`` plus differentiable
hyper-parameters, broadcast over leading batch dimensions so they can be
``vmap``-ed across the nodes of a tree level. ``Kernel`` wraps a kernel family
with a parameter pytree so hyper-parameters can be traced through ``jit`` /
``grad`` (the reference instead re-built its covariance lambdas per likelihood
evaluation, README.md:96-105).
"""
from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from pymra_tpu.ops.distances import dist, sqdist

__all__ = [
    "identity",
    "exponential",
    "matern12",
    "matern32",
    "matern52",
    "matern",
    "gaussian",
    "kanter",
    "determine_radius",
    "Kernel",
    "MatrixKernel",
    "get_kernel",
]


def identity(locs1, locs2=None, l=1.0, sig=1.0, circular=False):
    """White-noise kernel: 1 where the two points coincide, else 0."""
    d = dist(locs1, locs2, circular=circular)
    return sig * (d == 0.0).astype(d.dtype)


def exponential(locs1, locs2=None, l=1.0, sig=1.0, circular=False):
    """Exponential kernel ``sig * exp(-d / l)``.

    The reference ``ExpCovFun`` has no variance parameter (callers scale the
    matrix); ``sig`` defaults to 1 so the semantics coincide.
    """
    d = dist(locs1, locs2, circular=circular)
    return sig * jnp.exp(-d / l)


matern12 = exponential


def matern32(locs1, locs2=None, l=1.0, sig=1.0, circular=False):
    """Matern nu=3/2: ``sig * (1 + sqrt(3) d/l) exp(-sqrt(3) d/l)``."""
    d = dist(locs1, locs2, circular=circular)
    s = math.sqrt(3.0) * d / l
    return sig * (1.0 + s) * jnp.exp(-s)


def matern52(locs1, locs2=None, l=1.0, sig=1.0, circular=False):
    """Matern nu=5/2: ``sig * (1 + sqrt(5) d/l + 5 d^2/(3 l^2)) exp(-sqrt(5) d/l)``."""
    d = dist(locs1, locs2, circular=circular)
    s = math.sqrt(5.0) * d / l
    return sig * (1.0 + s + s * s / 3.0) * jnp.exp(-s)


def gaussian(locs1, locs2=None, l=1.0, sig=1.0, circular=False):
    """Squared-exponential kernel ``sig * exp(-d^2 / (2 l^2))``."""
    if circular:
        d = dist(locs1, locs2, circular=True)
        d2 = d * d
    else:
        d2 = sqdist(locs1, locs2)
    return sig * jnp.exp(-d2 / (2.0 * l * l))


def matern(locs1, locs2=None, l=1.0, sig=1.0, nu=1.5, circular=False):
    """Matern family dispatcher for the half-integer smoothness values.

    The reference wraps ``sklearn...Matern`` for arbitrary ``nu``
    (MRATools.py:273-277); on TPU we keep the closed-form members
    ``nu in {0.5, 1.5, 2.5, inf}``, which cover every configuration the
    reference itself exercises.
    """
    if nu == 0.5:
        return exponential(locs1, locs2, l=l, sig=sig, circular=circular)
    if nu == 1.5:
        return matern32(locs1, locs2, l=l, sig=sig, circular=circular)
    if nu == 2.5:
        return matern52(locs1, locs2, l=l, sig=sig, circular=circular)
    if nu == math.inf:
        return gaussian(locs1, locs2, l=l, sig=sig, circular=circular)
    # general nu: device-native Temme-series / continued-fraction Bessel K
    # (ops/special.py) — jittable and differentiable in l/sig/locs, unlike
    # round 1's host-only scipy fallback. nu itself must be static: it
    # selects the series order at trace time, exactly as the reference
    # bakes nu into its sklearn kernel object (MRATools.py:273-277).
    import jax.core

    if isinstance(nu, jax.core.Tracer):
        raise TypeError(
            "matern: nu must be a static Python float — it fixes the Bessel "
            "recurrence depth at trace time (differentiate l/sig instead)."
        )
    from pymra_tpu.ops.special import matern_general

    d = dist(locs1, locs2, circular=circular)
    return matern_general(d, l, sig, float(nu))


def kanter(locs1, locs2=None, radius=1.0, circular=False):
    """Kanter compact-support taper (reference ``KanterCovFun``).

    ``R(d) = (1-t) sinc-like`` form with support ``d <= radius``; exact value 1
    at ``d = 0``. If ``radius`` is an int it is interpreted as an ensemble size
    and converted through :func:`determine_radius` using the x-grid spacing,
    matching MRATools.py:305-316.
    """
    if isinstance(radius, (int, np.integer)) and not isinstance(radius, bool):
        xs = np.sort(np.unique(np.asarray(locs1)[:, 0]))
        h = float(xs[1] - xs[0])
        arr = np.asarray(locs1)
        ndim = len(np.unique(arr[:, 1])) if arr.shape[1] > 1 else 1
        radius = determine_radius(int(radius), h, ndim=ndim)

    d = dist(locs1, locs2, circular=circular) / radius
    # Guard the removable singularity at d=0; the limit of the expression is 1.
    safe = jnp.where(d == 0.0, 1.0, d)
    pid2 = 2.0 * jnp.pi * safe
    r = (1.0 - safe) * jnp.sin(pid2) / pid2 + (1.0 - jnp.cos(pid2)) / (jnp.pi * pid2)
    r = jnp.where(d == 0.0, 1.0, r)
    # support is d < 1 (the analytic value at d == 1 is exactly 0)
    return jnp.where(d >= 1.0, 0.0, r)


def determine_radius(k: int, h: float, ndim: int = 2) -> float:
    """Taper radius giving ~``k`` nonzeros per row on a grid with spacing ``h``.

    Host-side scalar helper (numpy), semantics of MRATools.py:329-388: in 1-D
    the radius spans ``k/2`` grid cells; in 2-D it interpolates between odd
    squares so the disc of radius ``r`` contains approximately ``k`` points.
    """
    if ndim == 1:
        return int(k / 2) * h
    if k == 0:
        raise ValueError("Ensemble size must be strictly positive")
    s = math.floor(math.sqrt(k))
    sf = s - 1 if s % 2 == 0 else s
    if k == sf**2:
        return h * 1.01 * (sf - 1) / 2.0 * math.sqrt(2.0)
    base = (sf - 1) / 2.0

    intervals = [sf**2]
    while intervals[-1] < (sf + 2) ** 2:
        if len(intervals) == 1 or ((sf + 2) ** 2 - intervals[-1] == 4):
            intervals.append(intervals[-1] + 4)
        else:
            intervals.append(intervals[-1] + 8)
    intervals = np.array(intervals)

    ind = int(intervals.searchsorted(k))
    middle = (intervals[ind - 1] + intervals[ind]) / 2.0
    app_ind = ind - 1 if k <= middle else ind
    if app_ind == 0:
        return h * base * math.sqrt(2.0) + h * 0.01
    return h * math.sqrt((base + 1) ** 2 + (app_ind - 1) ** 2) + h * 0.01


_REGISTRY: dict[str, Callable] = {
    "identity": identity,
    "exponential": exponential,
    "matern12": matern12,
    "matern32": matern32,
    "matern52": matern52,
    "matern": matern,
    "gaussian": gaussian,
    "kanter": kanter,
}


def get_kernel(name: str) -> Callable:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"Unknown kernel {name!r}; available: {sorted(_REGISTRY)}"
        ) from None


@jax.tree_util.register_pytree_node_class
class MatrixKernel:
    """Covariance supplied as a dense pre-computed matrix.

    Counterpart of the reference's ``isinstance(cov, np.matrix)`` path
    (pyMRA/MRANode.py:73-75, 381-382): instead of evaluating a kernel at
    coordinates, sub-blocks are gathered from ``matrix`` by location index.
    Use with an index-mode device plan
    (``make_device_plan(..., index_points=True)``); the model facade sets
    this up automatically when ``cov`` is an array.
    """

    def __init__(self, matrix):
        self.matrix = jnp.asarray(matrix)

    def __call__(self, xi, yi=None):
        if yi is None:
            yi = xi
        i = jnp.asarray(xi)[..., 0].astype(jnp.int32)
        j = jnp.asarray(yi)[..., 0].astype(jnp.int32)
        return self.matrix[i[..., :, None], j[..., None, :]]

    def tree_flatten(self):
        return (self.matrix,), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        obj = object.__new__(cls)
        obj.matrix = leaves[0]
        return obj

    def __repr__(self):
        return f"MatrixKernel(shape={tuple(self.matrix.shape)})"


@jax.tree_util.register_pytree_node_class
class Kernel:
    """A kernel family bound to a differentiable parameter pytree.

    ``Kernel('matern32', l=0.3, sig=1.0)`` behaves like the reference's
    covariance lambdas (README.md:98) but is a JAX pytree: its parameters are
    traced leaves, so a likelihood built from it is differentiable in the
    hyper-parameters and can be re-parameterised inside ``jit`` without
    rebuilding any structure.
    """

    #: parameters that select code structure at trace time (series order,
    #: distance metric) — kept as static pytree aux data, never traced
    STATIC_PARAMS = ("nu", "circular")

    def __init__(self, name: str, **params):
        self.name = name
        self.static = {k: params.pop(k) for k in list(params)
                       if k in self.STATIC_PARAMS}
        self.params = {k: jnp.asarray(v) for k, v in params.items()}
        self._fn = get_kernel(name)

    def __call__(self, locs1, locs2=None):
        return self._fn(locs1, locs2, **self.params, **self.static)

    def replace(self, **params) -> "Kernel":
        new = dict(self.params)
        new.update(self.static)
        new.update(params)
        return Kernel(self.name, **new)

    def tree_flatten(self):
        keys = tuple(sorted(self.params))
        static = tuple(sorted(self.static.items()))
        return tuple(self.params[k] for k in keys), (self.name, keys, static)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        # must not touch leaves (they may be tracers, PartitionSpecs, etc.)
        name, keys, static = aux
        obj = object.__new__(cls)
        obj.name = name
        obj.params = dict(zip(keys, leaves))
        obj.static = dict(static)
        obj._fn = get_kernel(name)
        return obj

    def __repr__(self):
        ps = ", ".join(f"{k}={v}" for k, v in
                       {**self.params, **self.static}.items())
        return f"Kernel({self.name!r}, {ps})"

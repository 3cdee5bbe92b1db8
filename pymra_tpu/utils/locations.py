"""Location/grid generators.

Equivalents of the reference generators (pyMRA/MRATools.py:180-220). These are
host-side helpers producing numpy arrays (tree planning is host-side static
metadata); convert to jnp at the device boundary.
"""
from __future__ import annotations

import numpy as np

__all__ = ["gen_locations", "gen_locations_2d", "gen_clusters"]


def gen_locations(n_grid: int, lb: float = 0.0, ub: float = 1.0,
                  random: bool = False, seed: int | None = None) -> np.ndarray:
    """1-D grid of ``n_grid`` points on ``(lb, ub]`` as an ``[n, 1]`` array.

    Matches ``genLocations`` (MRATools.py:180-187): the deterministic grid is
    ``linspace(lb, ub, n+1)[1:]`` (excludes the lower bound).
    """
    if random:
        rng = np.random.default_rng(seed)
        locs = rng.uniform(lb, ub, n_grid)
    else:
        locs = np.linspace(lb, ub, num=n_grid + 1)[1:]
    return locs.reshape(n_grid, 1)


def gen_locations_2d(nx: int, lbx: float = 0.0, ubx: float = 1.0,
                     ny: int = 0, lby: float = 0.0, uby: float = 1.0) -> np.ndarray:
    """2-D meshgrid of ``nx * ny`` points as an ``[n, 2]`` array.

    Matches ``genLocations2d`` (MRATools.py:192-203) including its row order
    (x varies fastest within a y-row of the meshgrid).
    """
    if not ny:
        ny = nx
    xx, yy = np.meshgrid(np.linspace(lbx, ubx, num=nx), np.linspace(lby, uby, num=ny))
    return np.hstack((xx.reshape(nx * ny, 1), yy.reshape(nx * ny, 1)))


def gen_clusters(n: int, k: int, seed: int | None = None) -> np.ndarray:
    """``n`` points in ``k`` Gaussian clusters on the unit square.

    Matches ``genClusters`` (MRATools.py:207-220) with explicit seeding (the
    reference draws from the global RNG).
    """
    rng = np.random.default_rng(seed)
    n_per_k = n // k
    points = np.empty((0, 2))
    for _ in range(k):
        pts = rng.normal(loc=rng.uniform(size=2),
                         scale=rng.uniform(low=0.1, high=0.2),
                         size=(n_per_k, 2))
        points = np.vstack((points, pts))
    for _ in range(n - k * n_per_k):
        points = np.vstack((points, rng.uniform(size=2)))
    return points

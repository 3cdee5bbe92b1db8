"""Device-mesh helpers.

The reference's only parallelism is a per-subtree process fork joined by
pickling nodes over a Pipe (pyMRA/MRANode.py:64-116, design note in
pyMRA/multiprocess/basic-multiprocessing.py:15-23). Here parallel execution
is expressed over a ``jax.sharding.Mesh``: the leaf axis of the tree plan is
sharded across devices ("data" axis, the spatial analog of sequence
parallelism) and inference chains/particles across a "chain" axis (data
parallelism); communication is XLA collectives inside ``shard_map``.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "P", "Mesh", "NamedSharding"]


def make_mesh(shape: dict[str, int] | None = None, devices=None) -> Mesh:
    """Build a named mesh.

    ``shape`` maps axis name -> size, e.g. ``{"chain": 2, "data": 4}``.
    Defaults to a 1-D ``{"data": n_devices}`` mesh over all local devices.
    """
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = {"data": len(devices)}
    sizes = tuple(shape.values())
    n = int(np.prod(sizes))
    if n > len(devices):
        raise ValueError(
            f"mesh needs {n} devices, only {len(devices)} available"
        )
    dev_array = np.asarray(devices[:n]).reshape(sizes)
    return Mesh(dev_array, tuple(shape.keys()))

"""Device-mesh helpers, single- and multi-host.

The reference's only parallelism is a per-subtree process fork joined by
pickling nodes over a Pipe (pyMRA/MRANode.py:64-116, design note in
pyMRA/multiprocess/basic-multiprocessing.py:15-23); its MPI experiments
never left ``pyMRA/multiprocess/`` (testMPI.py). Here parallel execution
is expressed over a ``jax.sharding.Mesh``: the leaf axis of the tree plan is
sharded across devices ("data" axis, the spatial analog of sequence
parallelism) and inference chains/particles across a "chain" axis (data
parallelism); communication is XLA collectives inside ``shard_map``.

Multi-host placement (ICI vs DCN)
---------------------------------
On a multi-host deployment, call :func:`initialize_distributed` once per
process, then :func:`make_multihost_mesh`. Axis placement follows the MRA
communication pattern:

  * the **"data" (leaf/subtree) axis lives on ICI** — within-host chips.
    Leaf-level work dominates FLOPs and its only cross-device traffic is
    one ``psum`` of small per-parent ``(A, omega)`` messages per level
    (``tree/sweep.py``), but those psums happen every level of every
    evaluation, so they should ride the fast intra-slice interconnect.
  * the **"chain" axis lives on DCN** — across hosts. Chains/particles are
    embarrassingly parallel (they synchronize only at diagnostics), so the
    slow inter-host network carries almost nothing.
  * coarse tree levels are replicated on every device (they shrink
    geometrically; replication costs less than the halo exchange the
    reference's technical note needed for its MPI design).

``make_multihost_mesh`` therefore builds ``(chain=n_hosts*k, data=
chips_per_host/…)`` meshes with the DCN axis outermost, via
``jax.experimental.mesh_utils.create_hybrid_device_mesh``.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "make_multihost_mesh", "initialize_distributed",
           "P", "Mesh", "NamedSharding"]


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


_DIST_INITIALIZED = False


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None,
                           local_device_ids=None) -> None:
    """Join the multi-host JAX runtime (idempotent).

    Thin, guarded wrapper over ``jax.distributed.initialize``: on managed
    platforms (Cloud TPU VMs, SLURM, Open MPI) all arguments are
    auto-detected from the environment and may be omitted; on a hand-rolled
    cluster pass ``coordinator_address="host0:1234"``, ``num_processes`` and
    ``process_id`` explicitly. After this returns, ``jax.devices()`` lists
    the chips of *all* hosts and :func:`make_multihost_mesh` can span them.

    This replaces the reference's entire inter-process story — the
    ``critDepth`` fork + pickle Pipe (pyMRA/MRANode.py:64-116) and the
    abandoned mpi4py prototype (pyMRA/multiprocess/testMPI.py): nothing
    object-shaped ever crosses the wire; XLA moves array shards over
    ICI/DCN inside compiled collectives.
    """
    global _DIST_INITIALIZED
    # NOTE: must not touch the backend here (jax.devices/process_count would
    # initialize XLA and make jax.distributed.initialize fail)
    if _DIST_INITIALIZED or jax.distributed.is_initialized():
        _DIST_INITIALIZED = True
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    _DIST_INITIALIZED = True


def make_multihost_mesh(ici_shape: dict[str, int] | None = None,
                        dcn_shape: dict[str, int] | None = None) -> Mesh:
    """Build a (hosts x chips) mesh with DCN axes outermost.

    Args:
      ici_shape: axis name -> size for the *within-host* (ICI) dimensions,
        e.g. ``{"data": 4}``. Defaults to ``{"data": local_device_count}``.
      dcn_shape: axis name -> size for the *cross-host* (DCN) dimensions,
        e.g. ``{"chain": n_hosts}``. Defaults to ``{"chain": process_count}``.
        Axis names must not overlap ``ici_shape``'s.

    Returns a mesh whose axis order is ``(*dcn axes, *ici axes)`` so that
    collectives over the ICI axes never cross hosts. Shard the tree plan's
    leaf axis over the ICI "data" axis and vmapped chains/particles over the
    DCN "chain" axis (see module docstring for why).

    Single-process fallback: with one host this degrades to
    :func:`make_mesh` over the local devices (the DCN axes must then have
    size 1 or multiply into the local device count), so the same model code
    runs unmodified from a laptop CPU mesh to a multi-host pod.
    """
    if ici_shape is None:
        ici_shape = {"data": jax.local_device_count()}
    if dcn_shape is None:
        dcn_shape = {"chain": jax.process_count()}
    overlap = set(ici_shape) & set(dcn_shape)
    if overlap:
        raise ValueError(f"axis names used in both ici and dcn: {overlap}")
    names = tuple(dcn_shape.keys()) + tuple(ici_shape.keys())
    if jax.process_count() == 1:
        return make_mesh({**dcn_shape, **ici_shape})
    from jax.experimental import mesh_utils

    kwargs = dict(
        mesh_shape=(1,) * len(dcn_shape) + tuple(ici_shape.values()),
        dcn_mesh_shape=tuple(dcn_shape.values()) + (1,) * len(ici_shape),
        devices=jax.devices(),
    )
    try:
        # TPU pods: DCN granule = slice (devices carry slice_index)
        dev_array = mesh_utils.create_hybrid_device_mesh(**kwargs)
    except ValueError:
        # single-slice multi-host or CPU processes: granule = process
        dev_array = mesh_utils.create_hybrid_device_mesh(
            **kwargs, process_is_granule=True
        )
    return Mesh(dev_array, names)

"""Chain/particle parallelism helpers.

HMC chains and SMC particles are embarrassingly parallel; placing the chain
axis on a mesh axis makes XLA partition every batched operation (leapfrog,
log-prob sweeps) across devices with zero communication. Use together with
leaf-axis sharding (:mod:`pymra_tpu.parallel.sharded`) for chains x data
2-D meshes.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["shard_chains", "replicate"]


def shard_chains(pytree, mesh: Mesh, axis: str = "chain"):
    """Place every leaf's leading axis on ``mesh`` axis ``axis``."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, sharding), pytree)


def replicate(pytree, mesh: Mesh):
    """Replicate every leaf across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), pytree)

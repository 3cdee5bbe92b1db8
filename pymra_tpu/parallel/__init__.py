from pymra_tpu.parallel.mesh import Mesh, NamedSharding, P, make_mesh
from pymra_tpu.parallel.sharded import (
    pad_plan_for_sharding,
    sharded_loglik_fn,
    sharded_sweep,
)

__all__ = [
    "make_mesh",
    "Mesh",
    "NamedSharding",
    "P",
    "pad_plan_for_sharding",
    "sharded_sweep",
    "sharded_loglik_fn",
]

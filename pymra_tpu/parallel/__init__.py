from pymra_tpu.parallel.mesh import (
    Mesh,
    NamedSharding,
    P,
    initialize_distributed,
    make_mesh,
    make_multihost_mesh,
)
from pymra_tpu.parallel.sharded import (
    pad_plan_for_sharding,
    sharded_loglik_fn,
    sharded_sweep,
)

__all__ = [
    "make_mesh",
    "make_multihost_mesh",
    "initialize_distributed",
    "Mesh",
    "NamedSharding",
    "P",
    "pad_plan_for_sharding",
    "sharded_sweep",
    "sharded_loglik_fn",
]

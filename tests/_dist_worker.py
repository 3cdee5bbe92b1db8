"""Worker for the 2-process distributed smoke test (test_multihost.py).

Each process contributes 2 virtual CPU devices; together they form a
(chain=2 DCN) x (data=2 ICI) mesh — the placement documented in
pymra_tpu/parallel/mesh.py — and run the leaf-sharded MRA sweep with a
cross-process psum. Process 0 checks the sharded objective against the
single-device value computed locally.
"""
import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from pymra_tpu.parallel.mesh import initialize_distributed, make_multihost_mesh

initialize_distributed(coordinator_address=f"localhost:{port}",
                       num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc

import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from pymra_tpu import kernels
from pymra_tpu.parallel.sharded import _plan_specs, pad_plan_for_sharding
from pymra_tpu.tree.model import MRAModel
from pymra_tpu.tree.sweep import mra_sweep
from pymra_tpu.utils import gen_locations_2d

mesh = make_multihost_mesh(ici_shape={"data": 2}, dcn_shape={"chain": nproc})
assert mesh.axis_names == ("chain", "data")

locs = gen_locations_2d(16)  # 256 locs, M=3: interiors (1, 4, 16)
rng = np.random.default_rng(0)
y = rng.standard_normal(len(locs))
y[rng.random(len(locs)) > 0.7] = np.nan

model = MRAModel(locs, r=2, M=3, J=4)
dplan = pad_plan_for_sharding(model.dplan, 2)
# the 2-shard padded plan must shard interior level 2 (the TPU-native
# critDepth) so the cross-process run covers the transition-window psum
# and local interior aggregation, not just leaf sharding
assert dplan.int_shard_from == 2, dplan.int_shard_from
yj = jnp.asarray(y, model.dtype)
r_diag = jnp.full((model.plan.n_locs,), 1e-2, dtype=model.dtype)
lscales = jnp.asarray([0.3, 0.5], dtype=model.dtype)  # one per chain row


def per_chain(l, dp, yy, rr):
    kern = kernels.Kernel("matern32", l=l, sig=1.0)
    return mra_sweep(dp, kern, yy, rr, compute_posterior=False,
                     jitter=model.jitter, axis_name="data").objective


fn = jax.jit(shard_map(
    lambda ls, dp, yy, rr: jax.vmap(
        lambda l: per_chain(l, dp, yy, rr))(ls),
    mesh=mesh,
    in_specs=(P("chain"), _plan_specs(dplan, "data"), P(), P()),
    out_specs=P("chain"),
))

# distributed arrays: chains split across processes (DCN), plan leaf arrays
# split across each process's local devices (ICI)
ls_sharded = jax.device_put(lscales, NamedSharding(mesh, P("chain")))
dplan_sharded = jax.device_put(dplan, jax.tree.map(
    lambda spec: NamedSharding(mesh, spec), _plan_specs(dplan, "data")))
out = fn(ls_sharded, dplan_sharded, yj, r_diag)

from jax.experimental import multihost_utils

gathered = np.asarray(multihost_utils.process_allgather(out, tiled=True))

# every process can compute the reference locally (tiny problem)
for i, l in enumerate([0.3, 0.5]):
    ref = float(model.objective(kernels.Kernel("matern32", l=l, sig=1.0),
                                y, 1e-2))
    np.testing.assert_allclose(gathered[i], ref, rtol=1e-10)
print(f"proc {pid}: multihost MRA objective OK", flush=True)

"""Multi-device execution: leaf-axis sharding of the MRA sweep.

Replaces the reference's critDepth fork parallelism (MRANode.py:64-116).
Run with real TPU chips, or on CPU with
``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu``.
"""
import jax
import numpy as np

from pymra_tpu import Kernel, MRAModel
from pymra_tpu.parallel import make_mesh, sharded_sweep
from pymra_tpu.utils import gen_locations_2d, make_observations, simulate_grf


def main():
    n_dev = len(jax.devices())
    print(f"devices: {jax.devices()}")
    locs = gen_locations_2d(32)
    kern = Kernel("matern32", l=0.3)
    x = simulate_grf(jax.random.key(0), locs, kern, jitter=1e-8)
    y_obs, _ = make_observations(jax.random.key(1), x, 1e-3, frac_obs=0.8)
    y_obs = np.asarray(y_obs)

    model = MRAModel(locs, r=4)
    serial = model.sweep(kern, y_obs, 1e-3)

    mesh = make_mesh({"data": n_dev})
    shd = sharded_sweep(model.dplan, kern, y_obs, 1e-3, mesh)
    print(f"serial objective:  {float(serial.objective):.6f}")
    print(f"sharded objective: {float(shd.objective):.6f}  "
          f"(mesh data={n_dev})")
    print(f"max |mean diff|: "
          f"{np.abs(np.asarray(shd.mean) - np.asarray(serial.mean)).max():.2e}")


if __name__ == "__main__":
    main()

"""Test configuration: run on a virtual 8-device CPU mesh with float64.

Multi-chip sharding is validated on host CPU devices
(``xla_force_host_platform_device_count``); numerical oracle tests (exact
kriging parity, reference golden values) need float64, which TPU does not
provide natively — so the suite pins JAX to CPU. Real-TPU execution is
exercised by ``bench.py`` and ``__graft_entry__.py``.
"""
import os

# NOTE: this environment's sitecustomize force-registers a remote TPU
# backend and overrides JAX_PLATFORMS; the config.update below (after
# import) is what actually pins the test suite to host CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Compiles are ~seconds each in this sandbox; cache them persistently so
# repeated test runs are fast.
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

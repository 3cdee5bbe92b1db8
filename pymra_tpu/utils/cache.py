"""Persistent XLA compilation cache wiring.

The MRA sweep is one large jitted program; its first compilation on a new
machine costs tens of seconds of XLA/Mosaic work. JAX ships a persistent
on-disk compilation cache that makes every subsequent process start
instantly — the reference's whole value proposition is "starts computing
immediately" (pyMRA/README.md:35), so the TPU build enables the cache by
default for the user-facing entry points (:class:`pymra_tpu.tree.model.
MRAModel`, ``bench.py``, the benchmark scripts).

Opt out with ``PYMRA_NO_CACHE=1`` (e.g. to measure true cold-compile time);
point the cache somewhere specific with ``PYMRA_CACHE_DIR=/path``.
"""
from __future__ import annotations

import os

__all__ = ["enable_persistent_cache", "default_cache_dir"]

_ENABLED = False


def default_cache_dir() -> str:
    """``$PYMRA_CACHE_DIR``, else a per-user cache directory."""
    from pymra_tpu.utils.config import FLAGS, flag

    env = flag("PYMRA_CACHE_DIR")
    if env != FLAGS["PYMRA_CACHE_DIR"].default:
        return env
    base = os.environ.get("XDG_CACHE_HOME",
                          os.path.join(os.path.expanduser("~"), ".cache"))
    return os.path.join(base, "pymra_tpu", "jax_cache")


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Turn on JAX's persistent compilation cache (idempotent).

    Returns the cache directory, or ``None`` when disabled via
    ``PYMRA_NO_CACHE=1``. Safe to call before or after backend
    initialization; entries of every size/compile-time are cached (the MRA
    program is worth caching even when XLA compiles it quickly).
    """
    from pymra_tpu.utils.config import flag_bool

    global _ENABLED
    if flag_bool("PYMRA_NO_CACHE"):
        return None
    if _ENABLED:
        return path or default_cache_dir()
    import jax

    existing = jax.config.jax_compilation_cache_dir
    if existing and path is None:
        # respect a cache the application already configured
        _ENABLED = True
        return existing
    path = path or default_cache_dir()
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    _ENABLED = True
    return path

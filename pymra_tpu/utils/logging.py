"""Logging as a proper subsystem.

The reference uses ad-hoc per-module loggers with hard-coded levels
(pyMRA/MRATree.py:15-16 pins DEBUG, MRANode.py:16-17 INFO) and leaves
handler setup to user scripts (README.md:60-61). Here: one package-level
logger hierarchy, a single ``configure`` entry point, and an env override
(``PYMRA_LOG_LEVEL``).
"""
from __future__ import annotations

import logging

__all__ = ["get_logger", "configure"]

_ROOT = "pymra_tpu"
_configured = False


def get_logger(name: str | None = None) -> logging.Logger:
    return logging.getLogger(f"{_ROOT}.{name}" if name else _ROOT)


def configure(level: str | int | None = None,
              fmt: str = "%(asctime)s %(name)s %(levelname)s %(message)s",
              datefmt: str = "%H:%M:%S") -> logging.Logger:
    """Attach a stream handler to the package logger (idempotent)."""
    global _configured
    logger = logging.getLogger(_ROOT)
    if level is None:
        from pymra_tpu.utils.config import flag

        level = flag("PYMRA_LOG_LEVEL")
    logger.setLevel(level)
    if not _configured:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(fmt, datefmt))
        logger.addHandler(handler)
        logger.propagate = False
        _configured = True
    return logger

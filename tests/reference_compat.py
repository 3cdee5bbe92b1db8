"""Harness for running the *actual reference implementation* in-process.

The reference at ``/root/reference`` (read-only) needs ``numpy_indexed``,
which is absent here; this module installs a minimal semantic shim before
importing ``pyMRA`` so parity tests can compare our results against the
reference's directly. Only ``contains`` is shimmed (row-membership — the only
numpy_indexed symbol pyMRA uses, at MRANode.py:45,53,83,187,203,264,312).

Also patches ``np.NAN``/``np.float_``-era aliases removed in numpy 2.x if the
reference scripts need them.
"""
from __future__ import annotations

import os
import sys
import types

import numpy as np

from pymra_tpu.utils.config import flag as _flag

REFERENCE_ROOT = _flag("PYMRA_REFERENCE_PATH")


def _contains(candidates, values):
    """bool array: for each row of ``values``, is it a row of ``candidates``?

    Semantic equivalent of ``numpy_indexed.contains`` for 1-D and 2-D float
    arrays (all pyMRA call sites).
    """
    cand = np.asarray(candidates)
    vals = np.asarray(values)
    if cand.ndim == 1:
        cand = cand[:, None]
    if vals.ndim == 1:
        vals = vals[:, None]
    if cand.size == 0:
        return np.zeros(len(vals), dtype=bool)
    eq = (vals[:, None, :] == cand[None, :, :]).all(-1)
    return eq.any(1)


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "pyMRA"))


def import_reference():
    """Import the reference pyMRA package with shims installed."""
    if "numpy_indexed" not in sys.modules:
        shim = types.ModuleType("numpy_indexed")
        shim.contains = _contains
        sys.modules["numpy_indexed"] = shim
    # numpy 2.x removed these aliases the 2017-era code uses
    if not hasattr(np, "NAN"):
        np.NAN = np.nan
    if not hasattr(np, "warn"):
        pass
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import matplotlib

    matplotlib.use("Agg")  # reference imports pyplot at module scope
    from pyMRA.MRATree import MRATree as RefMRATree  # noqa: F401
    from pyMRA import MRATools as ref_tools  # noqa: F401

    return RefMRATree, ref_tools

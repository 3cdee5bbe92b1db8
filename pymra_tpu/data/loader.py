"""Bundled-dataset loader.

Equivalent of the reference ``DataLoader.load_data`` (pyMRA/DataLoader.py:5-19)
with its ``include_truth=False`` NameError fixed (SURVEY quirk #2). The
bundled datasets mirror the reference's: a GRF with exponential covariance
(range 0.1) on a unit grid — ``small`` = 10x10 with ~86% observed, ``large`` =
100x100 with ~86% observed — but are simulated fresh by
:mod:`pymra_tpu.data.generate` (documented seed) rather than copied.

``source='reference'`` loads the original pyMRA ``.npy`` files when a
reference checkout is available (env ``PYMRA_REFERENCE_PATH``), which the
parity tests use for golden-number comparisons.
"""
from __future__ import annotations

import os

import numpy as np

__all__ = ["load_data", "data_dir"]


def data_dir(size: str, source: str = "bundled") -> str:
    if size not in ("small", "large"):
        raise ValueError("size has to be 'small' or 'large'")
    if source == "bundled":
        return os.path.join(os.path.dirname(os.path.abspath(__file__)), size)
    if source == "reference":
        from pymra_tpu.utils.config import flag

        root = flag("PYMRA_REFERENCE_PATH")
        path = os.path.join(root, "pyMRA", "data", size)
        if not os.path.isdir(path):
            raise FileNotFoundError(
                f"reference dataset not found at {path}; set PYMRA_REFERENCE_PATH"
            )
        return path
    raise ValueError("source must be 'bundled' or 'reference'")


def load_data(size: str = "small", include_truth: bool = False,
              source: str = "bundled"):
    """Load a bundled dataset.

    Returns ``(y, locs, y_obs)`` when ``include_truth`` else ``(locs, y_obs)``
    — same contract the reference *intends* (its no-truth path returns an
    undefined variable, DataLoader.py:19).
    """
    dirname = data_dir(size, source)
    y_obs = np.load(os.path.join(dirname, "y_obs.npy"))
    locs = np.load(os.path.join(dirname, "locs.npy"))
    if include_truth:
        y = np.load(os.path.join(dirname, "y.npy"))
        return y, locs, y_obs
    return locs, y_obs

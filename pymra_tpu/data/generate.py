"""Generate the bundled datasets (run once; outputs are committed).

Simulates GRFs with the same statistical recipe as the reference's bundled
data (exponential covariance with range 0.1 on a unit grid — the reference
CSVs are named ``Exp_Theta0.1_X{10,100}_Y{10,100}.csv``; ~86% of locations
observed, pyMRA/data/{small,large}, SURVEY §2.1 #19) but with fresh,
documented seeds — nothing is copied from the reference distribution.

Usage: ``python -m pymra_tpu.data.generate``
"""
from __future__ import annotations

import os

import numpy as np

from pymra_tpu.utils.locations import gen_locations_2d

RANGE = 0.1
ME_SD = 1e-2
FRAC_OBS = 0.86
SEED = 20260817


def _simulate(nx: int, seed: int):
    locs = gen_locations_2d(nx)
    n = len(locs)
    rng = np.random.default_rng(seed)
    d = np.sqrt(
        ((locs[:, None, :] - locs[None, :, :]) ** 2).sum(-1)
    )
    cov = np.exp(-d / RANGE)
    chol = np.linalg.cholesky(cov + 1e-10 * np.eye(n))
    y = chol @ rng.standard_normal(n)
    y_noisy = y + ME_SD * rng.standard_normal(n)
    obs_idx = rng.choice(n, size=int(round(n * FRAC_OBS)), replace=False)
    y_obs = np.full(n, np.nan)
    y_obs[obs_idx] = y_noisy[obs_idx]
    return locs, y, y_obs


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    for name, nx in [("small", 10), ("large", 100)]:
        out = os.path.join(here, name)
        os.makedirs(out, exist_ok=True)
        locs, y, y_obs = _simulate(nx, SEED + nx)
        np.save(os.path.join(out, "locs.npy"), locs)
        np.save(os.path.join(out, "y.npy"), y)
        np.save(os.path.join(out, "y_obs.npy"), y_obs)
        print(f"{name}: N={len(locs)}, observed={np.isfinite(y_obs).sum()}")


if __name__ == "__main__":
    main()

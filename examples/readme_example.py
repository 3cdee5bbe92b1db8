"""Basic MRA workflow on the bundled 2-D dataset.

TPU-native counterpart of the reference README example (README.md:20-60):
load data, build the tree, likelihood, prediction, scoring.
"""
import numpy as np

from pymra_tpu import Kernel, MRATree, load_data
from pymra_tpu.utils import logscore, rmse


def main():
    y_true, locs, y_obs = load_data("small", include_truth=True)
    tree = MRATree(locs, 4, Kernel("exponential", l=2.0), y_obs, 1e-4)

    print(f"objective (reference getLikelihood): {tree.getLikelihood():.4f}")
    print(f"marginal log-likelihood:             {tree.getLogLik():.4f}")

    mean, sd = tree.predict()
    print(f"prediction RMSE vs truth: {float(rmse(mean.ravel(), y_true)):.4f}")
    print(f"avg/min/max leaf size: {tree.avgLeafSize():.1f} / "
          f"{tree.minLeaf()} / {tree.maxLeaf()}")


if __name__ == "__main__":
    main()

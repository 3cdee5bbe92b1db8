"""pymra-tpu: a TPU-native multi-resolution Gaussian-process framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of pyMRA
(Katzfuss 2017 multi-resolution approximation): static host-side tree
planning, batched device-side level sweeps for likelihood + prediction, and a
gradient-based inference front-end (MLE, HMC, ADVI, SMC) over the
differentiable marginal likelihood, sharded across TPU meshes.

Quick start (mirrors the reference README example, README.md:20-60)::

    from pymra_tpu import Kernel, MRATree, load_data

    y, locs, y_obs = load_data("small", include_truth=True)
    tree = MRATree(locs, 4, Kernel("exponential", l=2.0), y_obs, 1e-4)
    objective = tree.getLikelihood()     # reference convention
    mean, sd = tree.predict()

New-style API::

    from pymra_tpu import MRAModel
    model = MRAModel(locs, r=4)
    loglik = model.loglik(Kernel("exponential", l=2.0), y_obs, 1e-4)
"""
from pymra_tpu import infer, kernels, parallel, utils
from pymra_tpu.data.loader import load_data
from pymra_tpu.kernels import Kernel
from pymra_tpu.tree.basis import basis_matrix
from pymra_tpu.tree.model import MRAModel, MRATree
from pymra_tpu.tree.plan import PlanConfig, TreePlan, build_plan
from pymra_tpu.tree.sweep import DevicePlan, SweepResult, make_device_plan, mra_sweep

__version__ = "0.5.0"

__all__ = [
    "Kernel",
    "kernels",
    "MRAModel",
    "MRATree",
    "build_plan",
    "TreePlan",
    "PlanConfig",
    "DevicePlan",
    "make_device_plan",
    "mra_sweep",
    "SweepResult",
    "basis_matrix",
    "load_data",
    "infer",
    "parallel",
    "utils",
    "__version__",
]

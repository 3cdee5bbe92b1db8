"""pymra-tpu: a TPU-native multi-resolution Gaussian-process framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of pyMRA
(Katzfuss 2017 multi-resolution approximation): static host-side tree
planning, batched device-side level sweeps for likelihood + prediction, and a
gradient-based inference front-end (MLE, HMC/NUTS, ADVI, SMC) over the
differentiable marginal likelihood, sharded across TPU meshes.
"""
from pymra_tpu import kernels
from pymra_tpu.kernels import Kernel

__version__ = "0.1.0"

__all__ = ["kernels", "Kernel", "__version__"]

from pymra_tpu.ops.distances import dist, sqdist

__all__ = ["dist", "sqdist"]

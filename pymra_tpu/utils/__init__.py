from pymra_tpu.utils import checkpoint, health, profiling
from pymra_tpu.utils.locations import gen_clusters, gen_locations, gen_locations_2d
from pymra_tpu.utils.logging import configure as configure_logging
from pymra_tpu.utils.logging import get_logger
from pymra_tpu.utils.profiling import PhaseTimer
from pymra_tpu.utils.scoring import kl_divergence, logscore, mse, rmse
from pymra_tpu.utils.simulate import make_observations, simulate_grf

__all__ = [
    "checkpoint",
    "health",
    "profiling",
    "PhaseTimer",
    "configure_logging",
    "get_logger",
    "gen_locations",
    "gen_locations_2d",
    "gen_clusters",
    "rmse",
    "mse",
    "kl_divergence",
    "logscore",
    "simulate_grf",
    "make_observations",
]

from pymra_tpu.utils.locations import gen_clusters, gen_locations, gen_locations_2d
from pymra_tpu.utils.scoring import kl_divergence, logscore, mse, rmse
from pymra_tpu.utils.simulate import make_observations, simulate_grf

__all__ = [
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

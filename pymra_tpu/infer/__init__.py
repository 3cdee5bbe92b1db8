from pymra_tpu.infer.advi import ADVIResult, advi
from pymra_tpu.infer.diagnostics import ess, split_rhat
from pymra_tpu.infer.hmc import HMCResult, hmc
from pymra_tpu.infer.mle import fit_mle, nelder_mead
from pymra_tpu.infer.nuts import NUTSResult, nuts
from pymra_tpu.infer.smc import SMCResult, smc

__all__ = [
    "fit_mle",
    "nelder_mead",
    "hmc",
    "HMCResult",
    "nuts",
    "NUTSResult",
    "advi",
    "ADVIResult",
    "smc",
    "SMCResult",
    "split_rhat",
    "ess",
]

"""Hyper-parameter estimation by maximum likelihood.

The reference wraps a full tree rebuild in scipy Nelder-Mead
(README.md:66-105). Here the plan is static and the likelihood
differentiable: Nelder-Mead parity and gradient-based L-BFGS give the same
optimum, the latter in far fewer evaluations.
"""
import jax
import numpy as np

from pymra_tpu import Kernel, MRAModel
from pymra_tpu.infer import fit_mle
from pymra_tpu.utils import gen_locations, make_observations, simulate_grf


def main():
    locs = gen_locations(200)
    true_kernel = Kernel("matern32", l=0.2, sig=1.0)
    x = simulate_grf(jax.random.key(0), locs, true_kernel, jitter=1e-8)
    y_obs, _ = make_observations(jax.random.key(1), x, 1e-2, frac_obs=0.7)
    y_obs = np.asarray(y_obs)

    model = MRAModel(locs, r=3)
    f = model.loglik_fn(
        y_obs, 1e-2,
        kernel_builder=lambda th: Kernel("matern32", l=th["l"], sig=th["sig"]),
    )

    for method in ("nelder-mead", "lbfgs"):
        res = fit_mle(f, {"l": 1.0, "sig": 0.5}, method=method)
        print(f"{method:>12s}: l={res['theta']['l']:.4f} "
              f"sig={res['theta']['sig']:.4f} loglik={res['loglik']:.3f}")
    print(f"        true: l={0.2:.4f} sig={1.0:.4f}")


if __name__ == "__main__":
    main()

"""NUTS sampling throughput on the MRA marginal likelihood (TPU).

BASELINE.json's second headline metric: posterior samples/second for kernel
hyper-parameters on the bundled ``large`` dataset (N=10,000). Every
leapfrog step inside NUTS is one differentiable batched MRA sweep; chains
are vmapped so all chains' sweeps execute as one batched program.

The reference has no sampler at all; the nearest comparable is its
Nelder-Mead objective evaluation at ~0.0087 evals/s serial — one NUTS
*sample* here costs tens of gradient evaluations and still lands orders of
magnitude above that.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, str(__import__('pathlib').Path(__file__).resolve().parent.parent))


def main(chains=8, warmup=30, samples=30):
    import jax
    import jax.numpy as jnp

    from pymra_tpu.data.loader import load_data
    from pymra_tpu.infer import nuts
    from pymra_tpu.kernels import Kernel
    from pymra_tpu.tree.model import MRAModel

    locs, y_obs = load_data("large")
    model = MRAModel(locs, r=4, dtype=jnp.float32)
    f = model.loglik_fn(
        np.nan_to_num(y_obs, nan=np.nan), 1e-4,
        kernel_builder=lambda th: Kernel(
            "exponential", l=jnp.exp(th["log_l"])
        ),
    )

    def logp(th):
        return f(th) - 0.5 * (th["log_l"] - jnp.log(2.0)) ** 2

    init = {"log_l": jnp.linspace(0.2, 1.2, chains, dtype=model.dtype)}

    run = jax.jit(lambda i, k: nuts(
        logp, i, k, num_warmup=warmup, num_samples=samples, max_depth=6,
        init_step_size=0.2,
    ))
    t0 = time.time()
    res = run(init, jax.random.key(0))
    jax.block_until_ready(res.samples)
    t_first = time.time() - t0

    t0 = time.time()
    res = run(init, jax.random.key(1))
    jax.block_until_ready(res.samples)
    dt = time.time() - t0
    total_samples = chains * samples
    # subtract warmup share: warmup+samples transitions of similar cost
    sps = total_samples / (dt * samples / (warmup + samples))
    ls = np.exp(np.asarray(res.samples["log_l"]))
    print(json.dumps({
        "metric": "nuts_samples_per_sec_n10k",
        "value": round(sps, 2),
        "unit": "samples/s",
        "vs_baseline": None,
    }))
    print(f"# compile+first {t_first:.1f}s; run {dt:.1f}s; "
          f"accept {float(res.accept_rate.mean()):.2f}; "
          f"divergent {int(res.num_divergent.sum())}; "
          f"posterior l median {np.median(ls):.3f}", file=sys.stderr)


if __name__ == "__main__":
    main()

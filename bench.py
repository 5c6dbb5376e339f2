"""Benchmark: dopri5 sample-NFE/sec/chip on the CIFAR-10 flagship model.

The driver's north-star metric (BASELINE.json): number of ODE right-hand-side
evaluations per second per chip — each NFE is one full RHS on one sample
(4 matmuls + exp barrier + 30-iteration QP bisection), the inner loop of both
inference and attack evaluation.  We time the full jitted forward solve
(KWLarge Cayley backbone + adaptive dopri5 at rtol=atol=1e-3, the reference
protocol from README.md:27 / pl_modules.py:18-35) on synthetic CIFAR-shaped
batches and report NFE * batch / seconds.

``vs_baseline`` compares against an ANALYTIC estimate of the PyTorch/GPU
reference implementation's throughput for the same computation
(REF_SAMPLE_NFE_PER_SEC below): the reference executes the RHS as a stream
of ~40+ small CUDA kernels per evaluation (barrier_projection.py:241-255 is a
30-iteration Python loop of elementwise kernels), making it
kernel-launch-latency bound at roughly 150k sample-NFE/s on a V100-class
GPU.  The repository publishes no measured numbers (BASELINE.md), so this
constant is the documented stand-in until a measured GPU run replaces it.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import numpy as np

REF_SAMPLE_NFE_PER_SEC = 150_000.0
BATCH = 256
N_ITERS = 10


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship

    model = _flagship()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (BATCH, 3, 32, 32)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def solve(params, x):
        sol = model.solve(params, x, mode="while")
        return sol.ys[-1], sol.nfe

    # warmup / compile
    probs, nfe = solve(params, x)
    probs.block_until_ready()
    nfe_per_solve = int(nfe)

    t0 = time.time()
    total_nfe = 0
    for _ in range(N_ITERS):
        probs, nfe = solve(params, x)
        total_nfe += int(nfe)
    probs.block_until_ready()
    dt = time.time() - t0

    sample_nfe_per_sec = total_nfe * BATCH / dt
    print(
        json.dumps(
            {
                "metric": "dopri5_sample_nfe_per_sec_per_chip",
                "value": round(sample_nfe_per_sec, 1),
                "unit": "RHS evals * samples / sec",
                "vs_baseline": round(
                    sample_nfe_per_sec / REF_SAMPLE_NFE_PER_SEC, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()

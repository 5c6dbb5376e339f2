"""Benchmark: dopri5 sample-NFE/sec/chip on the CIFAR-10 flagship model.

The driver's north-star metric (BASELINE.json): ODE right-hand-side
evaluations x samples per second per chip — each NFE is one full RHS on one
sample (4 matmuls + exp barrier + 30-iteration QP bisection), the inner loop
of inference, attack evaluation and Lipschitz certification.  The full
forward solve (KWLarge Cayley backbone + adaptive dopri5 at rtol=atol=1e-3,
the reference protocol from README.md:27 / pl_modules.py:18-35) is timed
end to end.

Measurement methodology (this environment reaches the TPU through a relay
with ~30ms per-execution latency and sporadic multi-minute stalls):
  * N_INNER independent solves run inside ONE jitted call (fori_loop), each
    on a perturbed batch, with a single device->host sync per call;
  * the bounded-scan integrator is used (fixed trip count) — data-dependent
    while_loop predicates cost a host round trip per iteration through the
    relay;
  * best-of-N_OUTER timing discards relay stalls.

``vs_baseline`` compares against an ANALYTIC estimate of the PyTorch/GPU
reference's throughput for the same computation (REF_SAMPLE_NFE_PER_SEC):
the reference executes each RHS as a stream of ~40+ small CUDA kernels
(barrier_projection.py:241-255 is a 30-iteration Python loop of elementwise
kernels), making it kernel-launch-latency bound at roughly 150k
sample-NFE/s on a V100-class GPU.  The repo publishes no measured numbers
(BASELINE.md), so this constant is the documented stand-in until a measured
GPU run replaces it.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import dataclasses
import json
import time

import numpy as np

REF_SAMPLE_NFE_PER_SEC = 150_000.0
# 32k saturates the MXU on the DFT-matmul Cayley backbone (measured +9% over
# 8k on v5e); 48k+ overflows HBM with the (F, batch, ci) Fourier activations.
BATCH = 32768
N_INNER = 6  # solves per jitted call
N_OUTER = 4  # timed calls; best one reported
MAX_STEPS = 16  # bounded-scan step budget (solves need ~6 at tol 1e-3)


def main():
    """Stall-resilient driver (shared scheme, see _bench_common.py)."""
    from _bench_common import stall_resilient_main

    stall_resilient_main(_bench, "bench")


def _bench():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship

    model = dataclasses.replace(_flagship(), max_steps=MAX_STEPS)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (BATCH, 3, 32, 32)).astype(np.float32))
    # init must be jitted: unjitted flax init dispatches hundreds of eager
    # ops at ~100ms each over the relay
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x[:8])

    @jax.jit
    def many_solves(params, x):
        def body(i, carry):
            nfe_total, acc = carry
            xi = x + (i.astype(jnp.float32) * 1e-5)  # defeat CSE across iters
            sol = model.solve(params, xi, mode="scan", fused=False)
            return nfe_total + sol.nfe, acc + sol.ys[-1]

        return jax.lax.fori_loop(
            0, N_INNER, body,
            (jnp.zeros((), jnp.int32), jnp.zeros((BATCH, 10))),
        )

    nfe, acc = many_solves(params, x)  # compile + warmup
    acc.block_until_ready()

    best = None
    for _ in range(N_OUTER):
        t0 = time.time()
        nfe, acc = many_solves(params, x)
        n = int(nfe)  # forces a real sync
        dt = time.time() - t0
        rate = n * BATCH / dt
        best = rate if best is None else max(best, rate)

    print(
        json.dumps(
            {
                "metric": "dopri5_sample_nfe_per_sec_per_chip",
                "value": round(best, 1),
                "unit": "RHS evals * samples / sec",
                "vs_baseline": round(best / REF_SAMPLE_NFE_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

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

Roofline grounding: the compiled program's own XLA cost analysis (logical
flops + bytes accessed of the optimized HLO) is divided by the measured
wall time and by the v5e chip peaks (197 bf16 TFLOP/s MXU, 819 GB/s HBM),
so ``pct_peak_bf16_mxu`` / ``pct_peak_hbm`` say how far from the hardware
walls the run sits and ``bound`` names the nearer wall ("latency/vpu" when
neither is within 20%: the ODE portion is a chain of tiny (B,10)x(10,128)
matmuls and a 30-iteration elementwise QP bisection — VPU/latency work the
MXU roofline cannot see).  Flops here are XLA's logical count: fp32
matmuls lowered to 3/6-pass bf16 do proportionally more MXU work than
counted (this bench's hot path is bf16-or-default precision, so no
adjustment applies).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...roofline keys}.
"""
from __future__ import annotations

import dataclasses
import json
import time

import numpy as np

def _qp_method():
    from fiode_tpu.ops.simplex_qp import qp_method_from_env
    return qp_method_from_env()

REF_SAMPLE_NFE_PER_SEC = 150_000.0
# v5e single-chip peaks (public spec): 197 TFLOP/s bf16 MXU, 819 GB/s HBM
V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_HBM_BYTES = 819e9


def roofline(compiled, dt: float) -> dict:
    """Roofline keys from a compiled program's XLA cost analysis.

    ``compiled`` is a jax AOT Compiled object; ``dt`` the measured seconds
    for one execution of it.  Returns {} when the backend does not expose
    cost analysis (the axon relay occasionally does not).
    """
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca["flops"])
        bytes_ = float(ca.get("bytes accessed", 0.0))
    except Exception:
        return {}
    pf = flops / dt / V5E_PEAK_BF16_FLOPS
    ph = (bytes_ / dt / V5E_PEAK_HBM_BYTES) if bytes_ else 0.0
    bound = (
        "mxu" if pf >= max(ph, 0.2)
        else "hbm" if ph >= 0.2
        else "latency/vpu"
    )
    out = {
        "program_tflops": round(flops / 1e12, 3),
        "achieved_tflops_per_s": round(flops / dt / 1e12, 3),
        "pct_peak_bf16_mxu": round(100 * pf, 2),
        "bound": bound,
    }
    if bytes_:
        out["program_gbytes"] = round(bytes_ / 1e9, 3)
        out["achieved_hbm_gb_per_s"] = round(bytes_ / dt / 1e9, 1)
        out["pct_peak_hbm"] = round(100 * ph, 2)
    return out
# 32k saturates the MXU on the DFT-matmul Cayley backbone (measured +9% over
# 8k on v5e); 48k+ overflows HBM with the (F, batch, ci) Fourier activations.
BATCH = 32768
N_INNER = 6  # solves per jitted call
N_OUTER = 4  # timed calls; best one reported
# Bounded-scan step budget.  The scan integrator executes EVERY trip's
# full RK step (6 RHS evals) and masks the state update once t reaches
# t_final, so budget trips beyond the solve's real attempt count are pure
# device waste the NFE metric never credits.  Measured: these solves take
# 5 accepted + 0 rejected attempts at tol 1e-3 (batch-global RMS
# control), so 8 leaves 3 spare attempts; the run ASSERTS completion
# (max attempts < MAX_STEPS) and fails loudly rather than silently
# truncating if the dynamics ever get stiffer.
MAX_STEPS = 8


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

    def make_many_solves(k):
        def many_solves(params, x):
            def body(i, carry):
                nfe_total, acc, att = carry
                # defeat CSE across iters
                xi = x + (i.astype(jnp.float32) * 1e-5)
                sol = model.solve(params, xi, mode="scan", fused=False)
                att = jnp.maximum(att, sol.n_accepted + sol.n_rejected)
                return nfe_total + sol.nfe, acc + sol.ys[-1], att

            return jax.lax.fori_loop(
                0, k, body,
                (jnp.zeros((), jnp.int32), jnp.zeros((BATCH, 10)),
                 jnp.zeros((), jnp.int32)),
            )

        return many_solves

    def timed(compiled, n_outer):
        """(best sample-NFE/s, its dt, NFE count) over n_outer calls."""
        best = best_dt = n = None
        for _ in range(n_outer):
            t0 = time.time()
            nfe, acc, att = compiled(params, x)
            n = int(nfe)  # forces a real sync through the relay
            dt = time.time() - t0
            # completion check: a solve that exhausts the trip budget may
            # have been truncated mid-integration — fail the bench rather
            # than report throughput for an unfinished solve
            assert int(att) < MAX_STEPS, (
                f"solver hit the MAX_STEPS={MAX_STEPS} trip budget "
                f"(attempts={int(att)}); raise MAX_STEPS"
            )
            rate = n * BATCH / dt
            if best is None or rate > best:
                best, best_dt = rate, dt
        return best, best_dt, n

    # AOT-compile so the same executable serves timing AND cost analysis
    compiled = jax.jit(make_many_solves(N_INNER)).lower(params, x).compile()
    nfe, acc, _ = compiled(params, x)  # warmup
    acc.block_until_ready()
    best, best_dt, n = timed(compiled, N_OUTER)

    # Dispatch-vs-device decomposition (two-point fit): time the SAME
    # program at K=1 solve per call; dt(K) = a + b*K gives the per-call
    # relay/dispatch overhead a and the pure device time b per solve.
    # device_busy_frac says how much of the metric's wall time the chip is
    # actually working — the measured answer to whether the next speedup
    # comes from fusing more work per call (a dominates) or from the
    # VPU-bound RHS itself (b dominates).
    compiled1 = jax.jit(make_many_solves(1)).lower(params, x).compile()
    compiled1(params, x)[1].block_until_ready()  # warmup
    _, dt1, _ = timed(compiled1, N_OUTER)
    a = max(0.0, (N_INNER * dt1 - best_dt) / (N_INNER - 1))
    dispatch = {
        "dispatch_ms_per_call": round(1e3 * a, 1),
        "device_busy_frac": round((best_dt - a) / best_dt, 3),
    }

    extra = roofline(compiled, best_dt)
    if "program_tflops" in extra:
        # whole-program flops (N_INNER solves: KWLarge backbone + scan'd
        # RHS evals) amortized over the sample-NFEs the metric counts
        extra["flops_per_sample_nfe"] = round(
            extra["program_tflops"] * 1e12 / (n * BATCH), 1
        )
    print(
        json.dumps(
            {
                "metric": "dopri5_sample_nfe_per_sec_per_chip",
                "value": round(best, 1),
                "unit": "RHS evals * samples / sec",
                "vs_baseline": round(best / REF_SAMPLE_NFE_PER_SEC, 3),
                "qp_method": _qp_method(),
                **dispatch,
                **extra,
            }
        )
    )


if __name__ == "__main__":
    main()

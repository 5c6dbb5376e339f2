"""Dispatch-vs-device decomposition of the ODE bench (K-solves sweep).

Answers the question the headline bench (bench.py) cannot: is the
4.6M-sample-NFE/s plateau a relay-dispatch floor or the device itself?
Compiles the SAME program as bench.py at K solves per jitted call for
K in --ks, times each (best-of-N to discard relay stalls), and fits
``dt(K) = a + b*K`` by least squares:

  * ``a``  = per-call overhead (relay dispatch + host sync), ms;
  * ``b``  = pure device seconds per solve;
  * ``device_busy_frac(K)`` = b*K / (a + b*K) — the fraction of wall time
    the chip is working at the bench's operating point.

If ``device_busy_frac`` at the bench's K is near 1, the metric is
device-bound and further gains must come from the RHS itself (it is
VPU-bound: 30-iteration QP bisection + exp barrier, ~1.6% MXU — see
BENCH_r04 roofline); if it is well below 1, raising K moves the metric.

Writes ``run_data/BENCH_dispatch_sweep.json`` and prints one JSON line.
Grounds the BASELINE.md north-star discussion in measurement (PARITY.md
"Roofline position" previously *estimated* ~8x HBM headroom "if dispatch
were free" without splitting the two).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import time

import numpy as np

from bench import BATCH, MAX_STEPS, N_INNER


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", default="1,4,16,64",
                    help="comma-separated solves-per-jitted-call points")
    ap.add_argument("--outer", type=int, default=4,
                    help="timed calls per K; best (min dt) kept")
    ap.add_argument("--out", default="run_data/BENCH_dispatch_sweep.json")
    args = ap.parse_args()
    ks = sorted({int(s) for s in args.ks.split(",") if s.strip()})

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship

    model = dataclasses.replace(_flagship(), max_steps=MAX_STEPS)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (BATCH, 3, 32, 32)).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x[:8])

    def make_many_solves(k):
        def many_solves(params, x):
            def body(i, carry):
                nfe_total, acc = carry
                xi = x + (i.astype(jnp.float32) * 1e-5)
                sol = model.solve(params, xi, mode="scan", fused=False)
                return nfe_total + sol.nfe, acc + sol.ys[-1]

            return jax.lax.fori_loop(
                0, k, body,
                (jnp.zeros((), jnp.int32), jnp.zeros((BATCH, 10))),
            )

        return many_solves

    points = []
    for k in ks:
        compiled = jax.jit(make_many_solves(k)).lower(params, x).compile()
        compiled(params, x)[1].block_until_ready()  # warmup
        best_dt = nfe = None
        for _ in range(args.outer):
            t0 = time.time()
            out = compiled(params, x)
            nfe = int(out[0])  # real sync through the relay
            dt = time.time() - t0
            if best_dt is None or dt < best_dt:
                best_dt = dt
        rate = nfe * BATCH / best_dt
        points.append({"k": k, "dt_s": round(best_dt, 4), "nfe": nfe,
                       "sample_nfe_per_sec": round(rate, 1)})
        print(f"[sweep] K={k}: dt={best_dt:.3f}s nfe={nfe} "
              f"rate={rate/1e6:.2f}M/s", flush=True)

    # least-squares dt = a + b*K
    karr = np.array([p["k"] for p in points], float)
    darr = np.array([p["dt_s"] for p in points], float)
    b_fit, a_fit = np.polyfit(karr, darr, 1)
    a_fit = max(0.0, float(a_fit))
    busy_at_bench = float(b_fit * N_INNER / (a_fit + b_fit * N_INNER))
    out = {
        "metric": "ode_bench_dispatch_decomposition",
        "batch": BATCH,
        "points": points,
        "dispatch_ms_per_call": round(1e3 * a_fit, 1),
        "device_s_per_solve": round(float(b_fit), 4),
        "bench_k": N_INNER,
        "device_busy_frac_at_bench_k": round(busy_at_bench, 3),
        "sample_nfe_per_sec_if_dispatch_free": round(
            points[-1]["nfe"] / points[-1]["k"] * BATCH / float(b_fit), 1
        ),
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "points"}))


if __name__ == "__main__":
    main()

"""Probe: alpha-CROWN per-cell efficacy on collect_cap/frontier_cap images.

For representative images from the BaB pass-3 gave-up tiers, sweep the
full grid with plain CROWN, count violated cells, then re-bound a random
sample of the violated cells under alpha-CROWN at several iteration
counts — reporting the fraction closed and the value-quantile shift.

Measured result (run_data/certified_full/alpha_probe.json, round 4):
alpha-CROWN with the width-surrogate objective closes <= 0.25% of
violated cells on every probed image and moves the p50/p90/p99 bound
values by < 0.5% — the violated-cell slack on this model is NOT ReLU
relaxation looseness (the dynamics twin is nearly linear over these tiny
boxes), so slope optimization has nothing to tighten; the slack lives in
the QP/sigmoid interval steps and the worst-case runner reduction.  This
is the evidence for keeping ``alpha_iters=0`` in the refinement passes
and attacking the tail with the Lipschitz local refinement instead
(examples/refine_lips_workflow.py).
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax.numpy as jnp

from fiode_tpu.experiment import _load_cfg_dataset, _restore_params, build_model
from fiode_tpu.utils.config import compose
from fiode_tpu.verify.certify import Certifier
from fiode_tpu.verify import refine as R

IMAGES = [11, 24, 37, 47, 115]  # collect_cap x2, frontier_cap x2, box-blowup
SAMPLE = 65536
ITERS = [2, 4, 8]

run_dir = Path(__file__).resolve().parents[1] / "run_data/certified_full"
cfg = compose("cifar_certify.yaml", [], "configs/certify")
model = build_model(cfg)
params = _restore_params(cfg, model, str(run_dir))
ds = _load_cfg_dataset(cfg)
cert = Certifier(
    model, params, T=int(cfg.get("T", 40)),
    eps_input=float(cfg.get("eps", 36 / 255)),
    scale_nominal=bool(cfg["module"]["dynamics"]["scale_nominal"]),
)
n = cert.n
chunk, superchunk = 8192, 16
block_cells = chunk * superchunk

sweep_fn, _, place_rows, _ = R._kernels(cert, alpha_iters=0)
alpha_steps = {k: R._kernels(cert, alpha_iters=k)[1] for k in ITERS}

imgs = np.asarray([i for i in IMAGES])
feats = np.asarray(cert._features(cert.params, jnp.asarray(ds.test_x[imgs])))
x_biases = feats @ np.asarray(cert.U).T + np.asarray(cert.bU)
grid = cert.grid
rng = np.random.default_rng(0)
out = []
for k, img in enumerate(imgs):
    label = int(ds.test_y[img])
    perm = np.arange(n)
    perm[0], perm[label] = label, 0
    xb = jnp.asarray(x_biases[k])
    t0 = time.time()
    viol = []
    vals_all = []
    for i in range(0, len(grid), block_cells):
        block = grid[i : i + block_cells]
        nb = len(block)
        if nb < block_cells:
            block = np.concatenate(
                [block, np.zeros((block_cells - nb, n), np.float32)]
            )
        pblock = block[:, perm]
        vals = np.asarray(
            sweep_fn(
                place_rows(jnp.asarray(pblock.reshape(superchunk, chunk, n)), 1),
                xb, label,
            )
        ).reshape(-1)[:nb]
        bad = np.nonzero(~(vals <= 0.0))[0]
        if len(bad):
            viol.append(pblock[bad])
            vals_all.append(vals[bad])
    sweep_s = time.time() - t0
    centers = np.concatenate(viol) if viol else np.zeros((0, n), np.float32)
    vvals = np.concatenate(vals_all) if vals_all else np.zeros((0,))
    rec = {
        "image": int(img), "plain_violated": int(len(centers)),
        "sweep_s": round(sweep_s, 1),
        "plain_val_q": [round(float(q), 4) for q in
                        np.percentile(vvals, [50, 90, 99])] if len(vvals) else [],
    }
    if len(centers):
        sel = rng.choice(len(centers), min(SAMPLE, len(centers)), replace=False)
        sample = centers[sel]
        es = np.full_like(sample, cert.eps)
        for it in ITERS:
            t0 = time.time()
            avals, _ = R._chunked(
                alpha_steps[it], sample, es,
                [((), np.float32), ((), np.int32)],
                chunk=chunk, n=n, eps0=cert.eps, x_bias=xb, label=label,
                place_rows=place_rows, superchunk=superchunk,
            )
            dt = time.time() - t0
            closed = float((avals <= 0.0).mean())
            rec[f"alpha{it}_closed_frac"] = round(closed, 4)
            rec[f"alpha{it}_cells_per_s"] = round(len(sample) / dt, 1)
            rec[f"alpha{it}_val_q"] = [round(float(q), 4) for q in
                                       np.percentile(avals, [50, 90, 99])]
    out.append(rec)
    print(json.dumps(rec), flush=True)

(run_dir / "alpha_probe.json").write_text(
    json.dumps(out, indent=1)
)
print("done")

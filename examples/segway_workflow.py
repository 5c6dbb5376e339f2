"""Segway safe-controller workflow at the reference protocol scale:
LQR fit (300 iters) -> barrier adversarial training (300 iters, LinfPGD
eps=0.02) -> CROWN+interval certification over the r=0.01 grid in the
inflated Lyapunov band -> closed-loop trajectory check.

(reference: control/train_segway.py + control/certify_segway.py,
README.md:57-65.)  Writes results to <out>/SEGWAY_RESULTS.json.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="run_data/segway")
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--r", type=float, default=0.01)
    ap.add_argument("--margin", type=float, default=0.01)
    args = ap.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    from fiode_tpu.control.certify_segway import certify_segway
    from fiode_tpu.control.train_segway import SegwayTrainConfig, train_segway

    t0 = time.time()
    cfg = SegwayTrainConfig(
        adv_train=True, fit_lqr_iters=args.iters, barrier_iters=args.iters,
        margin=args.margin,
    )
    model = train_segway(cfg, save_path=str(out / "segway.pkl"))
    train_s = time.time() - t0

    t0 = time.time()
    res = certify_segway(str(out / "segway.pkl"), r=args.r,
                         plot_dir=str(out))
    certify_s = time.time() - t0

    results = {
        "train_seconds": train_s,
        "best_barrier_loss": model["best_loss"],
        "certify_seconds": certify_s,
        "n_cells": res.n_cells,
        "vdot_ub_max": res.ub_max,
        "vdot_exact_max": res.exact_vdot_max,
        "certified": bool(res.certified),
        "level_band": [res.level_lb, res.level_ub],
        "traj_max_level_drift": res.traj_max_level_drift,
    }
    (out / "SEGWAY_RESULTS.json").write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2), flush=True)


if __name__ == "__main__":
    main()

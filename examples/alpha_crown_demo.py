"""alpha-CROWN refinement demo: re-certify the images plain CROWN fails.

Loads the committed full-protocol checkpoint, runs the plain-CROWN sweep
over a test-index range to find uncertified images, then re-certifies
exactly those with ``alpha_iters`` slope-optimization steps
(verify/crown.optimize_crown_alphas).  Plain CROWN is the reference's
method (certify_crown.py, auto_LiRPA method='CROWN'); the refinement is
capability beyond it (auto_LiRPA calls it 'CROWN-Optimized').

Writes <run-dir>/ALPHA_CROWN.json.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-dir", default="run_data/certified_full")
    ap.add_argument("--start", type=int, default=20)
    ap.add_argument("--end", type=int, default=100)
    ap.add_argument("--T", type=int, default=40)
    ap.add_argument("--alpha-iters", type=int, default=3)
    ap.add_argument("--alpha-objective", default="vdot",
                    choices=["vdot", "width"],
                    help="'width' optimizes slopes against the smooth "
                    "pre-QP bound width (cheap gradient, no bisection in "
                    "the differentiated graph)")
    args = ap.parse_args()

    import numpy as np

    from fiode_tpu.experiment import (
        _load_cfg_dataset, _restore_params, build_model,
    )
    from fiode_tpu.utils.config import compose
    from fiode_tpu.verify.certify import Certifier
    from fiode_tpu.verify.grid import enumerate_decision_boundary

    run_dir = Path(args.run_dir)
    cfg = compose(
        "cifar_train.yaml",
        ["++module.init_fun.param_map.out_dim=10"],
        "configs/classification",
    )
    # model + dataset only: a full trainer would build optimizers and a
    # MetricWriter that appends into the trained run dir as a side effect
    # of this read-only demo
    model = build_model(cfg)
    ds = _load_cfg_dataset(cfg)
    params = _restore_params(cfg, model, str(run_dir))
    xs = ds.test_x[args.start : args.end]
    ys = ds.test_y[args.start : args.end]
    grid = enumerate_decision_boundary(10, args.T)

    # the restored checkpoint trained 300 epochs with scale_nominal off at
    # epoch 10 — the default scale_nominal=False matches the trained field
    plain = Certifier(model, params, T=args.T, eps_input=36 / 255,
                      chunk=4096, grid=grid)
    t0 = time.time()
    res_p = plain.certify(xs, ys, method="crown", early_exit=False,
                          progress_every=100)
    t_plain = time.time() - t0
    fail = np.nonzero(res_p.clean & ~res_p.certified)[0]
    print(f"[alpha-demo] plain CROWN: {res_p.certified.sum()}/{len(xs)} "
          f"certified ({res_p.cells_per_sec:,.0f} cells/s); "
          f"{len(fail)} clean-but-uncertified", flush=True)

    out = {
        "index_range": [args.start, args.end],
        "plain_certified": int(res_p.certified.sum()),
        "n_images": len(xs),
        "plain_seconds": t_plain,
        "plain_cells_per_sec": res_p.cells_per_sec,
        "failing_idx": (fail + args.start).tolist(),
        "alpha_iters": args.alpha_iters,
        "alpha_objective": args.alpha_objective,
    }
    if len(fail):
        alpha = Certifier(model, params, T=args.T, eps_input=36 / 255,
                          chunk=4096, grid=grid,
                          alpha_iters=args.alpha_iters,
                          alpha_objective=args.alpha_objective)
        t0 = time.time()
        res_a = alpha.certify(xs[fail], ys[fail], method="crown",
                              early_exit=False, progress_every=100)
        out["alpha_seconds"] = time.time() - t0
        out["alpha_recovered"] = int(res_a.certified.sum())
        out["alpha_cells_per_sec"] = res_a.cells_per_sec
        total = int(res_p.certified.sum() + res_a.certified.sum())
        out["combined_certified"] = total
        print(f"[alpha-demo] alpha-CROWN recovers "
              f"{res_a.certified.sum()}/{len(fail)} failed images -> "
              f"{total}/{len(xs)} certified total "
              f"({res_a.cells_per_sec:,.0f} cells/s)", flush=True)

    (run_dir / "ALPHA_CROWN.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()

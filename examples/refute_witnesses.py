"""Exact-witness audit of the BaB-open images.

For every image the refinement campaign left open, sweep the full grid
with the EXACT Vdot evaluator (the larger-T certificate's quantity,
certify_lipschitz.py:131,142-143) and record the maximising lattice point.

The verdict splits the open set in two:

- ``refuted`` (witness value > 0): the lattice point is the center of its
  cell's box, so EVERY sound upper bound over any box containing it —
  plain/alpha CROWN, every BaB sub-box chain — is >= the exact value > 0.
  No sound box method can certify the image at this (T, eps, kappa)
  protocol; further BaB on it is provably wasted work.
- ``tractable`` (witness value < 0): the exact margin ``-value`` is how
  much bound slack refinement must close; with the local Lipschitz bound
  Lf = sqrt(2) * Lf_eta(eta_ub) the required box half-width is
  ~ margin / Lf — a principled per-image difficulty estimate for
  scheduling the remaining passes.

Usage:
  python examples/refute_witnesses.py [--run-dir run_data/certified_full]
      [--images 11,24,...]           # default: open set from accounting
      [--out exact_witnesses.json]
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-dir", default="run_data/certified_full")
    ap.add_argument("--config-name", default="cifar_certify.yaml")
    ap.add_argument("--accounting", default="refine_accounting.json")
    ap.add_argument("--images", default=None,
                    help="comma-separated test indices (default: the "
                    "accounting's open_images)")
    ap.add_argument("--out", default="exact_witnesses.json")
    args = ap.parse_args()

    from fiode_tpu.experiment import (
        _load_cfg_dataset,
        _restore_params,
        build_model,
    )
    from fiode_tpu.utils.config import compose
    from fiode_tpu.verify.certify import Certifier

    run_dir = Path(args.run_dir)
    if args.images is not None:
        imgs = sorted({int(s) for s in args.images.split(",") if s.strip()})
    else:
        acct = json.loads((run_dir / args.accounting).read_text())
        imgs = sorted(acct["open_images"])
    if not imgs:
        raise SystemExit("no open images to audit")

    cfg = compose(args.config_name, [], "configs/certify")
    model = build_model(cfg)
    params = _restore_params(cfg, model, str(run_dir))
    ds = _load_cfg_dataset(cfg)

    cert = Certifier(
        model, params, T=int(cfg.get("T", 40)),
        eps_input=float(cfg.get("eps", 36 / 255)),
        scale_nominal=bool(cfg["module"]["dynamics"]["scale_nominal"]),
    )
    if cert.kappa_lips != cert.kappa:
        raise SystemExit(
            "kappa_lips != kappa (scale_nominal certifier): the witness "
            "quantity would not refute the CROWN certificate — aborting"
        )
    x = ds.test_x[imgs]
    y = ds.test_y[imgs]
    print(f"witness sweep over {len(imgs)} images, "
          f"{len(cert.grid):,} cells each "
          f"(T={cert.T}, kappa={cert.kappa:.6f}, "
          f"precision={cert.matmul_precision})", flush=True)
    t0 = time.time()
    vals, idxs, clean = cert.exact_witness(x, y)
    dt = time.time() - t0

    # local Lipschitz constant of Vdot in eta at the witness (the lips
    # certificate's slack rate, certify_lipschitz.py:120-124): required
    # half-width for a box around a margin-m point ~ m / (sqrt(2)*Lf_eta)
    records = []
    for k, img in enumerate(imgs):
        label = int(y[k])
        perm = np.arange(cert.n)
        perm[0], perm[label] = label, 0
        cell_raw = cert.grid[int(idxs[k])]
        cell_label_space = cell_raw[perm]
        eta_ub = float(cell_label_space.max()) + cert.eps
        lf_eta = (np.sqrt(cert.n) * cert.sigma_1 * cert.alpha_1
                  * np.exp(cert.sigma_1 * eta_ub) + 1.0)
        margin = -float(vals[k])
        records.append({
            "image": int(img),
            "label": label,
            "clean": bool(clean[k]),
            "witness_value": float(vals[k]),
            "verdict": "refuted" if vals[k] > 0 else "tractable",
            "witness_cell_idx": int(idxs[k]),
            "witness_cell_label_space":
                [float(v) for v in cell_label_space],
            "exact_margin": margin,
            "required_half_width_est":
                margin / float(np.sqrt(2.0) * lf_eta) if margin > 0 else 0.0,
        })
    refuted = [r["image"] for r in records if r["verdict"] == "refuted"]
    tractable = [r["image"] for r in records if r["verdict"] == "tractable"]
    out = {
        "n_images": len(imgs),
        "T": cert.T,
        "kappa": cert.kappa,
        "matmul_precision": cert.matmul_precision,
        "cells_per_image": len(cert.grid),
        "seconds": dt,
        "refuted": refuted,
        "tractable": tractable,
        "witnesses": records,
    }
    (run_dir / args.out).write_text(json.dumps(out, indent=1) + "\n")
    print(f"refuted {len(refuted)}: {refuted}", flush=True)
    print(f"tractable {len(tractable)}: {tractable}", flush=True)
    for r in sorted(records, key=lambda r: r["witness_value"]):
        print(f"  img {r['image']:3d} {r['verdict']:9s} "
              f"witness {r['witness_value']:+.5f} "
              f"req_halfwidth~{r['required_half_width_est']:.2e}",
              flush=True)
    print(f"-> {run_dir / args.out} ({dt:.0f}s)", flush=True)


if __name__ == "__main__":
    main()

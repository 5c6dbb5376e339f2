"""Full-grid HYBRID sweep: every cell under min(CROWN, exact+Lipschitz).

Runs ``verify.refine.hybrid_base_sweep`` — the package's strongest
single-pass (no branch-and-bound) certificate — over a completed CROWN
sweep's run directory and streams one verdict per image.

Because the hybrid cell bound is the pointwise MIN of two individually
sound bounds, the hybrid sweep dominates both base certificates: every
image in the committed CROWN sweep's ``certified_idx`` is hybrid-certified
a fortiori, so the default image set is exactly the CROWN sweep's
UNcertified clean images (pass ``--images`` to override, e.g. to
re-measure a certified image).  The final JSON therefore reports
``certified_total = |CROWN certified| + |newly hybrid-certified|`` with
both components listed.

Resumable: per-image records append to ``<out-stem>_stream.jsonl``; a
sweep verdict is deterministic for fixed (T, eps, kappa, precision), so
re-running skips every streamed image (no budget stamping needed — there
are no budgets).

Usage:
  python examples/hybrid_sweep.py [--run-dir run_data/certified_full]
      [--summary certify_stream_full.summary.json] [--end 512]
      [--out hybrid_sweep.json] [--images 11,74,...]
"""
import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-dir", default="run_data/certified_full")
    ap.add_argument("--summary", default="certify_stream_full.summary.json")
    ap.add_argument("--config-name", default="cifar_certify.yaml")
    ap.add_argument("--config-dir", default="configs/certify")
    ap.add_argument("overrides", nargs="*",
                    help="hydra-style ++key=value overrides (e.g. ++T=6)")
    ap.add_argument("--end", type=int, default=512)
    ap.add_argument("--images", default=None,
                    help="comma-separated test indices to sweep (default: "
                    "the summary's clean-but-uncertified images)")
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--superchunk", type=int, default=16)
    ap.add_argument("--out", default="hybrid_sweep.json")
    args = ap.parse_args()

    from fiode_tpu.experiment import (
        _load_cfg_dataset,
        _restore_params,
        build_model,
    )
    from fiode_tpu.utils.config import compose
    from fiode_tpu.verify.certify import Certifier
    from fiode_tpu.verify.refine import hybrid_base_sweep

    run_dir = Path(args.run_dir)
    summary = json.loads((run_dir / args.summary).read_text())
    idx_min = int(summary.get("index_min", summary.get("start_ind", 0)))
    idx_max = int(summary.get(
        "index_max", idx_min + int(summary["n_images"]) - 1
    ))
    if idx_min != 0:
        raise SystemExit("summary must cover indices from 0 (see "
                         "refine_workflow.py for the rationale)")
    cfg = compose(args.config_name, args.overrides, args.config_dir)
    model = build_model(cfg)
    params = _restore_params(cfg, model, str(run_dir))
    ds = _load_cfg_dataset(cfg)
    end = min(args.end, idx_max + 1, len(ds.test_x))

    crown_certified = np.zeros(end, bool)
    crown_certified[[i for i in summary["certified_idx"] if i < end]] = True

    # resume: streamed verdicts are final (deterministic sweep)
    stream_path = run_dir / (Path(args.out).stem + "_stream.jsonl")
    streamed = {}
    if stream_path.exists():
        for ln, line in enumerate(stream_path.read_text().splitlines(), 1):
            if not line.strip():
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                print(f"warning: {stream_path}:{ln} is malformed JSON "
                      "(truncated write?) — ignoring that record",
                      flush=True)
                continue
            streamed[int(rec["image"])] = rec

    skip = crown_certified.copy()  # dominated: already certified a fortiori
    skip[[i for i in streamed if i < end]] = True
    if args.images is not None:
        want = {int(s) for s in args.images.split(",") if s.strip()}
        out_of_range = sorted(i for i in want if not 0 <= i < end)
        if out_of_range:
            raise SystemExit(f"--images indices out of range: {out_of_range}")
        sel = np.ones(end, bool)
        sel[sorted(want)] = False
        skip = sel | np.isin(np.arange(end), [i for i in streamed if i < end])

    cert = Certifier(
        model, params, T=int(cfg.get("T", 40)),
        eps_input=float(cfg.get("eps", 36 / 255)),
        scale_nominal=bool(cfg["module"]["dynamics"]["scale_nominal"]),
    )
    n_todo = int((~skip).sum())
    print(f"hybrid sweep over {n_todo} images of {end} "
          f"(T={cert.T}, kappa={cert.kappa:.4f}, "
          f"precision={cert.matmul_precision}; "
          f"{int(crown_certified.sum())} CROWN-certified skipped as "
          f"dominated, {len(streamed)} resumed)", flush=True)
    t0 = time.time()

    def stream_image(s):
        with stream_path.open("a") as f:
            f.write(json.dumps(dataclasses.asdict(s)) + "\n")
        print(f"[hybrid] img {s.image} worst={s.worst:+.4f} "
              f"violated={s.n_violated} certified={s.certified} "
              f"({s.seconds:.1f}s)", flush=True)

    stats = hybrid_base_sweep(
        cert, ds.test_x[:end], ds.test_y[:end],
        chunk=args.chunk, superchunk=args.superchunk,
        skip=skip, on_image=stream_image,
    )
    all_recs = {s.image: dataclasses.asdict(s) for s in stats}
    for i, rec in streamed.items():
        if i < end:
            all_recs.setdefault(i, rec)
    newly = sorted(i for i, r in all_recs.items() if r["certified"])
    out = {
        "base_summary": args.summary,
        "n_images": end,
        "matmul_precision": cert.matmul_precision,
        "T": cert.T,
        "kappa": cert.kappa,
        "crown_certified": int(crown_certified.sum()),
        "swept": sorted(all_recs),
        "hybrid_certified_new": newly,
        # CROWN-certified images are hybrid-certified a fortiori (the
        # hybrid cell bound is pointwise <= the CROWN cell bound)
        "certified_total": int(crown_certified.sum()) + len(
            [i for i in newly if not crown_certified[i]]
        ),
        "seconds": time.time() - t0,
        "stats": [all_recs[i] for i in sorted(all_recs)],
    }
    (run_dir / args.out).write_text(json.dumps(out, indent=1))
    print(f"hybrid sweep: CROWN base {out['crown_certified']} -> "
          f"hybrid base {out['certified_total']} "
          f"(+{len(newly)} of {len(all_recs)} swept) "
          f"in {out['seconds']:.0f}s -> {run_dir / args.out}", flush=True)


if __name__ == "__main__":
    main()

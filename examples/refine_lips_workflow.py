"""Locally refine the Lipschitz certificate over a completed full sweep.

Reads the committed full-test-set Lipschitz stream summary
(``lips_stream_full.jsonl.json``: with-slack certified set, larger-T
exact-pass set, clean set) and runs the local grid refinement
(fiode_tpu/verify/refine_lips.py) over every clean image whose exact grid
values pass but whose global-gap slack fails — the only tier refinement
can help (an exact lattice violation is unrefinable; those are recorded
as ``exact_violation`` without work).

The refinement re-sweeps each candidate's full grid itself, so the output
is a self-contained certificate for every image it flips.  The reference
has no counterpart: robustness/certify_lipschitz.py:120-143 applies ONE
global lattice-gap slack and abandons an image at its first slack-violated
cell.

Usage:
  python examples/refine_lips_workflow.py [--run-dir run_data/certified_full]
      [--summary lips_stream_full.jsonl.json] [--end 512] [--rounds 60]
      [--out refine_lips_full.json]

Resumable exactly like refine_workflow.py: per-image verdicts stream to
``<out-stem>_stream.jsonl`` with the budget params stamped; re-running
skips certified and same-budget gave-up verdicts, and retries gave-ups
recorded under different budgets.

NOTE (measured, round 4): on the flagship CIFAR checkpoint this
refinement recovers nothing — the isotropic-L2 slack needs ~f^(n-1)
sub-boxes to shrink by a factor f (see verify/refine_lips.py docstring),
and every slack-violated image sits deep in that regime.  The driver is
kept for regimes where margins are within a couple of splits of closing
(lower-dimensional heads, smaller kappa, finer base grids).
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
    ap.add_argument("--summary", default="lips_stream_full.jsonl.json")
    ap.add_argument("--config-name", default="cifar_certify.yaml")
    ap.add_argument("--end", type=int, default=512)
    ap.add_argument("--rounds", type=int, default=60)
    ap.add_argument("--collect-cap", type=int, default=12_000_000)
    ap.add_argument("--box-budget", type=int, default=128_000_000)
    ap.add_argument("--frontier-cap", type=int, default=1 << 25)
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--superchunk", type=int, default=16)
    ap.add_argument("--out", default="refine_lips_full.json")
    args = ap.parse_args()

    from fiode_tpu.experiment import (
        _load_cfg_dataset,
        _restore_params,
        build_model,
    )
    from fiode_tpu.utils.config import compose
    from fiode_tpu.verify.certify import Certifier
    from fiode_tpu.verify.refine import RefineStats
    from fiode_tpu.verify.refine_lips import refine_lips_uncertified

    run_dir = Path(args.run_dir)
    summary = json.loads((run_dir / args.summary).read_text())
    if summary.get("method", "lipschitz") != "lipschitz":
        raise SystemExit("summary is not a lipschitz-sweep artifact")
    start = int(summary.get("start_ind", 0))
    if start != 0:
        raise SystemExit(
            f"summary covers indices from {start}; this driver refines "
            "test indices from 0 — re-run the sweep with ++start_ind=0"
        )
    cfg = compose(args.config_name, [], "configs/certify")
    model = build_model(cfg)
    params = _restore_params(cfg, model, str(run_dir))
    ds = _load_cfg_dataset(cfg)
    end = min(args.end, int(summary["n_images"]), len(ds.test_x))

    def mask_from(key):
        m = np.zeros(end, bool)
        m[[i for i in summary[key] if i < end]] = True
        return m

    certified = mask_from("certified_idx")
    exact_ok = mask_from("larger_T_certified_idx")
    clean = mask_from("clean_idx")
    base_mask = certified.copy()
    base_certified = int(base_mask.sum())

    budget_params = {
        "rounds": args.rounds,
        "collect_cap": args.collect_cap,
        "box_budget": args.box_budget,
        "frontier_cap": args.frontier_cap,
    }
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
    skip = np.zeros(end, bool)
    n_retry = 0
    for i, rec in streamed.items():
        if i >= end:
            continue
        if rec["certified"]:
            certified[i] = True
            skip[i] = True
        elif rec["gave_up"] == "exact_violation":
            skip[i] = True  # budget-independent: provably unrefinable
        elif rec.get("params") == budget_params:
            skip[i] = True
        else:
            n_retry += 1
    if streamed:
        print(f"resuming: {len(streamed)} streamed verdicts "
              f"({sum(r['certified'] for r in streamed.values())} certified"
              f"{f', retrying {n_retry} gave-ups under new budgets'
                 if n_retry else ''})",
              flush=True)

    cert = Certifier(
        model, params, T=int(cfg.get("T", 40)),
        eps_input=float(cfg.get("eps", 36 / 255)),
        scale_nominal=bool(cfg["module"]["dynamics"]["scale_nominal"]),
    )
    todo = int((clean & exact_ok & ~certified & ~skip).sum())
    print(
        f"lips-refining {todo} slack-blocked images of {end} "
        f"(+{int((clean & ~exact_ok & ~skip).sum())} exact-violation "
        f"fast-skips; T={cert.T}, kappa_lips={cert.kappa_lips:.4f}, "
        f"precision={cert.matmul_precision}, rounds<={args.rounds})",
        flush=True,
    )
    t0 = time.time()

    def stream_image(s):
        with stream_path.open("a") as f:
            f.write(json.dumps(
                dataclasses.asdict(s) | {"params": budget_params}
            ) + "\n")

    new_cert, stats = refine_lips_uncertified(
        cert, ds.test_x[:end], ds.test_y[:end], certified,
        exact_ok=exact_ok, clean=clean,
        max_rounds=args.rounds, collect_cap=args.collect_cap,
        box_budget=args.box_budget, frontier_cap=args.frontier_cap,
        chunk=args.chunk, superchunk=args.superchunk,
        progress_every=1, skip=skip, on_image=stream_image,
    )
    fields = {f.name for f in dataclasses.fields(RefineStats)}
    fresh = {s.image for s in stats}
    stats = sorted(
        stats + [
            RefineStats(**{k: v for k, v in rec.items() if k in fields})
            for i, rec in streamed.items()
            if i < end and i not in fresh and skip[i]
        ],
        key=lambda s: s.image,
    )
    out = {
        "base_summary": args.summary,
        "n_images": end,
        "matmul_precision": cert.matmul_precision,
        **budget_params,
        "base_certified": base_certified,
        "certified": int(new_cert.sum()),
        "recovered": int(new_cert.sum() - base_certified),
        "certified_acc": float(new_cert.mean()),
        "exact_ok": int(exact_ok.sum()),
        "recovered_idx": sorted(
            np.nonzero(new_cert & ~base_mask)[0].tolist()
        ),
        "certified_idx": sorted(np.nonzero(new_cert)[0].tolist()),
        "seconds": time.time() - t0,
        "stats": [dataclasses.asdict(s) for s in stats],
    }
    (run_dir / args.out).write_text(json.dumps(out, indent=1))
    print(
        f"lips-certified {out['base_certified']} -> {out['certified']} "
        f"(+{out['recovered']}) of {end} "
        f"[{out['certified_acc']:.4f}] in {out['seconds']:.0f}s "
        f"-> {run_dir / args.out}",
        flush=True,
    )


if __name__ == "__main__":
    main()

"""examples/refine_accounting.py — audit folding over fabricated artifacts.

Pure host-side JSON: no jax, no device. Checks the tier table the judge
reads (recovered-by-pass attribution, survivor blockers, malformed-line
tolerance) against a hand-built two-pass campaign.
"""
import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))
import refine_accounting  # noqa: E402


@pytest.fixture
def campaign(tmp_path):
    run = tmp_path
    # base sweep: 8 images, 0/1/2 certified
    (run / "sum.json").write_text(json.dumps(
        {"n_images": 8, "certified_idx": [0, 1, 2]}))
    # pass artifact (stats list shape, like refine_full_pass2.json):
    # img 3 recovered (0.5M violated), img 4 fails at frontier_cap (2M)
    (run / "refine_full_pass2.json").write_text(json.dumps({"stats": [
        {"image": 3, "base_violated": 500_000, "certified": True,
         "gave_up": ""},
        {"image": 4, "base_violated": 2_000_000, "certified": False,
         "gave_up": "frontier_cap"},
        {"image": 5, "base_violated": -1, "certified": False,
         "gave_up": "collect_cap"},
    ]}))
    # later stream: img 4 recovered, img 5 re-measured at 6M under a
    # bigger collect cap and fails on time, img 6 never certified,
    # plus one truncated line that must be tolerated
    lines = [
        json.dumps({"image": 4, "base_violated": 2_000_000,
                    "certified": True, "gave_up": ""}),
        json.dumps({"image": 5, "base_violated": 6_000_000,
                    "certified": False, "gave_up": "time_budget"}),
        json.dumps({"image": 6, "base_violated": 100_000,
                    "certified": False, "gave_up": "budget"}),
        '{"image": 7, "trunc',
    ]
    (run / "refine_full_pass5_stream.jsonl").write_text(
        "\n".join(lines) + "\n")
    return run


def test_accounting_folds_passes_and_tiers(campaign, capsys):
    out = refine_accounting.main(
        ["--run-dir", str(campaign), "--summary", "sum.json"])
    assert out["base_certified"] == 3
    assert out["certified"] == 5          # +3 recovered, +4 recovered
    assert out["recovered"] == 2
    # img 7's record was truncated: not counted anywhere
    assert out["open_images"] == [5, 6, 7]
    tiers = out["tiers"]
    t_small = tiers["<=1M violated"]
    assert t_small["recovered_by"] == {"refine_full_pass2": 1}
    assert t_small["open_blockers"] == {"budget": 1}
    # img 4: first seen failing in pass2, certified by the pass5 stream
    t_mid = tiers["1-4M violated"]
    assert t_mid["recovered_by"] == {"refine_full_pass5": 1}
    # img 5: the -1 "exceeded cap" count was replaced by the later 6M
    # re-measurement, moving it into a real tier
    t_big = tiers["4-16M violated"]
    assert t_big["open_blockers"] == {"time_budget": 1}
    assert "unknown (exceeded collect cap)" not in tiers or \
        tiers["unknown (exceeded collect cap)"]["open"] == 1  # img 7
    # artifact written
    art = json.loads((campaign / "refine_accounting.json").read_text())
    assert art["certified_acc"] == 5 / 8
    assert "malformed" in capsys.readouterr().err


def test_witness_audit_splits_open_into_refuted_and_tractable(campaign):
    # exact_witnesses.json present: refuted survivors get the
    # refuted_exact_witness blocker, the ceiling excludes them, and
    # tractable margins are surfaced for scheduling
    (campaign / "exact_witnesses.json").write_text(json.dumps({
        "refuted": [5, 3],  # 3 is certified -> must NOT count as refuted
        "tractable": [6, 7],
        "witnesses": [
            {"image": 5, "exact_margin": -0.1},   # refuted: margin unused
            {"image": 6, "exact_margin": 0.05},
            {"image": 7, "exact_margin": 0.2},
        ],
    }))
    out = refine_accounting.main(
        ["--run-dir", str(campaign), "--summary", "sum.json"])
    assert out["refuted_exact_witness"] == [5]
    assert out["tractable_open"] == [6, 7]
    assert out["certifiable_ceiling"] == 7          # 8 - 1 refuted
    assert out["completeness_vs_ceiling"] == 5 / 7
    assert out["tractable_margins"] == {"6": 0.05, "7": 0.2}
    big = out["tiers"]["4-16M violated"]
    assert big["open_blockers"] == {"refuted_exact_witness": 1}


def test_certified_verdict_is_final_across_passes(campaign):
    # a later stream must not un-certify an image: append a FAILING
    # record for img 3 (e.g. a stricter-budget rerun) — verdict stays
    with (campaign / "refine_full_pass5_stream.jsonl").open("a") as f:
        f.write(json.dumps({"image": 3, "base_violated": 500_000,
                            "certified": False, "gave_up": "rounds"}) + "\n")
    out = refine_accounting.main(
        ["--run-dir", str(campaign), "--summary", "sum.json"])
    assert out["certified"] == 5
    assert 3 not in out["open_images"]


def test_inclusion_check_on_committed_artifacts(tmp_path):
    """certified ⊆ robust must hold between the committed certified set
    and the committed full-512 AutoAttack artifact (t_max=1.0)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))
    try:
        from inclusion_check import main as inclusion_main
    finally:
        sys.path.pop(0)

    out = inclusion_main([
        "--attack", "autoattack_full_standard_512.json",
        "--out", str(tmp_path / "incl.json"),
    ])
    assert out["inclusion_holds"]
    assert out["certified"] >= 474  # never regresses below the committed count

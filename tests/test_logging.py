"""MetricWriter run-dir artifacts: JSONL records, write-once config with a
loud drift warning (a --restore with different eval knobs must never
clobber the record of how the checkpoint was trained)."""
import json
from pathlib import Path

from fiode_tpu.utils.logging import MetricWriter


class TestMetricWriter:
    def test_metrics_jsonl_append_and_fields(self, tmp_path):
        w = MetricWriter(str(tmp_path), config={"lr": 5e-3})
        w.log({"training_loss": 1.5}, step=0, epoch=0)
        w.log({"training_loss": 1.25}, step=1, epoch=0)
        recs = [
            json.loads(line)
            for line in (tmp_path / "metrics.jsonl").read_text().splitlines()
        ]
        assert [r["step"] for r in recs] == [0, 1]
        assert recs[1]["training_loss"] == 1.25
        assert recs[0]["epoch"] == 0

    def test_config_write_once_preserves_training_record(
        self, tmp_path, capsys
    ):
        MetricWriter(str(tmp_path), config={"max_epochs": 300})
        # restore-style re-init with different knobs: record kept + warning
        MetricWriter(str(tmp_path), config={"max_epochs": 10})
        rec = json.loads((tmp_path / "config.json").read_text())
        assert rec["max_epochs"] == 300
        assert "WARNING" in capsys.readouterr().out

    def test_config_rewrite_identical_is_silent(self, tmp_path, capsys):
        MetricWriter(str(tmp_path), config={"max_epochs": 300})
        MetricWriter(str(tmp_path), config={"max_epochs": 300})
        assert "WARNING" not in capsys.readouterr().out

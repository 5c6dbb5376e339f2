"""Experiment-level end-to-end: train via composed config, restore the best
checkpoint, certify and attack through the same plumbing the CLI uses."""
import numpy as np
import pytest
from pathlib import Path

from fiode_tpu.utils.config import compose

REPO = Path(__file__).resolve().parents[1]

TINY_OVERRIDES = [
    "++batch_size=32",
    "++synthetic_size=512",
    "++val_batch_size=64",
    "++module.h_sample_size=8",
    "++module.max_epochs=1",
    "+module/init_fun/param_map@module.init_fun.param_map=TinyMLP",
    "++module.init_fun.param_map.out_dim=10",
    "++module.dynamics.mlp_size=32",
]


class TestExperimentE2E:
    def test_train_certify_attack(self, tmp_path):
        from fiode_tpu.experiment import run_autoattack, run_certify, run_train

        overrides = TINY_OVERRIDES + ["++data_root=" + str(tmp_path / "none")]
        cfg = compose(
            "mnist_train.yaml", overrides,
            str(REPO / "configs/classification"),
        )
        run_dir = str(tmp_path / "run")
        run_train(cfg, run_dir=run_dir, epochs=1)

        # certification through checkpoint restore (T small for test speed)
        cert_cfg = dict(
            cfg, T=6, eps=0.1, start_ind=0, end_ind=4,
        )
        res = run_certify(cert_cfg, method="lipschitz", run_dir=run_dir,
                          max_images=4)
        assert res.clean.shape == (4,)
        assert (~res.certified | res.clean).all()

        res_c = run_certify(cert_cfg, method="crown", run_dir=run_dir,
                            max_images=2)
        assert res_c.clean.shape == (2,)

        # BaB refinement through the same entry point: certificates may
        # only be gained (verify/refine.py; ++refine_rounds on the CLI)
        res_r = run_certify(
            dict(cert_cfg, refine_rounds=3, refine_box_budget=3000,
                 chunk=64),
            method="crown", run_dir=run_dir, max_images=2,
        )
        assert (~res_c.certified | res_r.certified).all()

        # lipschitz refinement through the same entry point: gains only,
        # and never beyond the exact-grid set (verify/refine_lips.py)
        res_lr = run_certify(
            dict(cert_cfg, refine_rounds=3, refine_box_budget=3000,
                 chunk=64),
            method="lipschitz", run_dir=run_dir, max_images=4,
        )
        assert (~res.certified | res_lr.certified).all()
        assert (~res_lr.certified | res.larger_T_certified).all()

        # same entry point on a 2-D (img x cell) mesh: identical verdicts
        res_m = run_certify(dict(cert_cfg, mesh_shape=[2, 4]),
                            method="crown", run_dir=run_dir, max_images=2)
        assert (res_m.certified == res_c.certified).all()
        assert (res_m.clean == res_c.clean).all()

        # 1-D spelling (single int shards the cell axis only)
        res_1d = run_certify(dict(cert_cfg, mesh_shape=8),
                             method="crown", run_dir=run_dir, max_images=2)
        assert (res_1d.certified == res_c.certified).all()

        # attack through the same restore path (tiny budget)
        acc = run_autoattack(
            cert_cfg, run_dir=run_dir, max_images=32,
            attacks=("apgd-ce",),
        )
        assert 0.0 <= acc <= 1.0


CLI_TINY = [
    "++batch_size=32",
    "++synthetic_size=256",
    "++val_batch_size=32",
    "++module.dynamics.mlp_size=32",
    "+module/init_fun/param_map@module.init_fun.param_map=TinyMLP",
    "++module.init_fun.param_map.out_dim=10",
]


class TestCliSurface:
    """Drive the FULL ``python -m fiode_tpu`` command surface headless
    (reference README command list / sl_pipeline.py:255-261): train →
    restore best → sample-grid → certify-crown → certify-lipschitz →
    eval-autoattack → segway-train → segway-certify, all on tiny shapes."""

    def test_full_command_surface(self, tmp_path, capsys):
        from fiode_tpu.cli import main

        run_dir = str(tmp_path / "run")
        data_none = "++data_root=" + str(tmp_path / "none")
        train_dir = str(REPO / "configs/classification")
        cert_dir = str(REPO / "configs/certify")

        main(["train", "--config-name", "mnist_train.yaml",
              "--config-dir", train_dir, "--run-dir", run_dir,
              "--epochs", "1", "++module.h_sample_size=8", data_none,
              *CLI_TINY])
        assert (Path(run_dir) / "metrics.jsonl").exists()
        assert (Path(run_dir) / "ckpt").exists()

        grid_out = str(tmp_path / "grid.pkl")
        main(["sample-grid", "--config-name", "mnist_certify.yaml",
              "--config-dir", cert_dir, "--out", grid_out, "++T=6"])
        assert Path(grid_out).exists()

        cert_args = ["--config-name", "mnist_certify.yaml",
                     "--config-dir", cert_dir, "--run-dir", run_dir,
                     "--max-images", "2", "++T=6", "++end_ind=2",
                     data_none, *CLI_TINY]
        stream = str(tmp_path / "cert.jsonl")
        main(["certify-crown", "--stream-out", stream, *cert_args,
              "++refine_rounds=2", "++refine_box_budget=2000",
              "++chunk=64"])
        # the refinement audit sits next to the stream log with absolute
        # image indices
        import json as _json

        raud = _json.loads(Path(stream + ".refine.json").read_text())
        assert raud["refine_rounds"] == 2 and raud["start_ind"] == 0
        assert all(0 <= s["image"] < 2 for s in raud["stats"])
        main(["certify-lipschitz", *cert_args])

        main(["eval-autoattack", "--config-name", "mnist_certify.yaml",
              "--config-dir", cert_dir, "--run-dir", run_dir,
              "--max-images", "8", "--attacks", "apgd-ce,square",
              "++attack_n_iter=3", "++attack_square_queries=8",
              data_none, *CLI_TINY])
        out = capsys.readouterr().out
        assert "robust acc" in out
        assert "certified" in out

        seg_path = str(tmp_path / "segway.pkl")
        main(["segway-train", "--save", seg_path, "--iters", "3"])
        assert Path(seg_path).exists()
        main(["segway-certify", "--model", seg_path, "--r", "0.15"])
        out = capsys.readouterr().out
        assert "cells" in out.lower()

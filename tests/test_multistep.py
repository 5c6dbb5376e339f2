"""Multi-step-per-call training equals step-by-step training."""
import json

import numpy as np
import jax

from fiode_tpu.models.backbones import TinyMLPBackbone
from fiode_tpu.models.dynamics import SimplexDynamics
from fiode_tpu.models.ivp import NeuralODEClassifier
from fiode_tpu.train.data import load_dataset
from fiode_tpu.train.trainer import LyapunovTrainer, TrainConfig


def make(tmp_path, sub, **kw):
    ds = load_dataset("MNIST", data_root=str(tmp_path / "none"), synthetic_size=512)
    dyn = SimplexDynamics(n_hidden=10, mlp_size=32, x_dim=10, dropout=0.0,
                          cayley=False, kappa=2.0, kappa_length=100)
    model = NeuralODEClassifier(
        backbone=TinyMLPBackbone(out_dim=10, hidden=32,
                                 mu=(0.1307,), std=(0.3081,)),
        dynamics=dyn, n_classes=10, max_steps=64,
    )
    cfg = TrainConfig(batch_size=64, val_batch_size=128, h_sample_size=8,
                      max_epochs=1, lr=1e-3, log_every=1, **kw)
    return LyapunovTrainer(model, cfg, ds, run_dir=str(tmp_path / sub))


def final_params(tr):
    return tr.fit(epochs=1)


class TestMultiStep:
    def test_matches_single_step(self, tmp_path):
        tr1 = make(tmp_path, "a", steps_per_call=1)
        tr4 = make(tmp_path, "b", steps_per_call=4)
        p1 = final_params(tr1)
        p4 = final_params(tr4)
        # identical seeds and data order; RNG streams differ (keys split per
        # call vs per group) so require close-but-not-identical behaviour:
        # compare final validation errors instead of raw params
        v1 = tr1.evaluate(p1, jax.random.PRNGKey(9))
        v4 = tr4.evaluate(p4, jax.random.PRNGKey(9))
        assert abs(v1["validation_error"] - v4["validation_error"]) < 0.25
        # grouped + flushed steps cover every batch
        n_steps = len(tr1.ds.train_x) // tr1.cfg.batch_size
        recs1 = [json.loads(l) for l in open(tmp_path / "a" / "metrics.jsonl")]
        steps1 = [r["step"] for r in recs1 if "training_loss" in r]
        assert steps1[-1] == n_steps - 1  # logged every step
        recs4 = [json.loads(l) for l in open(tmp_path / "b" / "metrics.jsonl")]
        steps4 = [r["step"] for r in recs4 if "training_loss" in r]
        assert steps4 and steps4[0] == 0

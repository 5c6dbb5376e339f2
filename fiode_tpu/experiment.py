"""Experiment builder + runners: config dict -> model/trainer/certifier.

The orchestration layer (reference SLExperiment, sl_pipeline.py:130-264,
and the robustness/eval script plumbing): builds the flagship objects from a
composed config and exposes the run entry points used by the CLI —
train / sample-grid / certify {crown,lipschitz} / eval-autoattack /
segway {train,certify}.
"""
from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .models.backbones import make_backbone
from .models.dynamics import SimplexDynamics
from .models.ivp import NeuralODEClassifier
from .train.data import load_dataset
from .train.schedulers import (
    CompositeSamplerScheduler,
    ConstantScheduler,
    LinearScheduler,
    SwitchScheduler,
)
from .train.trainer import LyapunovTrainer, TrainConfig

__all__ = [
    "build_model",
    "build_trainer",
    "run_train",
    "run_sample_grid",
    "run_certify",
    "run_autoattack",
]


def _ordered_callbacks(cfg: dict, key: str):
    d = cfg.get(key, {}) or {}
    return [d[k] for k in sorted(d)]


def build_model(cfg: dict) -> NeuralODEClassifier:
    m = cfg["module"]
    dyn_cfg = m["dynamics"]
    ds = cfg["dataset"]
    pm = m.get("init_fun", {}).get("param_map") or {}
    backbone = make_backbone(
        pm.get("target", "TinyMLP"),
        out_dim=int(pm.get("out_dim", 128)),
        act=pm.get("act", "GroupSort"),
        mu=tuple(ds["MU"]),
        std=tuple(ds["STD"]),
    )
    dynamics = SimplexDynamics(
        n_hidden=int(dyn_cfg.get("n_hidden", ds["N_CLASSES"])),
        mlp_size=int(dyn_cfg["mlp_size"]),
        x_dim=int(dyn_cfg["x_dim"]),
        activation=dyn_cfg["activation"],
        dropout=float(dyn_cfg["dropout"]),
        alpha_1=float(dyn_cfg["alpha_1"]),
        alpha_2=float(dyn_cfg["alpha_2"]),
        sigma_1=float(dyn_cfg["sigma_1"]),
        scale_nominal=bool(dyn_cfg["scale_nominal"]),
        cayley=bool(dyn_cfg["cayley"]),
        kappa=float(dyn_cfg["kappa"]),
        kappa_length=int(dyn_cfg["kappa_length"]),
    )
    init_target = (m.get("init_fun") or {}).get("target", "UniformInitFun")
    out_target = (m.get("output") or {}).get("target", "default")
    return NeuralODEClassifier(
        backbone=backbone,
        dynamics=dynamics,
        n_classes=int(ds["N_CLASSES"]),
        t_max=float(m["t_max"]),
        h0_init="uniform" if init_target == "UniformInitFun" else "zeros",
        output=out_target if out_target in ("default", "first_n", "linear")
        else "default",
        method=m.get("val_ode_solver", "dopri5"),
        rtol=float(m.get("val_ode_tol", 1e-3)),
        atol=float(m.get("val_ode_tol", 1e-3)),
        # generous bound on adaptive steps: dopri5 @ tol 1e-3, t_max <= 5
        # needs <~20; a tight bound keeps the differentiable scan path cheap
        max_steps=int(m.get("max_steps", 64)),
    )


def _build_scheduler(cfg: dict) -> Optional[CompositeSamplerScheduler]:
    nodes = _ordered_callbacks(cfg, "_sch_callback_dict")
    if not nodes:
        return None
    kinds = {
        "LinearScheduler": lambda n: LinearScheduler(
            rate=float(n.get("rate", 1.0)), bias=float(n.get("bias", 0.0)),
            clamp=n.get("clamp", "min"), clamp_val=float(n.get("clamp_val", 0.0)),
            start=int(n.get("start", 0)),
        ),
        "ConstantScheduler": lambda n: ConstantScheduler(float(n.get("constant", 1.0))),
        "SwitchScheduler": lambda n: SwitchScheduler(
            float(n.get("start", 0.0)), float(n.get("end", 1.0)),
            float(n.get("trigger", 1.0)),
        ),
    }
    schedulers = [kinds[n["target"]](n) for n in nodes]
    weights = (cfg["module"].get("sampler_scheduler") or {}).get(
        "scheduler_weights", [1.0] * len(schedulers)
    )
    return CompositeSamplerScheduler(schedulers, [float(w) for w in weights])


def _load_cfg_dataset(cfg: dict):
    """Dataset as the config describes it — all entry points (train,
    certify, attack) must agree on seed/size/hardness so a model is always
    evaluated on the distribution it was trained against."""
    return load_dataset(
        cfg["dataset"]["name"], cfg.get("data_root", "data"),
        seed=int(cfg.get("seed", 0)),
        synthetic_size=int(cfg.get("synthetic_size", 4096)),
        synthetic_hardness=float(cfg.get("synthetic_hardness", 0.0)),
    )


def build_trainer(cfg: dict, run_dir: Optional[str] = None) -> LyapunovTrainer:
    m = cfg["module"]
    ds = _load_cfg_dataset(cfg)
    model = build_model(cfg)
    sampler_nodes = _ordered_callbacks(cfg, "_sampler_callback_dict")
    sampler_names = tuple(n["target"] for n in sampler_nodes) or (
        "UniformSimplexSampling", "CorrectConeSampling",
    )
    lya = m.get("lya_cand") or {"target": "DecisionBoundary"}
    tcfg = TrainConfig(
        opt_name=m["opt_name"], lr=float(m["lr"]),
        momentum=float(m.get("momentum", 0.9)),
        weight_decay=float(m.get("weight_decay", 0.0)),
        beta1=float(m.get("beta1", 0.9)), beta2=float(m.get("beta2", 0.999)),
        scheduler_name=m.get("scheduler_name", "cos_anneal"),
        decay_epochs=tuple(m.get("decay_epochs", (90, 120, 150))),
        max_epochs=int(m["max_epochs"]), warmup=int(m.get("warmup", -1)),
        fix_backbone=bool(m.get("fix_backbone", False)),
        batch_size=int(cfg.get("batch_size", 128)),
        val_batch_size=int(cfg.get("val_batch_size", 256)),
        h_sample_size=int(m.get("h_sample_size", 128)),
        h_dist_lim=float(m.get("h_dist_lim", 15.0)),
        act=m.get("act", "relu"),
        lya_cand=lya["target"],
        lya_log_mode=bool(lya.get("log_mode", False)),
        sampler_names=sampler_names,
        barrier_loss=bool(m.get("barrier_loss", False)),
        relax_exp_stable=bool(m.get("relax_exp_stable", False)),
        scale_l_eps=float(m.get("scaleLeps", 3.0)),
        lips_train=bool(m.get("lips_train", False)),
        lips_warmup=int(m.get("lips_warmup", 0)),
        epoch_off_scale=int(m.get("epoch_off_scale", 10)),
        train_ode=bool(m.get("train_ode", False)),
        train_ode_epoch=int(m.get("train_ode_epoch", 100)),
        # the registered module node spells the objective as target=
        # (ODEModule -> ODELearning etc., utils/config.py:132-139); an
        # explicit ++module.objective override still wins
        objective=m.get("objective", {
            "ODELearning": "ode",
            "ClassicalLearning": "classical",
        }.get(m.get("target"), "lyapunov")),
        adv_train=bool(m.get("adv_train", False)),
        val_adv=bool(m.get("val_adv", False)),
        eps=float(m.get("eps", 36 / 255)), norm=m.get("norm", "L2"),
        seed=int(cfg.get("seed", 0)),
        steps_per_call=int(m.get("steps_per_call", 1)),
    )
    if run_dir is None:
        stamp = time.strftime("%Y%m%d-%H%M%S")
        run_dir = str(Path(cfg.get("savedir", "run_data")) /
                      f"{cfg['dataset']['name']}-{stamp}")
    return LyapunovTrainer(
        model, tcfg, ds, scheduler=_build_scheduler(cfg), run_dir=run_dir
    )


def run_train(cfg: dict, run_dir: Optional[str] = None, epochs=None,
              test_adv: bool = False, resume: bool = False):
    tr = build_trainer(cfg, run_dir)
    params = tr.fit(epochs=epochs, resume=resume)
    # final test evaluation (reference trainer.test(ckpt='best'),
    # sl_pipeline.py:222)
    test = tr.evaluate(params, jax.random.PRNGKey(1), split="test")
    if test_adv:
        # AutoAttack apgd-ce/apgd-t at test (pl_modules.py:222-244)
        test.update(tr.test_autoattack(params, jax.random.PRNGKey(2)))
    tr.writer.log({f"test_{k}": v for k, v in test.items()}, step=-1)
    tr.writer.console(f"test: {test}")
    return params, test


def run_sample_grid(cfg: dict, out_path: Optional[str] = None):
    from .utils.checkpoint import save_pytree
    from .verify.grid import enumerate_decision_boundary

    n = int(cfg["dataset"]["N_CLASSES"])
    T = int(cfg.get("T", 40))
    t0 = time.time()
    grid = enumerate_decision_boundary(n, T)
    print(f"grid n={n} T={T}: {grid.shape[0]:,} cells in {time.time()-t0:.1f}s")
    if out_path:
        save_pytree(out_path, grid)
    return grid


def _restore_params(cfg, model, run_dir):
    from .utils.checkpoint import CheckpointManager

    x0 = jnp.zeros(
        (1, int(cfg["dataset"]["IN_CHANNEL"]), *cfg["dataset"]["IMG_SIZE"]),
        jnp.float32,
    )
    like_params = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
    ckpt = CheckpointManager(run_dir)
    state = ckpt.restore(
        "best",
        like={"params": jax.tree_util.tree_map(np.asarray, like_params),
              "step": 0},
    )
    return state["params"]


def run_certify(cfg: dict, method: str = "crown", run_dir: str = ".",
                grid=None, max_images: Optional[int] = None,
                image_batch: Optional[int] = None,
                stream_out: Optional[str] = None):
    from .verify.certify import Certifier

    model = build_model(cfg)
    params = _restore_params(cfg, model, run_dir)
    ds = _load_cfg_dataset(cfg)
    if grid is None and cfg.get("load_grid"):
        # reuse a sample-grid artifact instead of re-enumerating
        # (reference ++load_grid=True ++grid_name=... semantics)
        from .utils.checkpoint import load_pytree

        grid = load_pytree(cfg["grid_name"])
    start, end = int(cfg.get("start_ind", 0)), int(cfg.get("end_ind", -1))
    if end == -1:
        end = len(ds.test_x)
    if max_images:
        end = min(end, start + max_images)
    # only pass matmul_precision when the config sets it — the Certifier's
    # signature default is the single source of truth for the shipping
    # precision (bench_certify introspects the same signature)
    prec = ({"matmul_precision": str(cfg["matmul_precision"])}
            if "matmul_precision" in cfg else {})
    # ++mesh_shape=[n_img,n_cell] shards the sweep over a 2-D device mesh
    # (parallel.mesh.make_mesh2d); a single int shards cells over a 1-D
    # mesh.  Default: whatever devices/shardings JAX picks (single chip).
    mesh = None
    if cfg.get("mesh_shape"):
        from .parallel.mesh import make_mesh, make_mesh2d

        ms = cfg["mesh_shape"]
        mesh = (make_mesh2d(int(ms[0]), int(ms[1]))
                if isinstance(ms, (list, tuple))
                else make_mesh(int(ms), axis="cell"))
    cert = Certifier(
        model, params, T=int(cfg.get("T", 40)),
        eps_input=float(cfg.get("eps", 36 / 255)),
        scale_nominal=bool(cfg["module"]["dynamics"]["scale_nominal"]),
        chunk=int(cfg.get("chunk", 8192)),
        grid=grid,
        mesh=mesh,
        **prec,
    )
    if stream_out and not image_batch:
        # a requested audit log implies the streamed sweep (dropping it
        # silently would lose the log the CLI help promises)
        image_batch = 10
    if image_batch:
        # protocol-style streamed sweep (certify_crown.py:122,161-172)
        res = cert.certify_stream(
            ds.test_x[start:end], ds.test_y[start:end], method=method,
            image_batch=image_batch, out_path=stream_out, start_ind=start,
        )
    else:
        res = cert.certify(
            ds.test_x[start:end], ds.test_y[start:end], method=method,
            progress_every=10,
        )
    refine_rounds = int(cfg.get("refine_rounds", 0))
    if refine_rounds > 0:
        # BaB cell refinement over clean-but-uncertified images
        # (capability beyond the reference; verify/refine.py for crown,
        # verify/refine_lips.py for the lipschitz grid-gap slack;
        # ++refine_alpha_iters>0 swaps the crown box evaluator for
        # alpha-CROWN)
        rkw = dict(
            clean=res.clean, chunk=cert.chunk,
            max_rounds=refine_rounds,
            frontier_cap=int(cfg.get("refine_frontier_cap", 1 << 20)),
            box_budget=int(cfg.get("refine_box_budget", 64_000_000)),
            collect_cap=int(cfg.get("refine_collect_cap", 4_000_000)),
            progress_every=1,
        )
        if method == "crown":
            from .verify.refine import refine_uncertified

            new_cert, rstats = refine_uncertified(
                cert, ds.test_x[start:end], ds.test_y[start:end],
                res.certified,
                alpha_iters=int(cfg.get("refine_alpha_iters", 0)), **rkw,
            )
        else:
            from .verify.refine_lips import refine_lips_uncertified

            new_cert, rstats = refine_lips_uncertified(
                cert, ds.test_x[start:end], ds.test_y[start:end],
                res.certified, exact_ok=res.larger_T_certified, **rkw,
            )
        rec = int(new_cert.sum() - res.certified.sum())
        print(f"[refine] recovered {rec} of "
              f"{int((res.clean & ~res.certified).sum())} uncertified "
              f"(rounds<={refine_rounds})")
        res.certified = new_cert
        if stream_out:
            import json

            # stats[].image is slice-relative (refine_uncertified contract)
            # — translate to absolute test indices so the audit file is
            # internally consistent with certified_idx
            abs_stats = []
            for s in rstats:
                d = dataclasses.asdict(s)
                d["image"] += start
                abs_stats.append(d)
            with open(stream_out + ".refine.json", "w") as fh:
                json.dump({
                    "refine_rounds": refine_rounds,
                    "start_ind": start,
                    "recovered": rec,
                    "certified_idx": sorted(
                        (start + np.nonzero(new_cert)[0]).tolist()
                    ),
                    "stats": abs_stats,
                }, fh, indent=1)
    print(
        f"[{method}] range {start}:{end} clean={res.clean_acc:.4f} "
        f"certified={res.certified_acc:.4f} "
        f"({res.cells_per_sec:,.0f} cells/sec)"
    )
    return res


def run_autoattack(cfg: dict, run_dir: str = ".", max_images=None,
                   attacks=("apgd-ce", "apgd-t", "fab-t", "square"),
                   out_path: Optional[str] = None):
    from .attacks.autoattack import AutoAttackSuite

    model = build_model(cfg)
    params = _restore_params(cfg, model, run_dir)
    ds = _load_cfg_dataset(cfg)
    bs = int(cfg.get("val_batch_size", 512))
    xs, ys = ds.test_x, ds.test_y
    if max_images:
        xs, ys = xs[:max_images], ys[:max_images]

    @jax.jit
    def logits_fn(x):
        return model.output_fn(
            model.solve(params, x, mode="scan").ys[-1], params.get("output")
        )

    # Trip-budget completion guard: the scan integrator executes every
    # budgeted trip (masked once t_final is reached), so callers tune
    # module.max_steps down for attack speed (t_max=0.1 solves take ONE
    # attempt; the old 64-trip default was ~64x masked waste per forward).
    # Masked trips are identity on the state, so a smaller budget is
    # bit-identical — IF integration completes.  Probe the first batch
    # (clean + eps-ball corner) and fail loudly on a too-tight budget
    # instead of silently attacking a truncated solve.
    probe = jnp.asarray(xs[: min(64, len(xs))])
    eps_f = float(cfg.get("eps", 36 / 255))
    probe = jnp.concatenate(
        [probe, jnp.clip(probe + eps_f * jnp.sign(probe - 0.5), 0.0, 1.0)]
    )
    sol = jax.jit(
        lambda p, x: model.solve(p, x, mode="scan")
    )(params, probe)
    attempts = int(sol.n_accepted) + int(sol.n_rejected)
    if attempts >= model.max_steps:
        raise RuntimeError(
            f"solver hit the max_steps={model.max_steps} trip budget "
            f"(attempts={attempts}) on the completion probe — raise "
            "++module.max_steps; attacking a truncated solve would be "
            "unsound"
        )

    n_iter = int(cfg.get("attack_n_iter", 100))
    # 5000 queries = the autoattack package's 'standard' version
    # (reference eval_autoattack.py:51 semantics)
    square_queries = int(cfg.get("attack_square_queries", 5000))
    suite = AutoAttackSuite(
        logits_fn, eps=float(cfg.get("eps", 36 / 255)),
        norm="L2" if str(cfg.get("norm", "2")) in ("2", "L2") else "Linf",
        attacks_to_run=attacks,
        n_iter=n_iter,
        square_queries=square_queries,
    )
    robust_total, n_total = 0, 0
    robust_idx = []
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    for i in range(0, len(xs), bs):
        key, k = jax.random.split(key)
        bx = jnp.asarray(xs[i : i + bs])
        by = jnp.asarray(ys[i : i + bs])
        _, robust = suite.run(bx, by, k)
        robust = np.asarray(robust)
        robust_idx.extend((i + np.nonzero(robust)[0]).tolist())
        robust_total += int(robust.sum())
        n_total += len(bx)
        el = time.time() - t0
        print(
            f"[autoattack] {n_total} imgs, robust acc "
            f"{robust_total/n_total:.4f} ({n_total/max(el,1e-9):.2f} img/s)"
        )
    elapsed = time.time() - t0
    if out_path:
        import json

        with open(out_path, "w") as fh:
            json.dump({
                "attacks": list(attacks),
                "n_iter": n_iter,
                "square_queries": square_queries,
                "eps": float(cfg.get("eps", 36 / 255)),
                "norm": str(cfg.get("norm", "2")),
                "t_max": float(cfg["module"].get("t_max", 1.0)),
                "max_steps": int(model.max_steps),
                "probe_attempts": attempts,
                "n_images": n_total,
                "robust_acc": robust_total / max(n_total, 1),
                # audit trail (reference eval_autoattack.py:79-89 saves
                # robust indices)
                "robust_idx": robust_idx,
                "seconds": elapsed,
                "images_per_sec": n_total / max(elapsed, 1e-9),
            }, fh, indent=2)
    return robust_total / max(n_total, 1)

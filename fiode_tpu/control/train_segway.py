"""Segway safe-controller training: LQR fit + barrier adversarial training.

Rebuild of control/train_segway.py:23-216, TPU-first:

  Phase 1 (:53-67):  fit the MLP controller to the LQR law by MSE on states
    in the Lyapunov band 0.1 <= V <= 0.2 — the reference rejection-samples
    (dynamic shapes); here the rejection is a soft mask inside a jitted step
    (identical objective, static shapes).
  Phase 2 (:96-157): minimise sum relu(Vdot + 0.01) over the banded grid,
    optionally after a 7-step Linf PGD (eps 0.02) on the states; joint Adam
    over controller (lr 0.01) and the Lyapunov matrix P (lr 0.02);
    best-loss checkpointing.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..attacks.pgd import pgd_attack
from ..utils.checkpoint import save_pytree
from .controllers import LinearController, NNController, lqr_gain
from .lyapunov_ctrl import LyaQuadratic
from .samplers import grid_uniform_3d, random_uniform
from .systems import Segway

__all__ = ["SegwayTrainConfig", "train_segway"]


@dataclasses.dataclass
class SegwayTrainConfig:
    adv_train: bool = True
    eps: float = 0.02
    level_lb: float = 0.1
    level_ub: float = 0.2
    region: float = 1.5
    phi_region: float = float(np.pi / 12)
    batch_size: int = 512
    fit_lqr_iters: int = 300
    barrier_iters: int = 300
    grid_r: float = 0.02
    lr_ctrl: float = 0.01
    lr_P: float = 0.02
    margin: float = 0.01
    seed: int = 0
    hidden: int = 32


def train_segway(cfg: SegwayTrainConfig = SegwayTrainConfig(),
                 save_path: Optional[str] = None, verbose: bool = True):
    system = Segway()
    goal = jnp.zeros((1, 3))
    Q = 10.0 * np.eye(3)
    R = np.eye(1)
    K, _ = lqr_gain(system, goal, Q, R)
    lqr = LinearController(K)
    key = jax.random.PRNGKey(cfg.seed)
    key, k_init = jax.random.split(key)
    ctrl = NNController.create(k_init, 3, 1, cfg.hidden)
    lya_P0 = jnp.eye(3)
    sizes = jnp.asarray([cfg.phi_region, cfg.region, cfg.region])

    # ---- phase 1: fit LQR inside the band (masked MSE) ----------------------

    tx1 = optax.adam(cfg.lr_ctrl)
    opt1 = tx1.init(ctrl.params)

    @jax.jit
    def fit_step(params, opt_state, key):
        eta = random_uniform(key, sizes, cfg.batch_size)
        v = LyaQuadratic(lya_P0, goal)(eta)[:, 0]
        mask = ((v >= cfg.level_lb) & (v <= cfg.level_ub)).astype(jnp.float32)

        def loss_fn(p):
            out = ctrl.module.apply({"params": p}, eta)
            tgt = lqr(eta)
            per = jnp.sum((out - tgt) ** 2, axis=-1)
            return jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1.0)

        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt_state = tx1.update(g, opt_state, params)
        return optax.apply_updates(params, up), opt_state, loss

    for i in range(cfg.fit_lqr_iters):
        key, k = jax.random.split(key)
        ctrl.params, opt1, l1 = fit_step(ctrl.params, opt1, k)
    if verbose:
        print(f"[segway] LQR fit loss: {float(l1):.5f}")

    # ---- phase 2: barrier training over the banded grid ---------------------

    grid, *_ = grid_uniform_3d(np.asarray(sizes), np.full(3, cfg.grid_r))
    grid = jnp.asarray(grid)

    train_params = {"ctrl": ctrl.params, "P": lya_P0}
    tx2 = optax.multi_transform(
        {"ctrl": optax.adam(cfg.lr_ctrl), "P": optax.adam(cfg.lr_P)},
        {"ctrl": "ctrl", "P": "P"},
    )
    opt2 = tx2.init(train_params)

    def vdot_model(params, eta):
        lya = LyaQuadratic(params["P"], goal)
        u = ctrl.module.apply({"params": params["ctrl"]}, eta)
        f = system(eta, u)
        return lya.h_dot(eta, f)[:, 0]

    def band_mask(params, eta):
        v = LyaQuadratic(params["P"], goal)(eta)[:, 0]
        return ((v >= cfg.level_lb) & (v <= cfg.level_ub)).astype(jnp.float32)

    @jax.jit
    def barrier_step(params, opt_state, key):
        mask = jax.lax.stop_gradient(band_mask(params, grid))

        if cfg.adv_train:
            def adv_obj(eta):
                return jax.nn.relu(vdot_model(params, eta) + cfg.margin) * mask

            eta_in = pgd_attack(
                adv_obj, grid, key, eps=cfg.eps, norm="Linf", steps=7,
                step_size=2.5 * cfg.eps / 7,
                clip_min=-2 * np.pi, clip_max=2 * np.pi,
            )
            eta_in = jax.lax.stop_gradient(eta_in)
        else:
            eta_in = grid

        def loss_fn(p):
            vd = vdot_model(p, eta_in)
            return jnp.sum(jax.nn.relu(vd + cfg.margin) * mask)

        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt_state = tx2.update(g, opt_state, params)
        params = optax.apply_updates(params, up)
        worst = jnp.max(jnp.where(mask > 0, vdot_model(params, grid), -jnp.inf))
        return params, opt_state, loss, worst

    best_loss, best_params = np.inf, train_params
    for i in range(cfg.barrier_iters):
        key, k = jax.random.split(key)
        train_params, opt2, loss, worst = barrier_step(train_params, opt2, k)
        l = float(loss)
        if l < best_loss:
            best_loss = l
            best_params = jax.tree_util.tree_map(lambda a: a, train_params)
            if verbose and i % 50 == 0:
                print(f"[segway] iter {i}: loss={l:.5f} worst_vdot={float(worst):.5f}")

    result = {
        "ctrl": best_params["ctrl"],
        "P": best_params["P"],
        "config": dataclasses.asdict(cfg),
        "K_lqr": np.asarray(K),
        "best_loss": best_loss,
    }
    if save_path:
        save_pytree(save_path, result)
    if verbose:
        print(f"[segway] best barrier loss: {best_loss:.5f}")
    return result

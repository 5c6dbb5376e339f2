"""PGD adversarial attacks (Linf / L2).

Rebuild of the advertorch LinfPGDAttack / L2PGDAttack usage in training
(pl_modules.py:149-158: 7 steps, eps_iter = 2.5*eps/7, rand_init,
clip [0,1]) and the torchattacks PGD/PGDL2 validation attacks
(pl_modules.py:191-199: 5 steps, alpha = 2.5*eps/10).

The attack maximises an arbitrary per-example objective (the reference
attacks both logits-CE and the Lyapunov violation loss itself via
``compute_loss`` / ``forward_adv``), differentiating through whatever the
objective contains — including the ODE solve (scan-mode odeint).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

__all__ = ["pgd_attack"]


def _l2_normalize(g, eps=1e-12):
    flat = g.reshape(g.shape[0], -1)
    n = jnp.linalg.norm(flat, axis=-1).reshape((-1,) + (1,) * (g.ndim - 1))
    return g / (n + eps)


def _project(x, x0, eps, norm):
    d = x - x0
    if norm == "Linf":
        d = jnp.clip(d, -eps, eps)
    else:  # L2
        flat = d.reshape(d.shape[0], -1)
        n = jnp.linalg.norm(flat, axis=-1)
        scale = jnp.minimum(1.0, eps / jnp.maximum(n, 1e-12))
        d = d * scale.reshape((-1,) + (1,) * (d.ndim - 1))
    return x0 + d


def pgd_attack(
    loss_fn: Callable[[jax.Array], jax.Array],
    x: jax.Array,
    key: jax.Array,
    *,
    eps: float,
    norm: str = "L2",
    steps: int = 7,
    step_size: Optional[float] = None,
    rand_init: bool = True,
    clip_min: float = 0.0,
    clip_max: float = 1.0,
) -> jax.Array:
    """Maximise ``sum(loss_fn(x_adv))`` over the eps-ball around x.

    loss_fn returns per-example losses (summed internally so gradients stay
    per-example independent).
    """
    if step_size is None:
        step_size = 2.5 * eps / steps

    grad_fn = jax.grad(lambda xa: jnp.sum(loss_fn(xa)))

    if rand_init:
        if norm == "Linf":
            delta = jax.random.uniform(key, x.shape, minval=-eps, maxval=eps)
        else:
            k_dir, k_rad = jax.random.split(key)  # independent draws
            d = jax.random.normal(k_dir, x.shape)
            d = _l2_normalize(d)
            r = jax.random.uniform(
                k_rad, (x.shape[0],) + (1,) * (x.ndim - 1)
            )
            delta = d * r * eps
        xa = jnp.clip(x + delta, clip_min, clip_max)
    else:
        xa = x

    def body(i, xa):
        g = grad_fn(xa)
        if norm == "Linf":
            xa = xa + step_size * jnp.sign(g)
        else:
            xa = xa + step_size * _l2_normalize(g)
        xa = _project(xa, x, eps, norm)
        return jnp.clip(xa, clip_min, clip_max)

    return jax.lax.fori_loop(0, steps, body, xa)

"""FAB-T — targeted Fast Adaptive Boundary attack (AutoAttack standard member).

Croce & Hein 2020 ("Minimally distorted adversarial examples with a fast
adaptive boundary attack"), targeted variant: for target class t, iterate

  1. linearize the margin  m(z) = f_t(z) - f_y(z)  at x_i;
  2. project x_i and the original x onto the halfspace  m + <dm, z - x_i> >= 0
     in the chosen norm, clipped to the [0,1] box (this implementation uses
     hyperplane projection followed by box clipping — a documented
     approximation of the exact box-constrained projection);
  3. convex-combine the two projections with the adaptive weight alpha and
     take the extrapolated step (eta = 1.05);
  4. if x_i is adversarial, bias the next iterate toward x (backward step
     beta = 0.9); track the closest adversarial found.

Used for completeness of the 'standard' suite (eval_autoattack.py:51); the
reference's test_step itself runs only APGD-CE/APGD-T.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["fab_targeted"]


def _norms(d, norm):
    flat = d.reshape(d.shape[0], -1)
    if norm == "Linf":
        return jnp.max(jnp.abs(flat), -1)
    return jnp.linalg.norm(flat, axis=-1)


def _dual_steepest(g, norm):
    """Steepest-descent direction scale for the dual norm."""
    flat = g.reshape(g.shape[0], -1)
    if norm == "Linf":
        return jnp.sum(jnp.abs(flat), -1)  # ||g||_1
    return jnp.linalg.norm(flat, axis=-1)


def _project_hyperplane(z, g, b, norm):
    """Project z onto {v : <g, v> + b = 0} in the given norm (then the caller
    clips to the box).  For L2: closed form; for Linf: sign-direction step."""
    B = z.shape[0]
    gz = jnp.sum((g * z).reshape(B, -1), -1)
    viol = gz + b  # want <= 0 after projection
    if norm == "L2":
        denom = jnp.sum((g * g).reshape(B, -1), -1)
        t = viol / jnp.maximum(denom, 1e-12)
        return z - t.reshape((-1,) + (1,) * (z.ndim - 1)) * g
    # Linf: move along -sign(g), magnitude viol / ||g||_1
    denom = _dual_steepest(g, "Linf")
    t = viol / jnp.maximum(denom, 1e-12)
    return z - t.reshape((-1,) + (1,) * (z.ndim - 1)) * jnp.sign(g)


def fab_targeted(
    logits_fn: Callable,
    x: jax.Array,
    y: jax.Array,
    key: jax.Array,
    *,
    eps: float,
    norm: str = "L2",
    n_iter: int = 100,
    n_target_classes: int = 9,
    alpha_max: float = 0.1,
    eta: float = 1.05,
    beta: float = 0.9,
):
    """Returns (x_adv, success): minimal-distortion adversarials within eps."""
    B = x.shape[0]
    bshape = (B,) + (1,) * (x.ndim - 1)
    logits0 = logits_fn(x)
    n_cls = logits0.shape[-1]
    order = jnp.argsort(logits0, -1)[:, ::-1]
    success = jnp.argmax(logits0, -1) != y
    best_adv = x
    best_dist = jnp.where(success, 0.0, jnp.inf)

    def margin_fn(z, y_t):
        lg = logits_fn(z)
        return lg[jnp.arange(B), y_t] - lg[jnp.arange(B), y]

    n_targets = min(n_target_classes, n_cls - 1)
    for tc in range(1, n_targets + 1):
        y_t = order[:, tc]
        y_t = jnp.where(y_t == y, order[:, 0], y_t)
        xi = x

        def body(i, carry):
            xi, best_adv, best_dist = carry
            # per-example margins and grads via ONE forward: jax.vjp's
            # primal output IS margin_fn(xi) — a separate call would pay a
            # third ODE solve per iteration
            mvals, vjp = jax.vjp(lambda z: margin_fn(z, y_t), xi)
            (g,) = vjp(jnp.ones_like(mvals))
            b = mvals - jnp.sum((g * xi).reshape(B, -1), -1)

            # projections of xi and x onto the target hyperplane
            p_i = jnp.clip(_project_hyperplane(xi, -g, -b, norm), 0, 1)
            p_0 = jnp.clip(_project_hyperplane(x, -g, -b, norm), 0, 1)
            d_i = _norms(p_i - xi, norm)
            d_0 = _norms(p_0 - x, norm)
            alpha = jnp.clip(
                d_i / jnp.maximum(d_i + d_0, 1e-12), 0.0, alpha_max
            ).reshape(bshape)
            x_new = jnp.clip(
                (1 - alpha) * (xi + eta * (p_i - xi))
                + alpha * (x + eta * (p_0 - x)),
                0,
                1,
            )
            adv_now = margin_fn(x_new, y_t) > 0
            dist_now = _norms(x_new - x, norm)
            improved = adv_now & (dist_now < best_dist) & (dist_now <= eps)
            best_adv = jnp.where(improved.reshape(bshape), x_new, best_adv)
            best_dist = jnp.where(improved, dist_now, best_dist)
            # backward step toward the original when adversarial
            x_new = jnp.where(
                adv_now.reshape(bshape), beta * x_new + (1 - beta) * x, x_new
            )
            return x_new, best_adv, best_dist

        xi, best_adv, best_dist = jax.lax.fori_loop(
            0, n_iter, body, (xi, best_adv, best_dist)
        )
    success = best_dist <= eps
    return best_adv, success

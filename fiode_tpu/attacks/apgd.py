"""Auto-PGD (APGD) — the core of the AutoAttack suite.

Rebuild of the attacks the reference runs at test time
(pl_modules.py:222-244: AutoAttack(norm='L2', eps=36/255) with
attacks_to_run=['apgd-ce','apgd-t']) and in eval_autoattack.py:51.

Faithful to Croce & Hein 2020 ("Reliable evaluation ..."):
  * checkpoint schedule p0=0, p1=0.22, p_{j+1} = p_j + max(p_j - p_{j-1}
    - 0.03, 0.06), w_j = ceil(p_j * n_iter);
  * momentum update z = P(x_k + eta step), x_{k+1} = P(x_k + alpha (z - x_k)
    + (1 - alpha)(x_k - x_{k-1})), alpha = 0.75;
  * per-example step halving at checkpoints when (a) the success rate since
    the previous checkpoint < rho = 0.75, or (b) step unchanged and best
    loss unchanged; on halving, restart from the best point so far;
  * losses: untargeted cross-entropy ('apgd-ce') and the targeted DLR loss
    ('apgd-t', 9 target classes).

As with the reference, the model's simplex outputs are fed to the attack as
if they were logits (AutoAttack applies softmax-CE / DLR to whatever the
model returns) — gradients flow through the ODE solve via the scan path.
Everything runs as one jitted lax.fori_loop per restart, batched over
examples with per-example step sizes.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["apgd_attack", "apgd_ce", "apgd_targeted", "dlr_loss_targeted"]


def _checkpoints(n_iter: int):
    ps = [0.0, 0.22]
    while ps[-1] < 1.0:
        ps.append(ps[-1] + max(ps[-1] - ps[-2] - 0.03, 0.06))
    ws = sorted({int(-(-p * n_iter // 1)) for p in ps if p <= 1.0})
    return [w for w in ws if 0 < w < n_iter]


def _project(x, x0, eps, norm):
    d = x - x0
    if norm == "Linf":
        d = jnp.clip(d, -eps, eps)
    else:
        flat = d.reshape(d.shape[0], -1)
        nrm = jnp.linalg.norm(flat, axis=-1)
        fac = jnp.minimum(1.0, eps / jnp.maximum(nrm, 1e-12))
        d = d * fac.reshape((-1,) + (1,) * (d.ndim - 1))
    return jnp.clip(x0 + d, 0.0, 1.0)


def _normalize_grad(g, norm):
    if norm == "Linf":
        return jnp.sign(g)
    flat = g.reshape(g.shape[0], -1)
    n = jnp.linalg.norm(flat, axis=-1)
    return g / jnp.maximum(n, 1e-12).reshape((-1,) + (1,) * (g.ndim - 1))


def ce_loss(logits, y):
    return -jax.nn.log_softmax(logits)[jnp.arange(y.shape[0]), y]


def dlr_loss_targeted(logits, y, y_target):
    if logits.shape[-1] < 4:
        # srt[:, -4] would silently CLAMP to srt[:, 0] for n<4, optimizing
        # an undefined objective; the autoattack package refuses DLR below
        # 4 classes the same way (autoattack/autopgd_base.py)
        raise ValueError(
            "targeted DLR loss needs >= 4 classes "
            f"(got {logits.shape[-1]}); drop apgd-t/fab-t for this model"
        )
    srt = jnp.sort(logits, axis=-1)
    z_y = logits[jnp.arange(y.shape[0]), y]
    z_t = logits[jnp.arange(y.shape[0]), y_target]
    denom = srt[:, -1] - 0.5 * (srt[:, -3] + srt[:, -4])
    return -(z_y - z_t) / jnp.maximum(denom, 1e-12)


def apgd_attack(
    logits_fn: Callable[[jax.Array], jax.Array],
    x: jax.Array,
    y: jax.Array,
    key: jax.Array,
    *,
    eps: float,
    norm: str = "L2",
    n_iter: int = 100,
    loss: str = "ce",
    y_target=None,
    rho: float = 0.75,
    alpha_mom: float = 0.75,
):
    """One APGD run.  Returns (x_best, best_loss) where best_loss is the
    maximised objective per example."""
    B = x.shape[0]
    bshape = (B,) + (1,) * (x.ndim - 1)

    if loss == "ce":
        loss_fn = lambda lg: ce_loss(lg, y)
    elif loss == "dlr-targeted":
        assert y_target is not None
        loss_fn = lambda lg: dlr_loss_targeted(lg, y, y_target)
    else:
        raise ValueError(loss)

    def loss_and_grad(xa):
        def obj(xa):
            lv = loss_fn(logits_fn(xa))
            return jnp.sum(lv), lv

        (s, lv), g = jax.value_and_grad(obj, has_aux=True)(xa)
        # a non-finite gradient component (the DLR denominator can reach its
        # 1e-12 floor, overflowing the backward pass; the simplex-QP
        # bisection gradient can 0/0 at saturation) would otherwise turn the
        # NEXT iterate NaN — and the simplex projection maps a NaN input to
        # a finite collapsed state whose loss can read as an "improvement",
        # poisoning x_best with a NaN point.  Zero it: the step degrades to
        # the other components (or pure momentum), which keeps the iterate
        # inside the ball and finite.
        return lv, jnp.where(jnp.isfinite(g), g, 0.0)

    checkpoints = jnp.zeros((n_iter,), bool)
    for w in _checkpoints(n_iter):
        checkpoints = checkpoints.at[w].set(True)

    # init: random start inside the ball
    if norm == "Linf":
        delta = jax.random.uniform(key, x.shape, minval=-eps, maxval=eps)
    else:
        k_dir, k_rad = jax.random.split(key)
        d = jax.random.normal(k_dir, x.shape)
        d = _normalize_grad(d, "L2")
        delta = d * eps * jax.random.uniform(k_rad, bshape)
    x0 = x
    xk = _project(x + delta, x0, eps, norm)
    lv, g = loss_and_grad(xk)
    step = jnp.full(bshape, 2.0 * eps)
    x_prev = xk
    x_best = xk
    f_best = lv
    g_best = g
    f_best_prev_ck = lv
    step_halved_last = jnp.zeros((B,), bool)
    succ_since_ck = jnp.zeros((B,), jnp.int32)
    ck_size = jnp.zeros((), jnp.int32)

    def body(k, carry):
        (xk, x_prev, g, lv, step, x_best, f_best, g_best, f_best_prev_ck,
         step_halved_last, succ_since_ck, ck_size) = carry
        z = _project(xk + step * _normalize_grad(g, norm), x0, eps, norm)
        x_new = _project(
            xk + alpha_mom * (z - xk) + (1 - alpha_mom) * (xk - x_prev),
            x0, eps, norm,
        )
        lv_new, g_new = loss_and_grad(x_new)
        # Croce & Hein condition 1 counts PER-STEP improvements
        # f(x_{k+1}) > f(x_k) (Alg. 1 line 9), not improvements over the
        # running best — the stricter count over-halves step sizes
        succ_since_ck = succ_since_ck + (lv_new > lv).astype(jnp.int32)
        # belt-and-braces vs the NaN-poisoning path above: never promote a
        # non-finite iterate to x_best even if its (finite, collapsed-state)
        # loss reads higher
        x_new_finite = jnp.isfinite(x_new).reshape(B, -1).all(-1)
        improved = (lv_new > f_best) & x_new_finite
        x_best = jnp.where(improved.reshape(bshape), x_new, x_best)
        g_best = jnp.where(improved.reshape(bshape), g_new, g_best)
        f_best = jnp.maximum(f_best, lv_new)
        ck_size = ck_size + 1

        def at_checkpoint(args):
            (step, x_cur, g_cur, lv_cur, f_best, f_best_prev_ck,
             step_halved_last, succ_since_ck, ck_size) = args
            cond1 = succ_since_ck < jnp.ceil(
                rho * ck_size.astype(jnp.float32)
            ).astype(jnp.int32)
            cond2 = (~step_halved_last) & (f_best <= f_best_prev_ck)
            halve = cond1 | cond2
            step = jnp.where(halve.reshape(bshape), step * 0.5, step)
            # restart from the best point where halved, WITH its loss and
            # gradient (the original implementation restores grad_best
            # alongside x_best; stepping along the discarded iterate's
            # gradient from x_best moves in the wrong direction)
            x_cur = jnp.where(halve.reshape(bshape), x_best, x_cur)
            g_cur = jnp.where(halve.reshape(bshape), g_best, g_cur)
            lv_cur = jnp.where(halve, f_best, lv_cur)
            return (step, x_cur, g_cur, lv_cur, f_best, f_best, halve,
                    jnp.zeros_like(succ_since_ck), jnp.zeros_like(ck_size))

        (step, x_new, g_new, lv_new, f_best, f_best_prev_ck,
         step_halved_last, succ_since_ck, ck_size) = jax.lax.cond(
            checkpoints[k],
            at_checkpoint,
            lambda a: a,
            (step, x_new, g_new, lv_new, f_best, f_best_prev_ck,
             step_halved_last, succ_since_ck, ck_size),
        )
        return (x_new, xk, g_new, lv_new, step, x_best, f_best, g_best,
                f_best_prev_ck, step_halved_last, succ_since_ck, ck_size)

    carry = (xk, x_prev, g, lv, step, x_best, f_best, g_best,
             f_best_prev_ck, step_halved_last, succ_since_ck, ck_size)
    carry = jax.lax.fori_loop(1, n_iter, body, carry)
    return carry[5], carry[6]


def apgd_ce(logits_fn, x, y, key, *, eps, norm="L2", n_iter=100, n_restarts=1):
    """Untargeted APGD-CE; keeps the first successful adversarial per
    example across restarts (else the best-loss point)."""
    x_adv = x
    success = jnp.argmax(logits_fn(x), -1) != y
    for r in range(n_restarts):
        key, k = jax.random.split(key)
        xb, _ = apgd_attack(
            logits_fn, x, y, k, eps=eps, norm=norm, n_iter=n_iter, loss="ce"
        )
        now = jnp.argmax(logits_fn(xb), -1) != y
        take = now & ~success
        x_adv = jnp.where(take.reshape((-1,) + (1,) * (x.ndim - 1)), xb, x_adv)
        success = success | now
    return x_adv, success


def apgd_targeted(
    logits_fn, x, y, key, *, eps, norm="L2", n_iter=100, n_target_classes=9
):
    """APGD-T: DLR loss against each of the top-k other classes.

    All target runs execute as ONE vmapped program (a (targets, batch)
    fold) instead of the reference autoattack's sequential per-target
    loop — the per-example winner is the first successful target in
    priority order, matching the sequential semantics."""
    logits_clean = logits_fn(x)
    n_cls = logits_clean.shape[-1]
    order = jnp.argsort(logits_clean, axis=-1)[:, ::-1]  # descending
    success0 = jnp.argmax(logits_clean, -1) != y
    n_targets = min(n_target_classes, n_cls - 1)
    y_ts = []
    for t in range(1, n_targets + 1):
        y_t = order[:, t]
        # if target == y (when y is not top-1) fall to the top class instead
        y_ts.append(jnp.where(y_t == y, order[:, 0], y_t))
    y_ts = jnp.stack(y_ts)  # (T, B)
    keys = jax.random.split(key, n_targets)

    def run_one(y_t, k):
        xb, _ = apgd_attack(
            logits_fn, x, y, k, eps=eps, norm=norm, n_iter=n_iter,
            loss="dlr-targeted", y_target=y_t,
        )
        succ = jnp.argmax(logits_fn(xb), -1) != y
        return xb, succ

    xbs, succ_t = jax.vmap(run_one)(y_ts, keys)  # (T, B, ...), (T, B)
    any_succ = jnp.any(succ_t, axis=0)
    first = jnp.argmax(succ_t, axis=0)  # first successful target
    x_pick = xbs[first, jnp.arange(x.shape[0])]
    take = any_succ & ~success0
    x_adv = jnp.where(take.reshape((-1,) + (1,) * (x.ndim - 1)), x_pick, x)
    return x_adv, success0 | any_succ

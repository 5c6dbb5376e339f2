"""Lyapunov candidate functions V(h, y) and the certified-training loss.

Candidates rebuild lya_cands.py:5-93 (all per-sample, reduction='none'):
  cross_entropy / mse / one_minus_eta_y / composite_cross_entropy /
  decision_boundary (the headline margin candidate: 1 + max_wrong - p_y).

The loss core rebuilds LyapunovLearning.compute_loss (pl_modules.py:390-502):
V and Vdot = <grad V, f> are obtained with ONE `jax.jvp` of the candidate
along the projected dynamics — the native-JAX formulation of the reference's
torch.autograd.functional.jvp gymnastics (:403-421); kappa annealing in
global step (:447-450), Lipschitz-aware kappa (:437-445), the
relax_exp_stable margin clamp (:452-455), relu/elu/identity violation
activations (:456-461), the optional barrier loss on the raw MLP vs the
*linear* barrier box (:467-473), and the diagnostics
(effective_batch_size, mean_active_constraints, :463-483).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["get_lya_candidate", "lyapunov_loss", "LyapunovMetrics"]

_EPS = 1e-12


def _logc(x):
    return jnp.log(jnp.clip(x, _EPS))


def cross_entropy(probs, y, n):
    """DynCrossEntropy(on_simplex=True): -log p_y (lya_cands.py:5-18)."""
    return -_logc(jnp.take_along_axis(probs, y[:, None], axis=-1)[:, 0])


def mse(probs, y, n):
    """MSELoss vs one-hot, per-element mean (lya_cands.py:20-28)."""
    onehot = jax.nn.one_hot(y, n, dtype=probs.dtype)
    return jnp.mean((probs - onehot) ** 2, axis=-1)


def one_minus_eta_y(probs, y, n):
    """OnemEtay(on_simplex=True): nll on raw probs = -p_y (lya_cands.py:31-44).

    (With h on the simplex this is p_y-affine: V = -p_y; the '1 +' shift the
    name suggests is irrelevant to Vdot.)"""
    return -jnp.take_along_axis(probs, y[:, None], axis=-1)[:, 0]


def composite_cross_entropy_l1(probs, y, n):
    """CompositeDynCrossEntropy L1 (lya_cands.py:46-70)."""
    p_y = jnp.take_along_axis(probs, y[:, None], axis=-1)[:, 0]
    loss_tmp = -jnp.sum(_logc(1 - probs), axis=-1)
    mod = _logc(1 - p_y) - _logc(p_y)
    return (loss_tmp + mod) / probs.shape[-1]


def composite_cross_entropy_l2(probs, y, n):
    p_y = jnp.take_along_axis(probs, y[:, None], axis=-1)[:, 0]
    lt = -_logc(1 - probs)
    mod = -_logc(1 - p_y) ** 2 + _logc(p_y) ** 2
    return (jnp.sum(lt * lt, axis=-1) + mod) / probs.shape[-1]


def decision_boundary(probs, y, n, log_mode: bool = False):
    """The margin candidate: V = 1 + max_{j != y} p_j - p_y
    (lya_cands.py:72-93).  V < 1 iff classified correctly."""
    p_y = jnp.take_along_axis(probs, y[:, None], axis=-1)[:, 0]
    onehot = jax.nn.one_hot(y, n, dtype=bool)
    wrong = jnp.where(onehot, -jnp.inf, probs)
    max_wrong = jnp.max(wrong, axis=-1)
    v = 1.0 + max_wrong - p_y
    return jnp.log(v) if log_mode else v


def get_lya_candidate(name: str, n: int, **kw) -> Callable:
    table = {
        "DynCrossEntropy": cross_entropy,
        "MSELoss": mse,
        "OnemEtay": one_minus_eta_y,
        "CompositeDynCrossEntropy": (
            composite_cross_entropy_l2
            if kw.get("norm_type", "L1") == "L2"
            else composite_cross_entropy_l1
        ),
        "DecisionBoundary": lambda p, y, n: decision_boundary(
            p, y, n, log_mode=kw.get("log_mode", False)
        ),
    }
    fn = table[name]
    return lambda probs, y: fn(probs, y, n)


class LyapunovMetrics(NamedTuple):
    loss: jax.Array
    monte_carlo_loss: jax.Array
    barrier_loss: jax.Array
    kappa: jax.Array
    effective_batch_size: jax.Array
    mean_active_constraints: jax.Array
    mean_v: jax.Array
    mean_vdot: jax.Array


def anneal_kappa(step, kappa, kappa_length):
    """Linear kappa annealing in global step (pl_modules.py:447-450)."""
    if kappa_length <= 0:
        return jnp.asarray(kappa, jnp.float32)
    frac = jnp.minimum(step.astype(jnp.float32) / float(kappa_length), 1.0)
    return frac * kappa


def lips_kappa(step, kappa, kappa_length, eps, Lfx, lips_warmup):
    """Lipschitz-aware kappa: max(eps_t * sqrt(2) * Lfx, kappa) + 1 with a
    linear eps ramp after lips_warmup steps (pl_modules.py:437-445)."""
    stepf = step.astype(jnp.float32)
    length = jnp.maximum(float(kappa_length), 1.0)
    ramp = jnp.clip((stepf - lips_warmup) / length, 0.0, 1.0)
    current_eps = ramp * eps
    return jnp.maximum(current_eps * jnp.sqrt(2.0) * Lfx, kappa) + 1.0


def lyapunov_loss(
    *,
    h,  # (N, n) sampled states
    f,  # (N, n) projected dynamics at h
    f_tilde,  # (N, n) raw (unprojected) dynamics, for the barrier loss; or None
    y,  # (N,) labels aligned with h
    lya_cand: Callable,  # V(probs, y) -> (N,)
    output_fn: Callable,  # h -> probs
    current_kappa,  # scalar (already annealed)
    alpha_1: float,
    alpha_2: float,
    act: str = "relu",
    relax_exp_stable: bool = False,
    scale_l_eps: float = 3.0,
    eps: float = 36 / 255,
    barrier_loss: bool = False,
) -> tuple[jax.Array, LyapunovMetrics]:
    """Monte-Carlo certified-training loss: mean act(Vdot + kappa * V)."""
    v, vdot = jax.jvp(lambda h_: lya_cand(output_fn(h_), y), (h,), (f,))

    margin = current_kappa * jax.lax.stop_gradient(v)
    if relax_exp_stable:
        margin = jnp.minimum(margin, scale_l_eps * alpha_1 * eps)

    z = vdot + margin
    if act == "relu":
        violations = jax.nn.relu(z)
    elif act == "elu":
        violations = jax.nn.elu(z)
    else:
        violations = z

    mc_loss = jnp.mean(violations)
    eff_bs = jnp.sum(violations > 0)

    # diagnostics: fraction of coordinates sitting on the (linear) barrier
    # (pl_modules.py:474-483 uses the linear bounds for this probe)
    lower_lin = -alpha_1 * h
    upper_lin = alpha_2 * (1.0 - h)
    fd = jax.lax.stop_gradient(f)
    active = (jnp.abs(fd - lower_lin) <= 1e-6) | (jnp.abs(fd - upper_lin) <= 1e-6)
    mean_active = jnp.mean(active.astype(jnp.float32))

    # NOTE: the reference computes and *logs* the barrier loss but never adds
    # it to the training objective (pl_modules.py:466-473) — we reproduce
    # that: it is a diagnostic.
    if barrier_loss and f_tilde is not None:
        b_loss = 100.0 * jnp.mean(jax.nn.relu(f_tilde - upper_lin)) + jnp.mean(
            jax.nn.relu(lower_lin - f_tilde)
        )
    else:
        b_loss = jnp.zeros(())
    loss = mc_loss

    metrics = LyapunovMetrics(
        loss=loss,
        monte_carlo_loss=mc_loss,
        barrier_loss=b_loss,
        kappa=jnp.asarray(current_kappa, jnp.float32),
        effective_batch_size=eff_bs,
        mean_active_constraints=mean_active,
        mean_v=jnp.mean(v),
        mean_vdot=jnp.mean(vdot),
    )
    return loss, metrics

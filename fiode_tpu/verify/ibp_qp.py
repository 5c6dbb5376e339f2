"""Interval propagation through the barrier projection QP and the
scale-nominal sigmoid, plus the worst-case Vdot for the margin candidate.

Rebuild of the reference's certification-side nonlinear pieces
(dynamics/classification.py:175-278 and certify_crown.py:29-34,140-153):

  * ``ibp_sigmoid`` — bounds of (upper-lower)*sigmoid(f)+lower over the cell
    box, using monotonicity of both factors (:175-181);
  * ``ibp_cbf_qp`` — per-coordinate worst-case bounds of the projected
    dynamics: for coordinate i, the adversarial box corner *swaps the i-th
    diagonal* (h_i at its far end, other coordinates at the end that pushes
    the budget against coordinate i), then one QP solve per (cell, i)
    (:208-242).  Here the n QPs per cell are one batched, vmapped solve —
    (cells * n) rows through the fixed-iteration bisection kernel;
  * ``worst_case_vdot`` — -f_y^lb + max over the runner-up set of f^ub,
    with the runner-up set widened by 2 eps (certify_crown.py:143-153).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.simplex_qp import simplex_box_project, simplex_cone_project

__all__ = [
    "ibp_sigmoid",
    "ibp_cbf_qp",
    "ibp_cbf_qp_band",
    "ibp_cbf_qp_individual",
    "worst_case_vdot",
]


def ibp_sigmoid(f_lb, f_ub, h_lb, h_ub, alpha_1, sigma_1, alpha_2):
    """Bounds of (upper(h) - lower(h)) * sigmoid(f) + lower(h).

    upper - lower is positive and monotonically decreasing in h; lower is
    decreasing in h; sigmoid increasing in f (reference ibp_sigmoid).
    """
    lower_lb = -alpha_1 * (jnp.exp(sigma_1 * h_ub) - 1.0)
    lower_ub = -alpha_1 * (jnp.exp(sigma_1 * h_lb) - 1.0)
    out_lb = (alpha_2 * (1.0 - h_ub) - lower_lb) * jax.nn.sigmoid(f_lb) + lower_lb
    out_ub = (alpha_2 * (1.0 - h_lb) - lower_ub) * jax.nn.sigmoid(f_ub) + lower_ub
    return out_lb, out_ub


def ibp_cbf_qp_band(
    h_lb, h_ub, lb, ub, alpha_1, sigma_1, alpha_2, *, with_upper=False,
    qp_iters=30,
):
    """Worst-case per-coordinate bounds of QP(lower(h'), f~') over an
    explicit box [h_lb, h_ub] (the reference's ``ibp_cbf_qp_band``,
    dynamics/classification.py:244-278).

    Args:
      h_lb/h_ub: (N, n) per-cell state box (a band certificate feeds CROWN
        bounds of h itself here instead of center +- eps).
      lb/ub: (N, n) bounds of the raw dynamics f~ over the box (from CROWN).
      with_upper: also constrain with the upper barrier; the reference's
        ``upper=True`` branch switches to the LINEAR lower barrier
        -alpha_1 * h (classification.py:219-223,259-263) — the two-sided QP
        belongs to the linear-barrier dynamics variant.

    Returns (f_lb, f_ub), each (N, n): bounds of the *projected* dynamics.
    """
    N, n = h_lb.shape
    eye = jnp.eye(n, dtype=bool)

    # (N, n, n): row i = the box corner adversarial for coordinate i
    h_minus = h_lb[:, None, :]
    h_plus = h_ub[:, None, :]
    # for f_i's LOWER bound: h_j at low end except h_i at high end
    h_for_lb = jnp.where(eye[None], h_plus, h_minus)
    # for f_i's UPPER bound: h_j at high end except h_i at low end
    h_for_ub = jnp.where(eye[None], h_minus, h_plus)

    if with_upper:
        lower_lb = -alpha_1 * h_for_lb
        lower_ub = -alpha_1 * h_for_ub
    else:
        lower_lb = -alpha_1 * (jnp.exp(sigma_1 * h_for_lb) - 1.0)
        lower_ub = -alpha_1 * (jnp.exp(sigma_1 * h_for_ub) - 1.0)

    # nominal: for f_i lower bound, f~_i at its lb, others at ub (push the
    # shared budget away from i); vice versa for the upper bound.
    f_for_lb = jnp.where(eye[None], lb[:, None, :], ub[:, None, :])
    f_for_ub = jnp.where(eye[None], ub[:, None, :], lb[:, None, :])

    flat = lambda a: a.reshape(N * n, n)
    # unroll=True: the bisection fuses into one elementwise kernel — the
    # rolled while-op's per-iteration overhead dominated the whole
    # certification sweep (3x) at these row counts.  FIODE_QP_METHOD /
    # FIODE_QP_EXACT swap the cone bisection for a closed-form rank-rule
    # mu (exact to fp rounding, so never less sound); the two-sided box
    # solver (linear-barrier variant only) has no exact form here and
    # keeps bisecting.
    from ..ops.simplex_qp import qp_method_from_env
    method = qp_method_from_env()
    if with_upper:
        upper_lb = alpha_2 * (1.0 - h_for_lb)
        upper_ub = alpha_2 * (1.0 - h_for_ub)
        v_lb = simplex_box_project(
            flat(lower_lb), flat(upper_lb), flat(f_for_lb), qp_iters, True
        )
        v_ub = simplex_box_project(
            flat(lower_ub), flat(upper_ub), flat(f_for_ub), qp_iters, True
        )
    else:
        v_lb = simplex_cone_project(
            flat(lower_lb), flat(f_for_lb), qp_iters, True, method
        )
        v_ub = simplex_cone_project(
            flat(lower_ub), flat(f_for_ub), qp_iters, True, method
        )

    idx = jnp.arange(n)
    f_lb = v_lb.reshape(N, n, n)[:, idx, idx]
    f_ub = v_ub.reshape(N, n, n)[:, idx, idx]
    return f_lb, f_ub


def ibp_cbf_qp(
    h, eps, lb, ub, alpha_1, sigma_1, alpha_2, *, with_upper=False, qp_iters=30
):
    """Worst-case per-coordinate bounds of QP(lower(h'), f~') over the
    center +- eps box (the reference's ``ibp_cbf_qp``,
    dynamics/classification.py:208-242) — the band form with h +- eps."""
    return ibp_cbf_qp_band(
        h - eps, h + eps, lb, ub, alpha_1, sigma_1, alpha_2,
        with_upper=with_upper, qp_iters=qp_iters,
    )


def ibp_cbf_qp_individual(
    h, eps, lb, ub, alpha_1, sigma_1, alpha_2, qp_iters=30
):
    """Two-sided linear-barrier variant (``ibp_cbf_qp_individual``,
    dynamics/classification.py:183-207).

    The reference loops one QP per coordinate on a single cell with the
    LINEAR barrier pair lower=-alpha_1 h', upper=alpha_2 (1-h') and the
    two-sided solver; this is the batched equivalent (the n-per-cell loop
    becomes one (N*n)-row solve).  sigma_1 is accepted for signature
    symmetry but unused (linear barrier).
    """
    del sigma_1
    return ibp_cbf_qp_band(
        h - eps, h + eps, lb, ub, alpha_1, 0.0, alpha_2,
        with_upper=True, qp_iters=qp_iters,
    )


def worst_case_vdot(eta, eps, f_lb, f_ub, label):
    """Upper bound of Vdot for V = 1 + max_wrong - p_y over the cell.

    runner-up set: every wrong coordinate that could be the argmax
    somewhere in the box — eta_j + eps_j >= max_wrong_k (eta_k - eps_k)
    (the runner-up may change under perturbation; certify_crown.py:143-148).
    With the uniform scalar eps this reduces to the reference's
    eta_j >= max_wrong - 2 eps form (kept verbatim so scalar-eps
    certificates stay bit-identical); per-dim (N, n) eps uses the general
    form for the BaB refinement's anisotropic sub-boxes.
    Vdot_ub = -f_label^lb + max_{runner-up} f^ub (certify_crown.py:29-34).
    """
    n = eta.shape[-1]
    onehot = jax.nn.one_hot(label, n, dtype=bool)
    if jnp.ndim(eps) == 0:
        wrong = jnp.where(onehot, -jnp.inf, eta)
        max_wrong = jnp.max(wrong, axis=-1, keepdims=True)
        runner_up = (eta >= max_wrong - 2.0 * eps) & ~onehot
    else:
        wrong_lo = jnp.where(onehot, -jnp.inf, eta - eps)
        max_lo = jnp.max(wrong_lo, axis=-1, keepdims=True)
        runner_up = (eta + eps >= max_lo) & ~onehot
    f_y_lb = jnp.sum(jnp.where(onehot, f_lb, 0.0), axis=-1)
    f_wrong_ub = jnp.max(jnp.where(runner_up, f_ub, -jnp.inf), axis=-1)
    return -f_y_lb + f_wrong_ub

"""Adaptive/fixed-step ODE integration on XLA-friendly control flow.

TPU-native rebuild of the torchdiffeq `odeint` capability used by the
reference (FI-ODE models.py:221-241, pl_modules.py:18-35):

  * batch-global adaptive step control: the error norm is an RMS over the
    *entire* state tensor (all batch rows share one step size), matching
    torchdiffeq semantics so NFE counts and solutions are comparable at
    rtol=atol=1e-3.
  * Hairer-style first-step selection, I-controller with safety=0.9,
    ifactor=10, dfactor=0.2, exponent 1/order.
  * two execution modes sharing one step kernel:
      - ``while``: `lax.while_loop` — fastest, for inference/certification
        (not reverse-differentiable).
      - ``scan``:  bounded `lax.scan` over ``max_steps`` with masked
        accept/reject — reverse-mode differentiable (discrete backprop
        through the solver, the reference's training default
        use_adjoint=False).
  * dense output at requested ``ts`` by cubic Hermite interpolation between
    accepted steps (torchdiffeq uses a same-order quartic fit).  NOTE:
    interior-point accuracy is O(h^4) of the SOLVER'S step size, which the
    controller picks for endpoint tolerance, not output density — a
    high-order solver taking large steps can interpolate interior points
    one to two orders of magnitude above the integration tolerance
    (measured: dopri8 at rtol 1e-3, interior error up to ~5e-2 vs 6e-5 at
    the endpoint).  For tolerance-grade trajectories use a lower-order
    solver (smaller h) or tighter rtol.

States are single jnp arrays (the framework's ODE states are simplex
tensors); wrap pytrees with `jax.flatten_util.ravel_pytree` if needed.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .tableaus import FIXED_SOLVERS, Tableau, get_tableau

__all__ = ["odeint", "OdeSolution", "rms_error_ratio"]

SAFETY = 0.9
IFACTOR = 10.0
DFACTOR = 0.2


class OdeSolution(NamedTuple):
    ys: jax.Array  # (len(ts), *y0.shape)
    nfe: jax.Array  # scalar int32: number of RHS evaluations
    n_accepted: jax.Array
    n_rejected: jax.Array


def rms_error_ratio(err, rtol, atol, y0, y1, weight=None):
    """torchdiffeq error ratio: rms(err / (atol + rtol*max(|y0|,|y1|))).

    ``weight`` (optional, same shape as err, 0/1) restricts the norm to a
    sub-state — the torchdiffeq "seminorm" adjoint option that excludes
    parameter adjoints from step control (reference models.py:231).
    """
    scale = atol + rtol * jnp.maximum(jnp.abs(y0), jnp.abs(y1))
    r = err / scale
    if weight is None:
        return jnp.sqrt(jnp.mean(r * r))
    w = weight.astype(r.dtype)
    return jnp.sqrt(jnp.sum(w * r * r) / jnp.maximum(jnp.sum(w), 1.0))


def _rk_step(tab: Tableau, f, t0, y0, f0, h, args):
    """One explicit RK step.  Returns (y1, f1, err_est, y_mid_unused)."""
    s = len(tab.b)
    c = jnp.asarray(tab.c, y0.dtype)
    a = jnp.asarray(tab.a, y0.dtype)
    b = jnp.asarray(tab.b, y0.dtype)

    ks = [f0]
    for i in range(1, s):
        yi = y0
        for j in range(i):
            aij = tab.a[i, j]
            if aij != 0.0:
                yi = yi + (h * a[i, j]) * ks[j]
        ks.append(f(t0 + c[i] * h, yi, args))
    k = jnp.stack(ks)  # (s, *y.shape)

    y1 = y0 + h * jnp.tensordot(b, k, axes=1)
    f1 = ks[-1] if tab.fsal else None

    if tab.dop853_err:
        e5 = jnp.asarray(tab.err5, y0.dtype)
        e3 = jnp.asarray(tab.err3, y0.dtype)
        err5 = h * jnp.tensordot(e5, k, axes=1)
        err3 = h * jnp.tensordot(e3, k, axes=1)
        # standard DOP853 combined estimate
        d5 = jnp.sqrt(jnp.mean(err5 * err5))
        d3 = jnp.sqrt(jnp.mean(err3 * err3))
        denom = jnp.sqrt(d5 * d5 + 0.01 * d3 * d3)
        err = err5 * (d5 / jnp.maximum(denom, 1e-30))
    elif tab.err is not None:
        e = jnp.asarray(tab.err, y0.dtype)
        err = h * jnp.tensordot(e, k, axes=1)
    else:
        err = None
    return y1, f1, err


def _initial_step(f, t0, y0, f0, order, rtol, atol, args, weight=None):
    """Hairer/Wanner first-step heuristic (torchdiffeq _select_initial_step)."""
    scale = atol + jnp.abs(y0) * rtol

    def wrms(r):
        if weight is None:
            return jnp.sqrt(jnp.mean(r * r))
        w = weight.astype(r.dtype)
        return jnp.sqrt(jnp.sum(w * r * r) / jnp.maximum(jnp.sum(w), 1.0))

    d0 = wrms(y0 / scale)
    d1 = wrms(f0 / scale)
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
    y1 = y0 + h0 * f0
    f1 = f(t0 + h0, y1, args)
    d2 = wrms((f1 - f0) / scale) / h0
    dmax = jnp.maximum(d1, d2)
    h1 = jnp.where(
        dmax <= 1e-15,
        jnp.maximum(1e-6, h0 * 1e-3),
        (0.01 / dmax) ** (1.0 / (order + 1)),
    )
    return jnp.minimum(100.0 * h0, h1)


def _next_step_size(h, error_ratio, order):
    """torchdiffeq _optimal_step_size, branchless."""
    exponent = 1.0 / order
    dfactor = jnp.where(error_ratio < 1.0, 1.0, DFACTOR)
    factor = jnp.minimum(
        IFACTOR,
        jnp.maximum(SAFETY / jnp.maximum(error_ratio, 1e-10) ** exponent, dfactor),
    )
    return jnp.where(error_ratio == 0.0, h * IFACTOR, h * factor)


def _hermite(t, t0, y0, f0, t1, y1, f1):
    """Cubic Hermite interpolant on [t0, t1] evaluated at t."""
    h = t1 - t0
    h = jnp.where(h == 0, 1.0, h)
    s = (t - t0) / h
    s2, s3 = s * s, s * s * s
    h00 = 2 * s3 - 3 * s2 + 1
    h10 = s3 - 2 * s2 + s
    h01 = -2 * s3 + 3 * s2
    h11 = s3 - s2
    return h00 * y0 + (h10 * h) * f0 + h01 * y1 + (h11 * h) * f1


# ---------------------------------------------------------------------------
# Adaptive integration — while_loop mode (inference / certification)
# ---------------------------------------------------------------------------


def _integrate_adaptive_while(tab, f, y0, ts, rtol, atol, args, max_steps, error_weight=None):
    n_out = ts.shape[0]
    t0 = ts[0]
    f0 = f(t0, y0, args)
    h0 = _initial_step(f, t0, y0, f0, tab.order, rtol, atol, args, error_weight)
    t_final = ts[-1]

    ys = jnp.zeros((n_out,) + y0.shape, y0.dtype)
    ys = ys.at[0].set(y0)

    # carry: t, y, fval, h, ys, out_idx, nfe, nacc, nrej, steps
    def cond(c):
        (_, _, _, _, _, out_idx, _, _, _, steps) = c
        return (out_idx < n_out) & (steps < max_steps)

    def body(c):
        t, y, fval, h, ys, out_idx, nfe, nacc, nrej, steps = c
        h = jnp.minimum(h, t_final - t)
        y1, f1, err = _rk_step(tab, f, t, y, fval, h, args)
        ratio = rms_error_ratio(err, rtol, atol, y, y1, error_weight)
        accept = ratio <= 1.0
        t_new = jnp.where(accept, t + h, t)
        if tab.fsal:
            f_new0 = f1
            nfe_step = jnp.asarray(len(tab.b) - 1, jnp.int32)
        else:
            # non-FSAL: the next step's first stage f(t1, y1) is only needed
            # (and only counted) on acceptance — a rejected step retries from
            # the unchanged (t, y, fval) (torchdiffeq accept/reject
            # semantics)
            f_new0 = jax.lax.cond(
                accept, lambda: f(t + h, y1, args), lambda: fval
            )
            nfe_step = len(tab.b) - 1 + accept.astype(jnp.int32)
        y_new = jnp.where(accept, y1, y)
        f_new = jnp.where(accept, f_new0, fval)
        h_new = _next_step_size(h, ratio, tab.order)

        # fill all requested output points inside (t, t_new]
        def fill_cond(s):
            ys_, idx = s
            return (idx < n_out) & (ts[jnp.minimum(idx, n_out - 1)] <= t_new)

        def fill_body(s):
            ys_, idx = s
            ti = ts[idx]
            yi = _hermite(ti, t, y, fval, t_new, y1, f_new0)
            ys_ = ys_.at[idx].set(yi)
            return ys_, idx + 1

        ys, out_idx = jax.lax.cond(
            accept,
            lambda s: jax.lax.while_loop(fill_cond, fill_body, s),
            lambda s: s,
            (ys, out_idx),
        )
        return (
            t_new,
            y_new,
            f_new,
            h_new,
            ys,
            out_idx,
            nfe + nfe_step,
            nacc + accept.astype(jnp.int32),
            nrej + (1 - accept.astype(jnp.int32)),
            steps + 1,
        )

    init = (
        t0,
        y0,
        f0,
        h0,
        ys,
        jnp.asarray(1, jnp.int32),
        jnp.asarray(2, jnp.int32),  # f0 + initial-step probe
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
    )
    (_, y_fin, _, _, ys, out_idx, nfe, nacc, nrej, _) = jax.lax.while_loop(
        cond, body, init
    )
    # If max_steps ran out (or the controller stalled on a NaN ratio)
    # before ts[-1], the remaining output slots were never filled: clamp
    # them to the last reached state — the same partial-solution semantics
    # as scan mode — instead of leaking the jnp.zeros init as fake states.
    unfilled = (
        jnp.arange(n_out) >= out_idx
    ).reshape((n_out,) + (1,) * y0.ndim)
    ys = jnp.where(unfilled, y_fin, ys)
    return OdeSolution(ys, nfe, nacc, nrej)


# ---------------------------------------------------------------------------
# Adaptive integration — bounded scan mode (reverse-differentiable)
# ---------------------------------------------------------------------------


def _integrate_adaptive_scan(tab, f, y0, ts, rtol, atol, args, max_steps, error_weight=None):
    t0 = ts[0]
    t_final = ts[-1]
    f0 = f(t0, y0, args)
    h0 = _initial_step(f, t0, y0, f0, tab.order, rtol, atol, args, error_weight)

    def step(carry, _):
        t, y, fval, h, nfe, nacc, nrej = carry
        done = t >= t_final
        h_eff = jnp.minimum(h, t_final - t)
        h_eff = jnp.maximum(h_eff, 1e-12)
        y1, f1, err = _rk_step(tab, f, t, y, fval, h_eff, args)
        ratio = rms_error_ratio(err, rtol, atol, y, y1, error_weight)
        accept = (ratio <= 1.0) & ~done
        t_new = jnp.where(accept, t + h_eff, t)
        if tab.fsal:
            f_acc = f1
            nfe_step = jnp.asarray(len(tab.b) - 1, jnp.int32)
        else:
            # as in while mode: f(t1, y1) only on acceptance (scan mode keeps
            # both branches traced for reverse-mode, so compute-and-select)
            f_acc = f(t + h_eff, y1, args)
            nfe_step = len(tab.b) - 1 + accept.astype(jnp.int32)
        y_new = jnp.where(accept, y1, y)
        f_new = jnp.where(accept, f_acc, fval)
        h_next = jnp.where(done, h, _next_step_size(h_eff, ratio, tab.order))
        nfe = nfe + jnp.where(done, 0, nfe_step)
        out = (t, t_new, y, y_new, fval, f_acc, accept)
        return (
            t_new,
            y_new,
            f_new,
            h_next,
            nfe,
            nacc + accept.astype(jnp.int32),
            nrej + ((~accept) & (~done)).astype(jnp.int32),
        ), out

    init = (
        t0,
        y0,
        f0,
        h0,
        jnp.asarray(2, jnp.int32),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
    )
    (tN, yN, _, _, nfe, nacc, nrej), hist = jax.lax.scan(
        step, init, None, length=max_steps
    )
    t_lo, t_hi, y_lo, y_hi, f_lo, f_hi, accepted = hist

    # interpolate every requested output time from the step that brackets it
    def interp_one(ti):
        # segment index: the accepted step with t_lo < ti <= t_hi (first match)
        inside = accepted & (t_lo < ti) & (ti <= t_hi)
        any_inside = jnp.any(inside)
        idx = jnp.argmax(inside)
        yi = _hermite(
            ti, t_lo[idx], y_lo[idx], f_lo[idx], t_hi[idx], y_hi[idx], f_hi[idx]
        )
        # ti == t0 (or before the first step) -> y0; past tN -> yN
        yi = jnp.where(any_inside, yi, jnp.where(ti <= t0, y0, yN))
        return yi

    ys = jax.vmap(interp_one)(ts)
    return OdeSolution(ys, nfe, nacc, nrej)


# ---------------------------------------------------------------------------
# Adaptive integration — chunked mode: while_loop over blocks of K masked
# steps.  Data-dependent predicates are only evaluated every K steps, which
# matters on backends where each while-iteration predicate costs a host
# round trip (e.g. remote TPU relays); on native hardware it is within
# noise of 'while' mode.  Endpoint output only (ts = [t0, t_final]).
# ---------------------------------------------------------------------------


def _integrate_adaptive_chunked(
    tab, f, y0, ts, rtol, atol, args, max_steps, error_weight=None, block=8
):
    assert ts.shape[0] == 2, "chunked mode supports ts=[t0, t_final] only"
    t0 = ts[0]
    t_final = ts[-1]
    f0 = f(t0, y0, args)
    h0 = _initial_step(f, t0, y0, f0, tab.order, rtol, atol, args, error_weight)

    def one_step(carry, _):
        t, y, fval, h, nfe, nacc, nrej = carry
        done = t >= t_final
        h_eff = jnp.maximum(jnp.minimum(h, t_final - t), 1e-12)
        y1, f1, err = _rk_step(tab, f, t, y, fval, h_eff, args)
        ratio = rms_error_ratio(err, rtol, atol, y, y1, error_weight)
        accept = (ratio <= 1.0) & ~done
        t_new = jnp.where(accept, t + h_eff, t)
        if tab.fsal:
            f_acc = f1
            nfe_step = jnp.asarray(len(tab.b) - 1, jnp.int32)
        else:
            f_acc = jax.lax.cond(
                accept, lambda: f(t + h_eff, y1, args), lambda: fval
            )
            nfe_step = len(tab.b) - 1 + accept.astype(jnp.int32)
        y_new = jnp.where(accept, y1, y)
        f_new = jnp.where(accept, f_acc, fval)
        h_next = jnp.where(done, h, _next_step_size(h_eff, ratio, tab.order))
        return (
            t_new,
            y_new,
            f_new,
            h_next,
            nfe + jnp.where(done, 0, nfe_step),
            nacc + accept.astype(jnp.int32),
            nrej + ((~accept) & (~done)).astype(jnp.int32),
        ), None

    def chunk(carry):
        carry, _ = jax.lax.scan(one_step, carry, None, length=block)
        return carry

    def cond(carry):
        t = carry[0]
        nacc, nrej = carry[5], carry[6]
        return (t < t_final) & (nacc + nrej < max_steps)

    init = (
        t0,
        y0,
        f0,
        h0,
        jnp.asarray(2, jnp.int32),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
    )
    (_, yN, _, _, nfe, nacc, nrej) = jax.lax.while_loop(cond, chunk, init)
    ys = jnp.stack([y0, yN])
    return OdeSolution(ys, nfe, nacc, nrej)


# ---------------------------------------------------------------------------
# Fixed-step integration (euler / midpoint / rk4 / adams family)
# ---------------------------------------------------------------------------


def _integrate_fixed(method, f, y0, ts, step_size, args):
    """Fixed-step integration hitting every grid point in ``ts`` exactly.

    Steps from ts[i] to ts[i+1] in ceil(dt/step_size) equal substeps
    (mirrors torchdiffeq's fixed-grid solvers with a perturbed step grid).
    The Adams methods use an AB4 predictor with RK4 startup;
    ``implicit_adams`` iterates the AM4 corrector by functional iteration
    (4 passes, torchdiffeq's max_iters default) while ``fixed_adams`` does a
    single PECE corrector pass.  NFE counts every RHS evaluation actually
    performed (tableau stages per substep; startup/corrector evals
    included).
    """
    adams = method in ("explicit_adams", "implicit_adams", "fixed_adams")
    tab = get_tableau("rk4" if adams else method)
    # corrector passes: torchdiffeq AdamsBashforthMoulton iterates the
    # implicit corrector (max_iters=4); 'fixed_adams' keeps one PECE pass
    n_corr = {"implicit_adams": 4, "fixed_adams": 1}.get(method, 0)

    def seg(carry, t_pair):
        # hist/warm/h_prev thread the Adams slope history ACROSS output
        # segments: a dense output grid (n_sub == 1 per segment) would
        # otherwise re-bootstrap every segment and the multistep method
        # never runs (torchdiffeq's fixed-grid Adams keeps one history for
        # the whole solve).  warm counts valid history rows; it resets only
        # when the substep size changes (AB4/AM4 coefficients assume
        # uniform spacing).
        y, hist, warm, h_prev, nfe = carry
        t_a, t_b = t_pair
        dt = t_b - t_a
        # 1e-4 relative slack: output grids built by linspace/arange carry
        # float32 rounding on dt, and a 1-ulp-over ratio must not double
        # the substep count (torchdiffeq steps a single global grid and has
        # no such boundary)
        n_sub = jnp.maximum(
            jnp.ceil(jnp.abs(dt) / step_size * (1.0 - 1e-4)).astype(
                jnp.int32
            ),
            1,
        )
        h = dt / n_sub.astype(y0.dtype)

        if not adams:
            stages = len(tab.b)

            def sub(i, state):
                y, nfe = state
                t = t_a + i.astype(y0.dtype) * h
                f0 = f(t, y, args)
                y1, _, _ = _rk_step(tab, f, t, y, f0, h, args)
                return y1, nfe + stages

            y, nfe = jax.lax.fori_loop(0, n_sub, sub, (y, nfe))
        else:
            # 1e-3 relative: grid rounding perturbs h by ~ulp(t); AB4/AM4
            # coefficients tolerate that, while a real step change
            # (non-uniform ts) still resets the history
            warm = jnp.where(
                jnp.abs(h - h_prev) <= 1e-3 * jnp.abs(h), warm, 0
            )

            def sub(i, state):
                y, hist, warm, nfe = state  # hist: (4, *y) f(t-3h..t)
                t = t_a + i.astype(y0.dtype) * h
                f0 = f(t, y, args)
                hist = jnp.concatenate([hist[1:], f0[None]], axis=0)
                warm = jnp.minimum(warm + 1, 4)

                def startup(_):
                    # RK4 bootstrap while history is short: 3 stage evals
                    # beyond f0
                    y_rk, _, _ = _rk_step(tab, f, t, y, f0, h, args)
                    return y_rk, jnp.asarray(3, jnp.int32)

                def adams_step(_):
                    # AB4: y + h/24 (55 f0 - 59 f-1 + 37 f-2 - 9 f-3)
                    y_next = y + h / 24.0 * (
                        55.0 * hist[3] - 59.0 * hist[2]
                        + 37.0 * hist[1] - 9.0 * hist[0]
                    )
                    for _ in range(n_corr):  # AM4 functional iteration
                        f1 = f(t + h, y_next, args)
                        y_next = y + h / 24.0 * (
                            9.0 * f1 + 19.0 * hist[3] - 5.0 * hist[2] + hist[1]
                        )
                    return y_next, jnp.asarray(n_corr, jnp.int32)

                y_next, extra = jax.lax.cond(
                    warm >= 4, adams_step, startup, None
                )
                return y_next, hist, warm, nfe + 1 + extra

            y, hist, warm, nfe = jax.lax.fori_loop(
                0, n_sub, sub, (y, hist, warm, nfe)
            )
        return (y, hist, warm, h, nfe), y

    t_pairs = jnp.stack([ts[:-1], ts[1:]], axis=-1)
    hist0 = jnp.zeros((4,) + y0.shape, y0.dtype)
    (_, _, _, _, nfe), ys_rest = jax.lax.scan(
        seg,
        (y0, hist0, jnp.asarray(0, jnp.int32), jnp.asarray(0.0, y0.dtype),
         jnp.asarray(0, jnp.int32)),
        t_pairs,
    )
    ys = jnp.concatenate([y0[None], ys_rest], axis=0)
    zero = jnp.asarray(0, jnp.int32)
    return OdeSolution(ys, nfe, zero, zero)


# ---------------------------------------------------------------------------
# scipy_solver (host callback; reference name parity)
# ---------------------------------------------------------------------------


def _integrate_scipy(f, y0, ts, rtol, atol, args):
    import numpy as _np

    shape = y0.shape
    f_jit = jax.jit(lambda t, y: f(t, y, args))

    def host_solve(y0_host, ts_host):
        from scipy.integrate import solve_ivp

        def rhs(t, y_flat):
            y = jnp.asarray(y_flat.reshape(shape), y0.dtype)
            return _np.asarray(f_jit(jnp.asarray(t, y0.dtype), y)).reshape(-1)

        sol = solve_ivp(
            rhs, (float(ts_host[0]), float(ts_host[-1])),
            _np.asarray(y0_host).reshape(-1),
            t_eval=_np.asarray(ts_host, _np.float64),
            rtol=float(rtol), atol=float(atol), method="RK45",
        )
        return sol.y.T.reshape((len(ts_host),) + shape).astype(_np.float32)

    out_shape = jax.ShapeDtypeStruct((ts.shape[0],) + shape, jnp.float32)
    ys = jax.pure_callback(host_solve, out_shape, y0, ts)
    zero = jnp.asarray(0, jnp.int32)
    return OdeSolution(ys, zero, zero, zero)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def odeint(
    f: Callable,
    y0: jax.Array,
    ts: jax.Array,
    args=None,
    *,
    method: str = "dopri5",
    rtol: float = 1e-3,
    atol: float = 1e-3,
    step_size: float | None = None,
    max_steps: int = 512,
    mode: str = "while",
    error_weight=None,
) -> OdeSolution:
    """Integrate dy/dt = f(t, y, args) and report y at each time in ``ts``.

    Args:
      f: RHS with signature f(t, y, args) -> dy/dt (closed over params is
         fine when they do not need gradients; otherwise pass them in args).
      y0: initial state array.
      ts: 1-D increasing array of output times; ts[0] is the initial time.
      args: pytree forwarded to f (differentiated through in 'scan' mode).
      method: one of ADAPTIVE_SOLVERS or FIXED_SOLVERS.
      rtol/atol: adaptive tolerances (reference default protocol: 1e-3).
      step_size: fixed-solver step (reference maps ode_tol to step_size for
         fixed solvers, pl_modules.py:27-33).
      max_steps: bound on solver steps (both modes).
      mode: 'while' (fast, non-differentiable) or 'scan'
         (reverse-mode differentiable bounded loop).

    Returns: OdeSolution(ys, nfe, n_accepted, n_rejected)
    """
    ts = jnp.asarray(ts, y0.dtype)
    if method == "scipy_solver":
        # host-side scipy RK45 via pure_callback (reference solver-name
        # parity, pl_modules.py:18-19; debugging/cross-checking only — on
        # TPU every call round-trips to the host)
        return _integrate_scipy(f, y0, ts, rtol, atol, args)
    if method in FIXED_SOLVERS:
        if step_size is None:
            raise ValueError(f"fixed-step method {method!r} needs step_size")
        return _integrate_fixed(method, f, y0, ts, step_size, args)
    tab = get_tableau(method)
    if mode == "while":
        return _integrate_adaptive_while(
            tab, f, y0, ts, rtol, atol, args, max_steps, error_weight
        )
    elif mode == "scan":
        return _integrate_adaptive_scan(
            tab, f, y0, ts, rtol, atol, args, max_steps, error_weight
        )
    elif mode == "chunked":
        return _integrate_adaptive_chunked(
            tab, f, y0, ts, rtol, atol, args, max_steps, error_weight
        )
    raise ValueError(f"unknown mode {mode!r}")

"""Continuous adjoint (O(1)-memory) backprop through adaptive integration.

Rebuild of torchdiffeq's ``odeint_adjoint`` as used by the reference for
attack gradients (FI-ODE models.py:221-235): cotangents are computed only for
the pytree passed in ``args`` (the reference selects ``adjoint_params=(x,)``
at eval time so only input gradients are reconstructed) plus the initial
state.  Supports the "seminorm" option (models.py:231): the adjoint solve's
error norm ignores the parameter-adjoint channel.

Forward integrates with the fast while-mode solver; backward integrates the
augmented system [y, a_y, a_args] from each output time to the previous one.
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np

from .integrate import odeint

__all__ = ["odeint_adjoint"]


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(0, 4, 5, 6, 7, 8)
)
def odeint_adjoint(
    f: Callable,
    y0: jax.Array,
    ts: jax.Array,
    args,
    method: str = "dopri5",
    rtol: float = 1e-3,
    atol: float = 1e-3,
    max_steps: int = 512,
    seminorm: bool = True,
):
    """Like ``odeint(...).ys`` but with an implicit-adjoint VJP.

    Gradients are returned for ``y0``, ``ts`` (zeros), and ``args``.
    """
    sol = odeint(
        f, y0, ts, args, method=method, rtol=rtol, atol=atol,
        max_steps=max_steps, mode="while",
    )
    return sol.ys


def _fwd(f, y0, ts, args, method, rtol, atol, max_steps, seminorm):
    ys = odeint_adjoint(f, y0, ts, args, method, rtol, atol, max_steps, seminorm)
    return ys, (ys, ts, args)


def _bwd(f, method, rtol, atol, max_steps, seminorm, res, g):
    ys, ts, args = res
    n_out = ts.shape[0]

    flat_args, unravel = jax.flatten_util.ravel_pytree(args)
    n_args = flat_args.shape[0]
    y_shape = ys.shape[1:]
    y_size = int(np.prod(y_shape)) if y_shape else 1

    def aug_dyn(s, y_flat, a_y_flat, a_p):
        """RHS of the augmented reverse system in forward time t = -s."""
        t = -s
        y = y_flat.reshape(y_shape)
        a_y = a_y_flat.reshape(y_shape)

        def f_closed(y_, args_flat):
            return f(t, y_, unravel(args_flat))

        fy, vjp_fn = jax.vjp(f_closed, y, flat_args)
        va_y, va_p = vjp_fn(a_y)
        # d/ds [y, a_y, a_p] at s = -t: y' = -f, a_y' = +vjp_y, a_p' = +vjp_p
        return -fy.reshape(-1), va_y.reshape(-1), va_p

    def aug_f(s, state, _):
        y_flat = state[:y_size]
        a_y_flat = state[y_size : 2 * y_size]
        a_p = state[2 * y_size :]
        dy, da_y, da_p = aug_dyn(s, y_flat, a_y_flat, a_p)
        return jnp.concatenate([dy, da_y, da_p])

    # seminorm: exclude the parameter-adjoint channel from step control
    # (torchdiffeq adjoint_options=dict(norm="seminorm"); models.py:231)
    err_weight = None
    if seminorm and n_args > 0:
        err_weight = jnp.concatenate(
            [jnp.ones(2 * y_size), jnp.zeros(n_args)]
        )

    a_y = jnp.zeros(y_size)
    a_p = jnp.zeros(n_args)

    def segment(carry, idx):
        a_y, a_p = carry
        i = n_out - 1 - idx  # walk output times backwards
        a_y = a_y + g[i].reshape(-1)
        t1 = ts[i]
        t0 = ts[jnp.maximum(i - 1, 0)]
        state0 = jnp.concatenate([ys[i].reshape(-1), a_y, a_p])
        seg_ts = jnp.stack([-t1, -t0])
        sol = odeint(
            aug_f, state0, seg_ts, None, method=method, rtol=rtol, atol=atol,
            max_steps=max_steps, mode="while", error_weight=err_weight,
        )
        state1 = sol.ys[-1]
        a_y_new = state1[y_size : 2 * y_size]
        a_p_new = state1[2 * y_size :]
        # no-op for the i == 0 sentinel segment (t0 == t1)
        take = i > 0
        a_y = jnp.where(take, a_y_new, a_y)
        a_p = jnp.where(take, a_p_new, a_p)
        return (a_y, a_p), None

    (a_y, a_p), _ = jax.lax.scan(segment, (a_y, a_p), jnp.arange(n_out))
    d_y0 = a_y.reshape(y_shape)
    d_args = unravel(a_p)
    d_ts = jnp.zeros_like(ts)
    return d_y0, d_ts, d_args


odeint_adjoint.defvjp(_fwd, _bwd)

"""Interval arithmetic over jnp arrays (for bounding analytic dynamics).

Used by the Segway certification path to propagate bounds through the
closed-loop graph V̇(x) = <PᵀPx, f(x, u(x))> — the role auto_LiRPA's general
graph tracing plays in the reference (control/certify_segway.py:52-67); the
MLP controller part still goes through CROWN (verify/crown.py), and this
module handles the analytic trig/rational dynamics around it.

All ops are sound over-approximations; division requires a sign-definite
denominator.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["IV", "iv"]


class IV(NamedTuple):
    lo: jax.Array
    hi: jax.Array

    # -- arithmetic ----------------------------------------------------------

    def __add__(self, o):
        if isinstance(o, IV):
            return IV(self.lo + o.lo, self.hi + o.hi)
        return IV(self.lo + o, self.hi + o)

    __radd__ = __add__

    def __neg__(self):
        return IV(-self.hi, -self.lo)

    def __sub__(self, o):
        return self + (-o if isinstance(o, IV) else -jnp.asarray(o))

    def __rsub__(self, o):
        return (-self) + o

    def __mul__(self, o):
        if not isinstance(o, IV):
            o = IV(jnp.asarray(o), jnp.asarray(o))
        cands = jnp.stack(
            [self.lo * o.lo, self.lo * o.hi, self.hi * o.lo, self.hi * o.hi]
        )
        return IV(jnp.min(cands, 0), jnp.max(cands, 0))

    __rmul__ = __mul__

    def recip(self):
        """1/x for sign-definite intervals (lo>0 or hi<0 everywhere)."""
        return IV(1.0 / self.hi, 1.0 / self.lo)

    def __truediv__(self, o):
        if not isinstance(o, IV):
            return self * (1.0 / jnp.asarray(o))
        return self * o.recip()

    # -- functions -----------------------------------------------------------

    def sin(self):
        # sound on any interval: sample endpoints + clamp at critical points
        lo, hi = self.lo, self.hi
        s_lo, s_hi = jnp.sin(lo), jnp.sin(hi)
        out_lo = jnp.minimum(s_lo, s_hi)
        out_hi = jnp.maximum(s_lo, s_hi)
        # contains a peak if floor((x - pi/2)/(2 pi)) differs across the box
        k_max = jnp.floor((hi - jnp.pi / 2) / (2 * jnp.pi)) >= jnp.ceil(
            (lo - jnp.pi / 2) / (2 * jnp.pi)
        )
        k_min = jnp.floor((hi + jnp.pi / 2) / (2 * jnp.pi)) >= jnp.ceil(
            (lo + jnp.pi / 2) / (2 * jnp.pi)
        )
        out_hi = jnp.where(k_max, 1.0, out_hi)
        out_lo = jnp.where(k_min, -1.0, out_lo)
        return IV(out_lo, out_hi)

    def cos(self):
        return (self + jnp.pi / 2).sin()

    def square(self):
        lo2, hi2 = self.lo * self.lo, self.hi * self.hi
        crosses = (self.lo < 0) & (self.hi > 0)
        return IV(
            jnp.where(crosses, 0.0, jnp.minimum(lo2, hi2)),
            jnp.maximum(lo2, hi2),
        )

    def contains(self, x, tol=0.0):
        return (x >= self.lo - tol) & (x <= self.hi + tol)

    @property
    def width(self):
        return self.hi - self.lo


def iv(lo, hi=None) -> IV:
    lo = jnp.asarray(lo)
    return IV(lo, lo if hi is None else jnp.asarray(hi))


def iv_dot(x: IV, M) -> IV:
    """Sound interval image of ``x @ M.T`` for a fixed matrix ``M``.

    Sign-split linear-map interval: each output coordinate attains its
    extremes at per-entry corners chosen by sign(M) — NOT at the two box
    corners ``lo @ M.T`` / ``hi @ M.T``, whose span under-covers whenever a
    row of ``M`` has mixed signs (e.g. row [2, -1]: true half-width 3r vs
    corner span r)."""
    M = jnp.asarray(M)
    pos = jnp.maximum(M, 0.0)
    neg = jnp.minimum(M, 0.0)
    return IV(x.lo @ pos.T + x.hi @ neg.T, x.hi @ pos.T + x.lo @ neg.T)

"""Control-side Lyapunov/barrier modules.

Rebuild of control/control_utils.py:21-234:
  * LyaQuadratic        — V(x) = |P (x - goal)|^2, Vdot = <PᵀP x, f>  (:215-234)
  * QuadraticVdotModel  — Vdot as a module over a closed-loop f        (:31-42)
  * SegwaySingleBarrierModel — the trained/certified object: Vdot of a
    barrier along the closed loop                                       (:97-111)
  * analytic barrier pairs BarrierExt / PhiV / PhiDotV / V with their
    h_dot forms                                                         (:114-199)
  * SegwayCompositeBarrierModel — min over member barriers              (:70-94)
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "LyaQuadratic",
    "SegwaySingleBarrierModel",
    "SegwayCompositeBarrierModel",
    "BarrierExt",
    "BarrierPhiV",
    "BarrierPhiDotV",
    "BarrierV",
]


@dataclasses.dataclass
class LyaQuadratic:
    P: jnp.ndarray  # (n, n), learnable in phase-2 training
    goal: jnp.ndarray  # (1, n)

    def __call__(self, x):
        z = (x - self.goal) @ self.P.T
        return jnp.sum(z * z, axis=-1, keepdims=True)

    def h_dot(self, x, f):
        # reference drops the goal shift in Vdot (goal == 0 in practice;
        # control_utils.py:229-234)
        grad = x @ (self.P.T @ self.P).T
        return jnp.sum(grad * f, axis=-1, keepdims=True)

    def sigma_max(self):
        return float(np.linalg.svd(np.asarray(self.P), compute_uv=False)[0])


@dataclasses.dataclass
class SegwaySingleBarrierModel:
    """Vdot(x) of ``barrier`` along the closed loop x' = dyn(x, ctrl(x))."""

    system: Callable  # Segway
    controller: Callable
    barrier: LyaQuadratic

    def closed_loop(self, x):
        return self.system(x, self.controller(x, 0.0))

    def __call__(self, x):
        return self.barrier.h_dot(x, self.closed_loop(x))


def _sided(side):
    return -1.0 if side == "lb" else 1.0


@dataclasses.dataclass
class BarrierExt:
    alpha: float
    alpha_ext: float
    side: str = "lb"

    def __call__(self, f, x):
        term = self.alpha * self.alpha_ext * jnp.pi / 12
        signed = (
            -f[..., 2:3]
            - (self.alpha + self.alpha_ext) * x[..., 2:3]
            - self.alpha * self.alpha_ext * x[..., 0:1]
        )
        return _sided(self.side) * signed + term

    def h_dot(self, f, x):
        signed = -f[..., 2:3] - self.alpha * x[..., 2:3]
        return _sided(self.side) * signed


@dataclasses.dataclass
class BarrierPhiV:
    alpha: float
    alpha_ext: float
    side: str = "lb"

    def __call__(self, f, x):
        term = self.alpha * self.alpha_ext * 3.0
        signed = (
            -x[..., 2:3]
            + self.alpha * f[..., 1:2]
            + self.alpha_ext * (-x[..., 0:1] + self.alpha * x[..., 1:2])
        )
        return _sided(self.side) * signed + term

    def h_dot(self, f, x):
        signed = -x[..., 2:3] + self.alpha * f[..., 1:2]
        return _sided(self.side) * signed


@dataclasses.dataclass
class BarrierPhiDotV:
    alpha: float
    alpha_ext: float
    side: str = "lb"

    def __call__(self, f, x):
        term = self.alpha * self.alpha_ext * 2.25
        signed = -(
            f[..., 2:3]
            + self.alpha * f[..., 1:2]
            + self.alpha_ext * (x[..., 2:3] + self.alpha * x[..., 1:2])
        )
        return _sided(self.side) * signed + term

    def h_dot(self, f, x):
        signed = -(f[..., 2:3] + self.alpha * f[..., 1:2])
        return _sided(self.side) * signed


@dataclasses.dataclass
class BarrierV:
    alpha: float
    alpha_ext: float
    side: str = "lb"

    def __call__(self, f, x):
        term = self.alpha_ext * 2.5
        signed = -(f[..., 1:2] + self.alpha_ext * x[..., 1:2])
        return _sided(self.side) * signed + term

    def h_dot(self, f, x):
        signed = -f[..., 1:2]
        return _sided(self.side) * signed


@dataclasses.dataclass
class SegwayCompositeBarrierModel:
    system: Callable
    controller: Callable
    barriers: Sequence

    def __call__(self, x):
        f = self.system(x, self.controller(x, 0.0))
        vals = [b(f, x) for b in self.barriers]
        out = vals[0]
        for v in vals[1:]:
            out = jnp.minimum(out, v)
        return out

    def forward_adv(self, x):
        return jax.nn.relu(-self(x))

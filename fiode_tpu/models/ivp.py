"""Neural-ODE classifier: init coordinates -> integrate -> output coordinates.

Rebuild of the reference's IVP wrapper (models.py:181-243) plus the
init/output coordinate maps (dynamics/init_coordinates.py:5-44,
dynamics/output_coordinates.py:4-28):

  * init:    static features x_feat = backbone(x); h(0) = 1/n on the simplex
             (UniformInitFun) or zeros (DefaultInitFun).
  * solve:   dh/dt = dynamics.eval_dot(h, x_feat) with the adaptive solver;
             the "static state" is a closure argument, not a module buffer —
             no global state, vmap/pjit-safe by construction.
  * output:  h(t_max) is already the class-probability vector ("default"),
             or a slice ("first_n") / linear readout ("linear").

Gradient paths: mode='while' for inference, mode='scan' for discrete
backprop through solver steps (reference training default), or
use_adjoint=True for the continuous adjoint with input-only cotangents
(the reference's attack-time configuration, models.py:221-235).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ode.adjoint import odeint_adjoint
from ..ode.integrate import OdeSolution, odeint
from .dynamics import SimplexDynamics

__all__ = ["NeuralODEClassifier"]


@dataclasses.dataclass
class NeuralODEClassifier:
    backbone: Optional[nn.Module]
    dynamics: SimplexDynamics
    n_classes: int
    t_max: float = 1.0
    h0_init: str = "uniform"  # 'uniform' | 'zeros'
    output: str = "default"  # 'default' | 'first_n'
    method: str = "dopri5"
    rtol: float = 1e-3
    atol: float = 1e-3
    max_steps: int = 512

    # -- parameter handling --------------------------------------------------

    def init(self, rng, sample_x) -> dict:
        kb, kd = jax.random.split(rng)
        params = {}
        if self.backbone is not None:
            params["backbone"] = self.backbone.init(kb, sample_x)["params"]
            feats = self.features(params, sample_x)
        else:
            feats = sample_x
        h0 = self.h0(sample_x.shape[0])
        params["dynamics"] = self.dynamics.init(
            kd, h0, feats, method=self.dynamics.eval_dot
        )["params"]
        return params

    # -- coordinate maps -----------------------------------------------------

    def features(self, params, x):
        if self.backbone is None:
            return x
        return self.backbone.apply({"params": params["backbone"]}, x)

    def h0(self, batch_size: int):
        n = self.dynamics.n_hidden
        if self.h0_init == "uniform":
            h = jnp.full((batch_size, n), 1.0 / n)
        else:
            h = jnp.zeros((batch_size, n))
        return h

    def output_fn(self, h):
        if self.output == "default":
            return h
        if self.output == "first_n":
            return h[..., : self.n_classes]
        raise ValueError(self.output)

    # -- dynamics as a pure RHS ---------------------------------------------

    def eval_dot(self, params, h, x_feat, *, train=False, rng=None,
                 scale_nominal=None):
        variables = {"params": params["dynamics"]}
        rngs = {"dropout": rng} if (train and rng is not None) else None
        return self.dynamics.apply(
            variables,
            h,
            x_feat,
            train=train,
            scale_nominal=scale_nominal,
            method=self.dynamics.eval_dot,
            rngs=rngs,
        )

    def raw_dot(self, params, h, x_feat, *, train=False, rng=None):
        variables = {"params": params["dynamics"]}
        rngs = {"dropout": rng} if (train and rng is not None) else None
        return self.dynamics.apply(
            variables, h, x_feat, train=train,
            method=self.dynamics.raw, rngs=rngs,
        )

    # -- forward (integrate) -------------------------------------------------

    def solve(
        self,
        params,
        x,
        ts=None,
        *,
        mode: str = "while",
        use_adjoint: bool = False,
        scale_nominal=None,
        method=None,
        rtol=None,
        atol=None,
    ):
        """Integrate and return OdeSolution over requested ts (trajectory of h).

        With use_adjoint=True, gradients flow to x (and params) through the
        continuous adjoint; ys only (no NFE stats) are returned in that case.
        """
        if ts is None:
            ts = jnp.asarray([0.0, self.t_max])
        feats = self.features(params, x)
        h0 = self.h0(x.shape[0])
        dyn_params = {"dynamics": params["dynamics"]}

        if use_adjoint:
            def f(t, h, args):
                return self.eval_dot(args, h, args["__feats__"],
                                     scale_nominal=scale_nominal)

            args = dict(dyn_params, __feats__=feats)
            ys = odeint_adjoint(
                f, h0, ts, args,
                method or self.method, rtol or self.rtol, atol or self.atol,
                self.max_steps, True,
            )
            return OdeSolution(ys, jnp.zeros((), jnp.int32),
                               jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))

        def f(t, h, args):
            return self.eval_dot(args, h, feats, scale_nominal=scale_nominal)

        return odeint(
            f, h0, ts, dyn_params,
            method=method or self.method,
            rtol=rtol or self.rtol,
            atol=atol or self.atol,
            max_steps=self.max_steps,
            mode=mode,
        )

    def predict(self, params, x, **kw):
        """Class probabilities at t_max (the forward pass of the classifier)."""
        sol = self.solve(params, x, **kw)
        return self.output_fn(sol.ys[-1])

    def trajectory(self, params, x, n_points: int = 100, **kw):
        ts = jnp.linspace(0.0, self.t_max, n_points)
        sol = self.solve(params, x, ts, **kw)
        return self.output_fn(sol.ys)

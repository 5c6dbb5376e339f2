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
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ode.adjoint import odeint_adjoint
from ..ode.integrate import OdeSolution, odeint
from ..ops.fused_rhs import LANE, fused_rhs, pack_rhs_params
from ..utils.debug import env_flag
from .dynamics import SimplexDynamics, densify_dynamics_params

__all__ = ["NeuralODEClassifier"]


def _fused_default() -> bool:
    """Env gate: FIODE_FUSED=1 turns the Pallas fused RHS on for every solve
    that doesn't pass ``fused=`` explicitly.  Off by default: measured on
    v5e the fused RHS runs the ODE portion of a dopri5 solve ~2.7x slower
    than the XLA path (XLA already fuses this chain well; see README design
    notes) — the kernel remains available for experimentation."""
    return env_flag("FIODE_FUSED")


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
        kb, kd, ko = jax.random.split(rng, 3)
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
        if self.output == "linear":
            # LinearLastOutput readout (output_coordinates.py:21-28),
            # xavier-uniform, no bias
            params["output"] = {
                "kernel": jax.nn.initializers.xavier_uniform()(
                    ko, (self.n_classes, self.dynamics.n_hidden)
                )
            }
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

    def output_fn(self, h, output_params=None):
        if self.output == "default":
            return h
        if self.output == "first_n":
            return h[..., : self.n_classes]
        if self.output == "linear":
            if output_params is None:
                raise ValueError("output='linear' needs params['output']")
            return h @ output_params["kernel"].T
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

    # -- fused fast path -----------------------------------------------------

    def _fused_setup(self, params, feats):
        """Padded weights + input injection for the fused Pallas RHS.

        Densifies Cayley layers and precomputes xc = U feats + bU + b1 once
        per solve — both are loop-invariant and hoisted out of the
        integration by XLA (the reference recomputes U_x(x) on every RHS
        eval, dynamics/classification.py:97)."""
        dense = densify_dynamics_params(params["dynamics"])
        W1 = dense["hidden_to_mlp"]["kernel"]
        b1 = dense["hidden_to_mlp"]["bias"]
        U = dense["U_x"]["kernel"]
        bU = dense["U_x"]["bias"]
        W2 = dense["mlp_to_mlp"]["kernel"]
        b2 = dense["mlp_to_mlp"]["bias"]
        W3 = dense["mlp_to_hidden"]["kernel"]
        b3 = dense["mlp_to_hidden"]["bias"]
        p = pack_rhs_params(W1, W2, W3, b2, b3)
        xc = feats @ U.T + bU + b1  # (B, mlp)
        xc_pad = jnp.zeros((feats.shape[0], LANE), xc.dtype)
        xc_pad = xc_pad.at[:, : xc.shape[1]].set(xc)
        return p, xc_pad

    def _solve_fused(self, params, x, ts, *, mode, scale_nominal, method,
                    rtol, atol):
        dyn = self.dynamics
        n = dyn.n_hidden
        feats = self.features(params, x)
        p, xc_pad = self._fused_setup(params, feats)
        sn = dyn.scale_nominal if scale_nominal is None else scale_nominal
        h0 = self.h0(x.shape[0])
        h0_pad = jnp.zeros((x.shape[0], LANE), h0.dtype)
        h0_pad = h0_pad.at[:, :n].set(h0)
        # keep torchdiffeq error-norm semantics on the padded state
        weight = (jnp.arange(LANE) < n).astype(h0.dtype)[None, :]
        weight = jnp.broadcast_to(weight, h0_pad.shape)

        def f(t, h, args):
            pp, xc = args
            return fused_rhs(
                h, xc, pp, n, dyn.alpha_1, dyn.sigma_1, dyn.alpha_2, sn,
                dyn.qp_iters,
            )

        sol = odeint(
            f, h0_pad, ts, (p, xc_pad),
            method=method or self.method, rtol=self.rtol if rtol is None else rtol,
            atol=self.atol if atol is None else atol, max_steps=self.max_steps, mode=mode,
            error_weight=weight,
        )
        return OdeSolution(sol.ys[..., :n], sol.nfe, sol.n_accepted,
                           sol.n_rejected)

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
        fused: Optional[bool] = None,
    ):
        """Integrate and return OdeSolution over requested ts (trajectory of h).

        With use_adjoint=True, gradients flow to x (and params) through the
        continuous adjoint; ys only (no NFE stats) are returned in that case.
        ``fused=None`` defers to the FIODE_FUSED env var (off by default).
        """
        if fused is None:
            fused = _fused_default()
        if ts is None:
            ts = jnp.asarray([0.0, self.t_max])
        if fused and not use_adjoint:
            return self._solve_fused(
                params, x, ts, mode=mode, scale_nominal=scale_nominal,
                method=method, rtol=rtol, atol=atol,
            )
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
                method or self.method, self.rtol if rtol is None else rtol, self.atol if atol is None else atol,
                self.max_steps, True,
            )
            return OdeSolution(ys, jnp.zeros((), jnp.int32),
                               jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))

        def f(t, h, args):
            return self.eval_dot(args, h, feats, scale_nominal=scale_nominal)

        return odeint(
            f, h0, ts, dyn_params,
            method=method or self.method,
            rtol=self.rtol if rtol is None else rtol,
            atol=self.atol if atol is None else atol,
            max_steps=self.max_steps,
            mode=mode,
        )

    def predict(self, params, x, **kw):
        """Class probabilities at t_max (the forward pass of the classifier)."""
        sol = self.solve(params, x, **kw)
        return self.output_fn(sol.ys[-1], params.get("output"))

    def trajectory(self, params, x, n_points: int = 100, **kw):
        ts = jnp.linspace(0.0, self.t_max, n_points)
        sol = self.solve(params, x, ts, **kw)
        return self.output_fn(sol.ys, params.get("output"))

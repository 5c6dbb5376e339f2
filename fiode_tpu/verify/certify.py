"""Certification drivers: CROWN and Lipschitz certificates over the
decision-boundary grid.

Rebuild of robustness/certify_crown.py:29-175 and certify_lipschitz.py:37-167,
restructured TPU-first: the reference's image-outer / grid-batch-inner Python
loops become one jitted chunk kernel (CROWN backward + QP interval
propagation + masked worst-case Vdot reduction) swept over cell chunks that
are sharded across the device mesh; early exit happens host-side between
chunks (the reference breaks out of its batch loop the same way,
certify_crown.py:149-153).

Certificate per image (clean-correct required first):
  CROWN:     max_cells [ Vdot_ub + kappa ] <= 0,
             kappa = sqrt(2) * Lfx * eps_input, Lfx = 1/min(std)
             (certify_crown.py:59-67)
  Lipschitz: max_cells [ Vdot(grid point) + sqrt(2)*Lf_eta*dist + kappa ] < 0,
             Lf_eta = sqrt(N)*sigma_1*alpha_1*exp(sigma_1*eta_ub) + 1,
             dist = sqrt(N)/T; the "larger-T" certificate drops the
             grid-gap slack (certify_lipschitz.py:79-83,120-143)
"""
from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.dynamics import densify_dynamics_params
from .crown import crown_mlp_bounds
from .grid import enumerate_decision_boundary, grid_for_label
from .ibp_qp import ibp_cbf_qp, ibp_sigmoid, worst_case_vdot

__all__ = ["Certifier", "CertifyResult"]


@dataclasses.dataclass
class CertifyResult:
    clean: np.ndarray  # (n_images,) bool
    certified: np.ndarray  # (n_images,) bool
    cells_per_image: int
    cells_checked: int
    seconds: float

    @property
    def clean_acc(self):
        return float(self.clean.mean())

    @property
    def certified_acc(self):
        return float(self.certified.mean())

    @property
    def cells_per_sec(self):
        return self.cells_checked / max(self.seconds, 1e-9)


class Certifier:
    def __init__(
        self,
        model,
        params,
        *,
        T: int = 40,
        eps_input: float = 36 / 255,
        chunk: int = 8192,
        scale_nominal: bool = False,
        with_upper: bool = False,
        grid: Optional[np.ndarray] = None,
        std_min: Optional[float] = None,
    ):
        self.model = model
        self.params = params
        self.T = T
        self.eps = 1.0 / T  # per-cell Linf radius (certify_crown.py:59-62)
        self.chunk = chunk
        self.scale_nominal = scale_nominal
        self.with_upper = with_upper
        self.n = model.dynamics.n_hidden
        dyn = model.dynamics
        self.alpha_1, self.alpha_2, self.sigma_1 = (
            dyn.alpha_1,
            dyn.alpha_2,
            dyn.sigma_1,
        )
        if std_min is None:
            std_min = float(np.min(getattr(model.backbone, "std", (1.0,))))
        # Lipschitz of dynamics wrt x through the Lip-1 backbone + Normalize
        self.Lfx = 1.0 / std_min
        self.kappa = float(np.sqrt(2.0) * self.Lfx * eps_input)

        dense = densify_dynamics_params(params["dynamics"])
        self.Ws = [
            dense["hidden_to_mlp"]["kernel"],
            dense["mlp_to_mlp"]["kernel"],
            dense["mlp_to_hidden"]["kernel"],
        ]
        self.bs = [
            dense["hidden_to_mlp"]["bias"],
            dense["mlp_to_mlp"]["bias"],
            dense["mlp_to_hidden"]["bias"],
        ]
        self.U = dense["U_x"]["kernel"]
        self.bU = dense["U_x"]["bias"]

        if grid is None:
            grid = enumerate_decision_boundary(self.n, T)
        self.grid = np.asarray(grid, np.float32)

        self._crown_chunk = self._make_crown_chunk()
        self._lips_chunk = self._make_lips_chunk()
        self._predict = jax.jit(
            lambda p, x: jnp.argmax(
                self.model.output_fn(self.model.solve(p, x, mode="while").ys[-1]),
                -1,
            )
        )
        self._features = jax.jit(self.model.features)

    # -- CROWN ---------------------------------------------------------------

    def _make_crown_chunk(self):
        eps = self.eps
        a1, a2, s1 = self.alpha_1, self.alpha_2, self.sigma_1

        def one(Ws, bs, x_bias, eta, label, valid):
            lb, ub = crown_mlp_bounds(Ws, bs, eta, eps, x_bias)
            if self.scale_nominal:
                lb, ub = ibp_sigmoid(lb, ub, eta - eps, eta + eps, a1, s1, a2)
            f_lb, f_ub = ibp_cbf_qp(
                eta, eps, lb, ub, a1, s1, a2, with_upper=self.with_upper
            )
            vdot = worst_case_vdot(eta, eps, f_lb, f_ub, label)
            vdot = jnp.where(valid, vdot, -jnp.inf)
            return jnp.max(vdot) + self.kappa

        @jax.jit
        def superchunk_fn(Ws, bs, x_bias, etas, label, valids):
            # etas (K, C, n), valids (K, C): K chunks in one program, one
            # device sync per call (the relay costs ~30ms per execution)
            def body(i, worst):
                return jnp.maximum(
                    worst, one(Ws, bs, x_bias, etas[i], label, valids[i])
                )

            return jax.lax.fori_loop(0, etas.shape[0], body, -jnp.inf)

        return superchunk_fn

    # -- Lipschitz -----------------------------------------------------------

    def _make_lips_chunk(self):
        a1, s1 = self.alpha_1, self.sigma_1
        n = self.n
        eps = self.eps
        dist = float(np.sqrt(n)) / self.T  # grid gap (certify_lipschitz.py:79-83)

        def one(params, feats, eta, label, valid):
            x_in = jnp.broadcast_to(feats, (eta.shape[0], feats.shape[-1]))
            f = self.model.eval_dot(
                params, eta, x_in, scale_nominal=self.scale_nominal
            )
            onehot = jax.nn.one_hot(label, n, dtype=bool)
            wrong = jnp.where(onehot, -jnp.inf, eta)
            max_wrong = jnp.max(wrong, axis=-1, keepdims=True)
            runner = (eta == max_wrong) & ~onehot
            f_y = jnp.sum(jnp.where(onehot, f, 0.0), -1)
            f_w = jnp.max(jnp.where(runner, f, -jnp.inf), -1)
            vdot = -f_y + f_w
            eta_ub = jnp.max(eta, -1) + eps
            Lf_eta = jnp.sqrt(float(n)) * (s1 * a1 * jnp.exp(s1 * eta_ub)) + 1.0
            slack = jnp.sqrt(2.0) * Lf_eta * dist
            v_full = jnp.where(valid, vdot + slack + self.kappa, -jnp.inf)
            v_larger_T = jnp.where(valid, vdot + self.kappa, -jnp.inf)
            return jnp.max(v_full), jnp.max(v_larger_T)

        @jax.jit
        def superchunk_fn(params, feats, etas, label, valids):
            def body(i, carry):
                wf, wl = carry
                vf, vl = one(params, feats, etas[i], label, valids[i])
                return jnp.maximum(wf, vf), jnp.maximum(wl, vl)

            return jax.lax.fori_loop(
                0, etas.shape[0], body, (-jnp.inf, -jnp.inf)
            )

        return superchunk_fn

    # -- drivers -------------------------------------------------------------

    def _iter_chunks(self, label: int, superchunk: int = 16):
        """Yield (K, C, n) cell blocks + (K, C) validity masks (padded)."""
        g = grid_for_label(self.grid, label)
        C = self.chunk
        block_cells = C * superchunk
        n_cells = len(g)
        for i in range(0, n_cells, block_cells):
            block = g[i : i + block_cells]
            valid = np.ones(len(block), bool)
            if len(block) < block_cells:  # pad to static shape
                pad = block_cells - len(block)
                block = np.concatenate(
                    [block, np.zeros((pad, self.n), np.float32)]
                )
                valid = np.concatenate([valid, np.zeros(pad, bool)])
            yield (
                jnp.asarray(block.reshape(superchunk, C, self.n)),
                jnp.asarray(valid.reshape(superchunk, C)),
            )

    def certify(
        self,
        images: np.ndarray,
        labels: np.ndarray,
        method: str = "crown",
        early_exit: bool = True,
        progress_every: int = 0,
    ) -> CertifyResult:
        n_imgs = len(images)
        certified = np.zeros(n_imgs, bool)
        larger_T_certified = np.zeros(n_imgs, bool)
        cells_checked = 0
        Ws = [jnp.asarray(W) for W in self.Ws]
        bs = [jnp.asarray(b) for b in self.bs]

        # batched clean checks + feature extraction up front (one solve for
        # all images instead of the reference's per-image forward,
        # certify_crown.py:126-130)
        preds = np.asarray(self._predict(self.params, jnp.asarray(images)))
        clean = preds == np.asarray(labels)
        all_feats = np.asarray(
            self._features(self.params, jnp.asarray(images))
        )
        t0 = time.time()

        for i in range(n_imgs):
            label = int(labels[i])
            if not clean[i]:
                continue
            feats = jnp.asarray(all_feats[i])
            ok = True
            ok_larger = True
            if method == "crown":
                x_bias = self.U @ feats + self.bU
                for eta, valid in self._iter_chunks(label):
                    worst = float(
                        self._crown_chunk(
                            Ws, bs, x_bias, eta, jnp.asarray(label), valid
                        )
                    )
                    cells_checked += int(valid.sum())
                    if worst > 0:
                        ok = False
                        if early_exit:
                            break
            elif method == "lipschitz":
                for eta, valid in self._iter_chunks(label):
                    w_full, w_larger = self._lips_chunk(
                        self.params, feats, eta, jnp.asarray(label), valid
                    )
                    cells_checked += int(valid.sum())
                    if float(w_larger) >= 0:
                        ok_larger = False
                    if float(w_full) >= 0:
                        ok = False
                        if early_exit:
                            break
            else:
                raise ValueError(method)
            certified[i] = ok
            larger_T_certified[i] = ok_larger
            if progress_every and (i + 1) % progress_every == 0:
                el = time.time() - t0
                print(
                    f"[certify:{method}] {i+1}/{n_imgs} clean={clean[:i+1].mean():.3f} "
                    f"cert={certified[:i+1].mean():.3f} "
                    f"({cells_checked/max(el,1e-9):,.0f} cells/s)",
                    flush=True,
                )

        res = CertifyResult(
            clean=clean,
            certified=certified,
            cells_per_image=len(self.grid),
            cells_checked=cells_checked,
            seconds=time.time() - t0,
        )
        res.larger_T_certified = larger_T_certified  # extra attr (lipschitz)
        return res

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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.dynamics import densify_dynamics_params
from .crown import crown_mlp_bounds, optimize_crown_alphas
from .grid import enumerate_decision_boundary
from .ibp_qp import ibp_cbf_qp, ibp_sigmoid, worst_case_vdot

__all__ = ["Certifier", "CertifyResult", "summarize_stream"]


def _mesh_placers(mesh: Optional[Mesh]):
    """Return ``(shard_img(a), shard_cell(a))`` placement functions.

    ``shard_img`` shards dim 0 (the image axis) over the mesh's "img"
    axis; ``shard_cell`` shards dim 1 of a (K, chunk, ...) cell block over
    the "cell" axis.  A 1-D mesh of any axis name shards only cells (the
    long axis); with no mesh both are identity.  GSPMD propagates these
    operand placements through the jitted superchunk, so no kernel code
    changes per layout.
    """
    if mesh is None:
        ident = lambda a: a
        return ident, ident
    names = mesh.axis_names
    # a 1-D mesh always shards cells only, whatever its axis is called —
    # splitting images AND cells over the same device axis would force
    # GSPMD to gather one of them back
    if len(names) == 1:
        img_ax, cell_ax = None, names[0]
    else:
        img_ax = "img" if "img" in names else None
        cell_ax = "cell" if "cell" in names else None

    def put(a, dim, ax):
        if ax is None:
            return a
        spec = [None] * a.ndim
        spec[dim] = ax
        return jax.device_put(a, NamedSharding(mesh, P(*spec)))

    return (lambda a: put(a, 0, img_ax)), (lambda a: put(a, 1, cell_ax))


def _img_axis_size(mesh: Optional[Mesh]) -> int:
    """Number of shards the image axis splits into (1 = unsharded)."""
    if mesh is None or "img" not in mesh.axis_names:
        return 1
    return mesh.shape["img"]


def summarize_stream(jsonl_path, out_path=None):
    """Fold a ``certify_stream`` batch log (possibly written across several
    resumed runs/segments) into one total summary dict.

    Each JSON line carries segment-cumulative ``clean``/``certified``/``n``/
    ``cells_checked``/``seconds`` counters plus the absolute
    ``batch_certified_idx`` for that batch; a new segment starts whenever the
    cumulative ``n`` does not continue from the previous record (within a
    segment every record grows ``n`` by exactly its own batch size, so a
    resumed run — whose counters restart at its first batch size — is
    detected even when its batch is larger than the prior segment's total).
    Totals are the sum of each segment's final counters; certified indices
    are the de-duplicated union across all batches.  This makes the
    resume-friendly audit log (certify_crown.py:161-172 streams the same
    running ratios) collapsible into the single-run summary shape.
    """
    import json

    records = []
    with open(jsonl_path) as fh:
        for line in fh:
            line = line.strip()
            if line:
                records.append(json.loads(line))
    if not records:
        raise ValueError(f"no records in {jsonl_path}")

    segments = []  # list of final-record per segment
    certified_idx = set()
    larger_T_idx = set()
    n_with_larger_T = 0
    covered = set()
    last = None
    for rec in records:
        batch_n = rec["idx_to"] - rec["idx_from"] + 1
        if last is not None and rec["n"] != last["n"] + batch_n:
            segments.append(last)
        certified_idx.update(rec["batch_certified_idx"])
        if "batch_larger_T_idx" in rec:
            n_with_larger_T += 1
            larger_T_idx.update(rec["batch_larger_T_idx"])
        covered.update(range(rec["idx_from"], rec["idx_to"] + 1))
        last = rec
    segments.append(last)
    has_larger_T = n_with_larger_T == len(records)
    if 0 < n_with_larger_T < len(records):
        # a lipschitz log whose older segments predate the larger-T audit
        # field: folding would silently understate the exact-grid rate
        raise ValueError(
            f"{jsonl_path}: {n_with_larger_T}/{len(records)} records carry "
            "batch_larger_T_idx — mixed-generation log; re-run the old "
            "segments (or strip the field) before summarizing"
        )

    n_images = len(covered)
    if sum(s["n"] for s in segments) != n_images:
        raise ValueError(
            f"{jsonl_path}: segments overlap in image indices; "
            "clean counts would double-count — trim the log first"
        )
    clean = sum(s["clean"] for s in segments)
    cells = sum(s["cells_checked"] for s in segments)
    secs = sum(s["seconds"] for s in segments)
    summary = {
        "n_images": n_images,
        "index_min": min(covered),
        "index_max": max(covered),
        "segments": len(segments),
        # scalar when all segments agree (the per-run summary shape);
        # a sorted list only for genuinely mixed-precision logs
        "matmul_precision": (
            precs[0] if len(precs := sorted({
                s.get("matmul_precision", "?") for s in segments
            })) == 1 else precs
        ),
        "clean": clean,
        "certified": len(certified_idx),
        "clean_acc": clean / n_images,
        "certified_acc": len(certified_idx) / n_images,
        "certified_idx": sorted(certified_idx),
        "cells_checked": cells,
        "seconds": secs,
        "cells_per_sec": cells / max(secs, 1e-9),
    }
    if has_larger_T:
        summary["larger_T_certified"] = len(larger_T_idx)
        summary["larger_T_certified_acc"] = len(larger_T_idx) / n_images
        summary["larger_T_certified_idx"] = sorted(larger_T_idx)
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(summary, fh, indent=2)
    return summary


@dataclasses.dataclass
class CertifyResult:
    clean: np.ndarray  # (n_images,) bool
    certified: np.ndarray  # (n_images,) bool
    cells_per_image: int
    cells_checked: int
    seconds: float
    # filled by method='lipschitz' (grid-gap slack dropped); None for crown
    larger_T_certified: Optional[np.ndarray] = None

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
        alpha_iters: int = 0,
        alpha_objective: str = "vdot",
        matmul_precision: str = "float32",
        mesh: Optional[Mesh] = None,
    ):
        self.model = model
        self.params = params
        # SPMD layout of the (images x cells) superchunk. A 1-D mesh (any
        # single axis name) shards the long cell axis — the round-2
        # configuration, pinned all-gather-free by
        # tests/test_parallel_certify.py. A 2-D ("img", "cell") mesh (see
        # parallel.mesh.make_mesh2d) additionally shards the image batch,
        # so the only cross-device communication is the per-image running
        # max: a reduce over the cell axis, riding the innermost ICI ring.
        self.mesh = mesh
        self._shard_img, self._shard_cell = _mesh_placers(mesh)
        self.T = T
        self.eps = 1.0 / T  # per-cell Linf radius (certify_crown.py:59-62)
        self.chunk = chunk
        self.scale_nominal = scale_nominal
        self.with_upper = with_upper
        # alpha-CROWN refinement steps per chunk (0 = plain CROWN, the
        # reference's method; >0 tightens the ReLU lower slopes).
        # alpha_objective picks what the slopes are optimized against:
        #   "vdot"  — the certified quantity itself (through the QP interval
        #             propagation; its 30-iteration bisection is nearly
        #             piecewise-constant, so gradients are noisy and each
        #             iter costs ~2x the full chain);
        #   "width" — total MLP bound width sum(ub - lb) per cell, a smooth
        #             surrogate with a much cheaper gradient (no QP in the
        #             differentiated graph).  Sum-width minimization does
        #             NOT imply elementwise containment, so the best
        #             iterate is selected by the certified quantity
        #             (select_fn) — never worse than plain CROWN.
        # Soundness is unaffected either way (every alpha in [0,1] is sound).
        self.alpha_iters = int(alpha_iters)
        if alpha_objective not in ("vdot", "width"):
            raise ValueError(alpha_objective)
        self.alpha_objective = alpha_objective
        # certification-grade numerics: TPU matmuls default to bf16
        # passes whose ~1e-2 rounding can flip borderline cells either
        # way (observed run-to-run on v5e); certificates are computed at
        # float32 unless the caller explicitly trades soundness margin
        # for speed.  The reference certifies in fp32 CUDA throughout.
        self.matmul_precision = matmul_precision
        self.n = model.dynamics.n_hidden
        dyn = model.dynamics
        self.alpha_1, self.alpha_2, self.sigma_1 = (
            dyn.alpha_1,
            dyn.alpha_2,
            dyn.sigma_1,
        )
        if std_min is None:
            std_min = float(np.min(getattr(model.backbone, "std", (1.0,))))
        # Lipschitz of dynamics wrt x through the Lip-1 backbone + Normalize.
        # CROWN uses 1/min(std) unconditionally (certify_crown.py:65-67);
        # the Lipschitz certificate must widen by alpha_1 when scale_nominal
        # is on — the sigmoid rescaling multiplies the input sensitivity
        # (certify_lipschitz.py:67-72: Lfx = alpha_1/min(std) in that case).
        self.Lfx = 1.0 / std_min
        self.kappa = float(np.sqrt(2.0) * self.Lfx * eps_input)
        lfx_lips = (dyn.alpha_1 if scale_nominal else 1.0) / std_min
        self.kappa_lips = float(np.sqrt(2.0) * lfx_lips * eps_input)

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
        if len(self.grid) == 0:
            raise ValueError(
                "Certifier needs a non-empty decision-boundary grid"
            )

        self._crown_chunk = self._make_crown_chunk()
        self._lips_chunk = self._make_lips_chunk()
        # model.predict passes params.get("output") (output='linear' needs
        # it) and uses the bounded-scan integrator (while-loop predicates
        # cost a host round trip per step on relay-attached TPUs).  The
        # clean check must integrate the SAME field the certificate bounds:
        # thread this certifier's scale_nominal rather than the flax
        # module's static constructor flag (which stays True on models
        # whose training turned scaling off at epoch_off_scale).
        self._predict = jax.jit(
            lambda p, x: jnp.argmax(
                self.model.predict(
                    p, x, mode="scan", scale_nominal=self.scale_nominal
                ),
                -1,
            )
        )
        self._features = jax.jit(self.model.features)

    # -- CROWN ---------------------------------------------------------------

    def _make_crown_chunk(self):
        eps = self.eps
        a1, a2, s1 = self.alpha_1, self.alpha_2, self.sigma_1

        def one(Ws, bs, x_bias, label, perm, eta, valid):
            # per-image: cells permuted in-kernel (grid_for_label's column
            # swap, eval_utils.py:64-69) so every image shares one base grid
            eta_l = eta[:, perm]
            x_rows = jnp.broadcast_to(x_bias, (eta.shape[0], x_bias.shape[-1]))

            def post(lb, ub):
                # the rest of the certificate chain after the MLP bounds
                if self.scale_nominal:
                    lb, ub = ibp_sigmoid(
                        lb, ub, eta_l - eps, eta_l + eps, a1, s1, a2
                    )
                f_lb, f_ub = ibp_cbf_qp(
                    eta_l, eps, lb, ub, a1, s1, a2,
                    with_upper=self.with_upper,
                )
                return worst_case_vdot(eta_l, eps, f_lb, f_ub, label)

            alphas = None
            if self.alpha_iters:
                # tighten the ReLU lower slopes (sound for every iterate);
                # objective per self.alpha_objective (see __init__)
                if self.alpha_objective == "width":
                    # gradient from the smooth width surrogate, but the
                    # per-cell best iterate is SELECTED by the certified
                    # quantity itself: sum-width minimization does not
                    # imply elementwise [lb,ub] containment, so without
                    # this the width objective could lose a certificate
                    # plain CROWN (iterate 0) had
                    alpha_loss = lambda lb, ub: jnp.sum(ub - lb, axis=-1)
                    alpha_select = post
                else:
                    alpha_loss = post
                    alpha_select = None
                alphas = optimize_crown_alphas(
                    Ws, bs, eta_l, eps, x_rows, loss_fn=alpha_loss,
                    iters=self.alpha_iters, select_fn=alpha_select,
                )
            lb, ub = crown_mlp_bounds(Ws, bs, eta_l, eps, x_rows, alphas)
            vdot = post(lb, ub)
            vdot = jnp.where(valid, vdot, -jnp.inf)
            return jnp.max(vdot) + self.kappa

        @jax.jit
        def superchunk_fn(Ws, bs, x_biases, labels, perms, etas, valids,
                          worst0):
            """All images x K chunks in ONE program (one device sync).

            x_biases (I, m1), labels (I,), perms (I, n), etas (K, C, n),
            valids (K, C), worst0 (I,) running per-image worst Vdot+kappa.
            The reference sweeps grid batches per image in Python
            (certify_crown.py:122-153); here the image axis is vmapped into
            the same einsums so the MXU sees (I*C)-row batches.
            """

            def body(i, worst):
                w = jax.vmap(
                    one, in_axes=(None, None, 0, 0, 0, None, None)
                )(Ws, bs, x_biases, labels, perms, etas[i], valids[i])
                return jnp.maximum(worst, w)

            with jax.default_matmul_precision(self.matmul_precision):
                return jax.lax.fori_loop(0, etas.shape[0], body, worst0)

        return superchunk_fn

    # -- Lipschitz -----------------------------------------------------------

    def _make_lips_chunk(self):
        a1, s1 = self.alpha_1, self.sigma_1
        n = self.n
        eps = self.eps
        dist = float(np.sqrt(n)) / self.T  # grid gap (certify_lipschitz.py:79-83)

        def one(params, feats, label, perm, eta, valid):
            eta_l = eta[:, perm]
            x_in = jnp.broadcast_to(feats, (eta.shape[0], feats.shape[-1]))
            f = self.model.eval_dot(
                params, eta_l, x_in, scale_nominal=self.scale_nominal
            )
            onehot = jax.nn.one_hot(label, n, dtype=bool)
            wrong = jnp.where(onehot, -jnp.inf, eta_l)
            max_wrong = jnp.max(wrong, axis=-1, keepdims=True)
            runner = (eta_l == max_wrong) & ~onehot
            f_y = jnp.sum(jnp.where(onehot, f, 0.0), -1)
            f_w = jnp.max(jnp.where(runner, f, -jnp.inf), -1)
            vdot = -f_y + f_w
            eta_ub = jnp.max(eta_l, -1) + eps
            Lf_eta = jnp.sqrt(float(n)) * (s1 * a1 * jnp.exp(s1 * eta_ub)) + 1.0
            slack = jnp.sqrt(2.0) * Lf_eta * dist
            v_full = jnp.where(valid, vdot + slack + self.kappa_lips,
                               -jnp.inf)
            v_larger_T = jnp.where(valid, vdot + self.kappa_lips, -jnp.inf)
            return jnp.max(v_full), jnp.max(v_larger_T)

        @jax.jit
        def superchunk_fn(params, feats, labels, perms, etas, valids,
                          worst0):
            def body(i, carry):
                wf, wl = carry
                vf, vl = jax.vmap(
                    one, in_axes=(None, 0, 0, 0, None, None)
                )(params, feats, labels, perms, etas[i], valids[i])
                return jnp.maximum(wf, vf), jnp.maximum(wl, vl)

            with jax.default_matmul_precision(self.matmul_precision):
                return jax.lax.fori_loop(0, etas.shape[0], body, worst0)

        return superchunk_fn

    def _make_witness_chunk(self):
        n = self.n

        def one(params, feats, label, perm, eta, valid):
            # exact Vdot at the lattice point (the larger-T quantity,
            # certify_lipschitz.py:131,142-143) + its in-chunk argmax
            eta_l = eta[:, perm]
            x_in = jnp.broadcast_to(feats, (eta.shape[0], feats.shape[-1]))
            f = self.model.eval_dot(
                params, eta_l, x_in, scale_nominal=self.scale_nominal
            )
            onehot = jax.nn.one_hot(label, n, dtype=bool)
            wrong = jnp.where(onehot, -jnp.inf, eta_l)
            max_wrong = jnp.max(wrong, axis=-1, keepdims=True)
            runner = (eta_l == max_wrong) & ~onehot
            f_y = jnp.sum(jnp.where(onehot, f, 0.0), -1)
            f_w = jnp.max(jnp.where(runner, f, -jnp.inf), -1)
            v = jnp.where(valid, -f_y + f_w + self.kappa_lips, -jnp.inf)
            j = jnp.argmax(v)
            return v[j], j.astype(jnp.int32)

        @jax.jit
        def superchunk_fn(params, feats, labels, perms, etas, valids,
                          carry, base_idx):
            C = etas.shape[1]

            def body(i, carry):
                wv, wi = carry
                v, j = jax.vmap(
                    one, in_axes=(None, 0, 0, 0, None, None)
                )(params, feats, labels, perms, etas[i], valids[i])
                idx = base_idx + i * C + j
                better = v > wv
                return (jnp.where(better, v, wv),
                        jnp.where(better, idx, wi))

            with jax.default_matmul_precision(self.matmul_precision):
                return jax.lax.fori_loop(0, etas.shape[0], body, carry)

        return superchunk_fn

    def exact_witness(self, images: np.ndarray, labels: np.ndarray):
        """Per-image argmax witness of the exact grid sweep.

        For each image, evaluates the EXACT Vdot + kappa_lips at every grid
        lattice point (the larger-T certificate's quantity,
        certify_lipschitz.py:131,142-143) and returns the maximising cell.
        A strictly positive witness REFUTES certifiability of that image at
        this (T, eps, kappa) protocol for any sound box method: the lattice
        point is the center of its cell's box, so every sound upper bound
        over any box containing it — plain/alpha CROWN, every BaB sub-box
        chain — is >= the exact value > 0, and the grid always contains a
        positive cell.  A negative witness is the image's exact margin: the
        slack branch-and-bound must close with bound tightening alone.

        Returns ``(values (N,), cell_idx (N,) int32 into self.grid,
        clean (N,) bool)``.  ``cell_idx`` rows index the RAW grid (coord-0
        tied); apply the image's label swap for label-space coordinates.
        """
        n_imgs = len(images)
        labels = np.asarray(labels)
        preds = np.asarray(self._predict(self.params, jnp.asarray(images)))
        clean = preds == labels
        feats = jnp.asarray(
            np.asarray(self._features(self.params, jnp.asarray(images)))
        )
        labs = labels.astype(np.int32)
        perms = np.tile(np.arange(self.n, dtype=np.int32), (n_imgs, 1))
        perms[np.arange(n_imgs), 0] = labs
        perms[np.arange(n_imgs), labs] = 0
        witness_fn = self._make_witness_chunk()
        carry = (
            jnp.full(n_imgs, -jnp.inf, jnp.float32),
            jnp.zeros(n_imgs, jnp.int32),
        )
        superchunk = 16
        base = 0
        labs_j, perms_j = jnp.asarray(labs), jnp.asarray(perms)
        for etas, valids in self._iter_chunks(superchunk):
            carry = witness_fn(
                self.params, feats, labs_j, perms_j,
                self._shard_cell(etas), self._shard_cell(valids),
                carry, jnp.int32(base),
            )
            base += etas.shape[0] * etas.shape[1]
        vals = np.asarray(carry[0])
        idxs = np.asarray(carry[1])
        return vals, idxs, clean

    # -- drivers -------------------------------------------------------------

    def _iter_chunks(self, superchunk: int = 16):
        """Yield (K, C, n) base-grid cell blocks + (K, C) validity masks.

        Label-independent: the per-label column swap (grid_for_label)
        happens inside the jitted chunk kernels via per-image permutation
        indices, so all images share each block."""
        g = self.grid
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
        """Certify a batch of images.

        All clean-correct images are swept together: every jitted superchunk
        call bounds (n_images x chunk) cells, maintaining one running
        per-image worst value — the batched replacement for the reference's
        image-outer/grid-inner loops (certify_crown.py:122-153).
        ``early_exit`` stops the sweep once EVERY image is already violated
        (with one image the semantics match the reference's per-image break,
        certify_crown.py:149-153).
        """
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

        clean_idx = np.nonzero(clean)[0]
        I = len(clean_idx)
        if I:
            # pad the image axis to a multiple of the mesh's img-axis size
            # (sharded dims must divide evenly); padded rows start at +inf
            # worst so they read "already violated" everywhere and are
            # sliced off before verdicts
            img_shards = _img_axis_size(self.mesh)
            Ip = -(-I // img_shards) * img_shards
            sel = np.concatenate(
                [clean_idx, np.repeat(clean_idx[:1], Ip - I)]
            )
            labs = np.asarray(labels)[sel].astype(np.int32)
            # perm per image: eta_l = eta[:, perm] swaps columns 0 <-> label
            perms = np.tile(np.arange(self.n, dtype=np.int32), (Ip, 1))
            perms[np.arange(Ip), 0] = labs
            perms[np.arange(Ip), labs] = 0
            labs_j = self._shard_img(jnp.asarray(labs))
            perms_j = self._shard_img(jnp.asarray(perms))
            feats_c = self._shard_img(jnp.asarray(all_feats[sel]))
            pad_inf = np.concatenate(
                [np.full(I, -np.inf, np.float32),
                 np.full(Ip - I, np.inf, np.float32)]
            )
            n_blocks = 0
            if method == "crown":
                x_biases = self._shard_img(
                    feats_c @ jnp.asarray(self.U).T + jnp.asarray(self.bU)
                )
                worst = self._shard_img(jnp.asarray(pad_inf))
                for etas, valids in self._iter_chunks():
                    worst = self._crown_chunk(
                        Ws, bs, x_biases, labs_j, perms_j,
                        self._shard_cell(etas), self._shard_cell(valids),
                        worst,
                    )
                    cells_checked += int(valids.sum()) * I
                    n_blocks += 1
                    # host sync per superchunk; padded rows sliced off
                    worst_h = np.asarray(worst)[:I]
                    if progress_every and n_blocks % progress_every == 0:
                        el = time.time() - t0
                        print(
                            f"[certify:{method}] block {n_blocks} "
                            f"viol={(worst_h > 0).mean():.3f} "
                            f"({cells_checked/max(el,1e-9):,.0f} cells/s)",
                            flush=True,
                        )
                    if early_exit and (worst_h > 0).all():
                        break
                certified[clean_idx] = worst_h <= 0
            elif method == "lipschitz":
                worst = (
                    self._shard_img(jnp.asarray(pad_inf)),
                    self._shard_img(jnp.asarray(pad_inf)),
                )
                for etas, valids in self._iter_chunks():
                    worst = self._lips_chunk(
                        self.params, feats_c, labs_j, perms_j,
                        self._shard_cell(etas), self._shard_cell(valids),
                        worst,
                    )
                    cells_checked += int(valids.sum()) * I
                    n_blocks += 1
                    w_full = np.asarray(worst[0])[:I]
                    if progress_every and n_blocks % progress_every == 0:
                        el = time.time() - t0
                        print(
                            f"[certify:{method}] block {n_blocks} "
                            f"viol={(w_full >= 0).mean():.3f} "
                            f"({cells_checked/max(el,1e-9):,.0f} cells/s)",
                            flush=True,
                        )
                    # The larger-T certificate drops the grid-gap slack, so
                    # its worst value is <= the full one: exit only once BOTH
                    # certificates are violated for every image, else a
                    # truncated sweep could emit an unsound larger-T result.
                    if early_exit and (np.asarray(worst[1])[:I] >= 0).all():
                        break
                certified[clean_idx] = w_full < 0
                larger_T_certified[clean_idx] = np.asarray(worst[1])[:I] < 0
            else:
                raise ValueError(method)

        res = CertifyResult(
            clean=clean,
            certified=certified,
            cells_per_image=len(self.grid),
            cells_checked=cells_checked,
            seconds=time.time() - t0,
        )
        res.larger_T_certified = larger_T_certified
        return res

    def certify_stream(
        self,
        images: np.ndarray,
        labels: np.ndarray,
        method: str = "crown",
        image_batch: int = 10,
        out_path: Optional[str] = None,
        start_ind: int = 0,
    ) -> CertifyResult:
        """Protocol-style streamed sweep: certify images in batches,
        printing cumulative clean/certified accuracy after every batch
        (the reference streams its running ratios every 10 images,
        certify_crown.py:161-166) and appending one JSON line per batch to
        ``out_path`` (resume-friendly audit log; final summary written to
        ``out_path`` with suffix .json).

        ``start_ind`` only offsets the printed/recorded test indices
        (certify_crown.py:122 sweeps indices [start_ind, end_ind))."""
        import json

        n = len(images)
        clean = np.zeros(n, bool)
        certified = np.zeros(n, bool)
        larger_T = np.zeros(n, bool)
        cells_checked = 0
        t0 = time.time()
        log_fh = open(out_path, "a") if out_path else None
        try:
            for i in range(0, n, image_batch):
                sl = slice(i, min(i + image_batch, n))
                r = self.certify(images[sl], labels[sl], method=method,
                                 early_exit=True)
                clean[sl] = r.clean
                certified[sl] = r.certified
                larger_T[sl] = r.larger_T_certified
                cells_checked += r.cells_checked
                done = sl.stop
                el = time.time() - t0
                msg = (
                    f"[certify:{method}] idx {start_ind}..."
                    f"{start_ind + done - 1}: "
                    f"clean {clean[:done].sum()}/{done} "
                    f"certified {certified[:done].sum()}/{done} "
                    f"({cells_checked / max(el, 1e-9):,.0f} cells/s, "
                    f"{el:,.0f}s)"
                )
                print(msg, flush=True)
                if log_fh:
                    line = {
                        "idx_from": start_ind + sl.start,
                        "idx_to": start_ind + done - 1,
                        "clean": int(clean[:done].sum()),
                        "certified": int(certified[:done].sum()),
                        "n": done,
                        "batch_certified_idx": (
                            start_ind + sl.start
                            + np.nonzero(r.certified)[0]
                        ).tolist(),
                        "cells_checked": cells_checked,
                        "seconds": el,
                        "matmul_precision": self.matmul_precision,
                    }
                    if method == "lipschitz":
                        # the larger-T verdicts are part of the headline
                        # lipschitz result — without them in the audit log
                        # a killed sweep's completed batches would lose
                        # their exact-grid certificates on resume
                        line["batch_larger_T_idx"] = (
                            start_ind + sl.start
                            + np.nonzero(np.asarray(r.larger_T_certified))[0]
                        ).tolist()
                    log_fh.write(json.dumps(line) + "\n")
                    log_fh.flush()
        finally:
            if log_fh:
                log_fh.close()
        res = CertifyResult(
            clean=clean,
            certified=certified,
            cells_per_image=len(self.grid),
            cells_checked=cells_checked,
            seconds=time.time() - t0,
        )
        res.larger_T_certified = larger_T
        if out_path:
            summary = {
                "n_images": n,
                "start_ind": start_ind,
                "method": method,
                "matmul_precision": self.matmul_precision,
                "T": self.T,
                "kappa": (self.kappa if method == "crown"
                          else self.kappa_lips),
                "clean_acc": res.clean_acc,
                "certified_acc": res.certified_acc,
                "certified_idx": (
                    start_ind + np.nonzero(certified)[0]
                ).tolist(),
                "clean_idx": (start_ind + np.nonzero(clean)[0]).tolist(),
                "cells_checked": cells_checked,
                "cells_per_sec": res.cells_per_sec,
                "seconds": res.seconds,
            }
            if method == "lipschitz":
                summary["larger_T_certified_acc"] = float(larger_T.mean())
                summary["larger_T_certified_idx"] = (
                    start_ind + np.nonzero(larger_T)[0]
                ).tolist()
            with open(str(out_path) + ".json", "w") as fh:
                json.dump(summary, fh, indent=2)
        return res

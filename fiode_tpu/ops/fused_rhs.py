"""Fused ODE right-hand side: one Pallas kernel per RHS evaluation.

The hot loop of every forward solve / attack / certification sweep is
f(h) = QP-project(W3 relu(W2 relu(W1 h + xc)) + b3) evaluated NFE x batch
times (SURVEY.md §2.6).  Unfused, each evaluation is ~40 small XLA ops (3
tiny matmuls + the 30-iteration bisection), each paying per-op overhead on
tiny (N, 10) tensors.  This kernel keeps the whole evaluation — matmuls on
the MXU, barrier/bisection on the VPU — inside one VMEM-resident Pallas
program, tiled over the batch.

Layout: the simplex dimension n (10) is padded to the 128-lane width; weight
matrices are padded to (128, 128) once per solve (hoisted out of the
integration loop by XLA, as is the input injection xc = U x_feat + b1 + bU,
which is h-independent — the reference recomputes U_x(x) every RHS call,
dynamics/classification.py:97).

Differentiation: `fused_rhs` carries a custom VJP.  On TPU (scale_nominal
off — the certification/attack configuration) the backward is ALSO one
Pallas kernel: it recomputes z1/z2/mu in VMEM, applies the closed-form
active-set QP VJP, walks the MLP transposes on the MXU, and accumulates
parameter gradients across batch blocks (the TPU grid is sequential, so
the += into the weight-grad blocks is race-free).  Elsewhere (CPU, or
scale_nominal=True) the backward is the VJP of the pure-jnp reference
implementation (`rhs_reference`) — same math, op-by-op.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


LANE = 128

__all__ = ["FusedRhsParams", "pack_rhs_params", "fused_rhs", "rhs_reference"]


class FusedRhsParams(NamedTuple):
    W1: jax.Array  # (LANE, LANE)  rows: mlp, cols: n (padded)
    W2: jax.Array  # (LANE, LANE)
    W3: jax.Array  # (LANE, LANE)  rows: n (padded), cols: mlp
    b2: jax.Array  # (LANE,)
    b3: jax.Array  # (LANE,)


def pack_rhs_params(W1, W2, W3, b2, b3) -> FusedRhsParams:
    """Zero-pad dense dynamics weights to LANE x LANE."""
    def pad2(W):
        out = jnp.zeros((LANE, LANE), W.dtype)
        return out.at[: W.shape[0], : W.shape[1]].set(W)

    def pad1(b):
        out = jnp.zeros((LANE,), b.dtype)
        return out.at[: b.shape[0]].set(b)

    return FusedRhsParams(pad2(W1), pad2(W2), pad2(W3), pad1(b2), pad1(b3))


def _masked_bisect(lower, nominal, mask, qp_iters):
    """Bisection for mu on masked lanes; padded lanes are ignored."""
    big = jnp.asarray(1e30, nominal.dtype)
    mu_hi = jnp.max(
        jnp.where(mask, nominal - lower, -big), axis=-1, keepdims=True
    )
    mu_lo = jnp.min(jnp.where(mask, nominal, big), axis=-1, keepdims=True)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        v = jnp.maximum(nominal - mid, lower)
        s = jnp.sum(jnp.where(mask, v, 0.0), axis=-1, keepdims=True)
        lo = jnp.where(s > 0, mid, lo)
        hi = jnp.where(s < 0, mid, hi)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, qp_iters, body, (mu_lo, mu_hi))
    return 0.5 * (lo + hi)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def masked_cone_project(lower, nominal, mask, qp_iters=30):
    """simplex_cone_project restricted to masked lanes (padded tiles),
    with the same closed-form active-set VJP as ops/simplex_qp."""
    mu = _masked_bisect(lower, nominal, mask, qp_iters)
    return jnp.where(mask, jnp.maximum(nominal - mu, lower), 0.0)


def _mcp_fwd(lower, nominal, mask, qp_iters):
    mu = _masked_bisect(lower, nominal, mask, qp_iters)
    v = jnp.where(mask, jnp.maximum(nominal - mu, lower), 0.0)
    return v, (mu, lower, nominal, mask)


def _mcp_bwd(qp_iters, res, g):
    mu, lower, nominal, mask = res
    active = ((nominal - mu) < lower) & mask
    free = mask & ~active
    g = jnp.where(mask, g, 0.0)
    n_free = jnp.maximum(
        jnp.sum(free, axis=-1, keepdims=True).astype(g.dtype), 1.0
    )
    corr = jnp.sum(jnp.where(free, g, 0.0), axis=-1, keepdims=True) / n_free
    d_nominal = jnp.where(free, g - corr, 0.0)
    d_lower = jnp.where(active, g - corr, 0.0)
    return d_lower, d_nominal, None


masked_cone_project.defvjp(_mcp_fwd, _mcp_bwd)


def _barrier_and_qp(h, f_tilde, mask, alpha_1, sigma_1, alpha_2,
                    scale_nominal, qp_iters):
    """Shared barrier + projection body (works on padded (B, LANE) tiles)."""
    lower = -alpha_1 * (jnp.exp(sigma_1 * h) - 1.0)
    if scale_nominal:
        upper = alpha_2 * (1.0 - h)
        f_tilde = (upper - lower) * jax.nn.sigmoid(f_tilde) + lower
    return masked_cone_project(lower, f_tilde, mask, qp_iters)


def rhs_reference(h_pad, xc_pad, p: FusedRhsParams, n: int, alpha_1, sigma_1,
                  alpha_2, scale_nominal: bool, qp_iters: int = 30):
    """Pure-jnp reference on padded tiles (CPU fallback + VJP source)."""
    mask = (jnp.arange(LANE) < n)[None, :]
    z1 = jax.nn.relu(
        jnp.dot(h_pad, p.W1.T, preferred_element_type=jnp.float32) + xc_pad
    )
    z2 = jax.nn.relu(
        jnp.dot(z1, p.W2.T, preferred_element_type=jnp.float32) + p.b2
    )
    f_tilde = jnp.dot(z2, p.W3.T, preferred_element_type=jnp.float32) + p.b3
    return _barrier_and_qp(
        h_pad, f_tilde, mask, alpha_1, sigma_1, alpha_2, scale_nominal,
        qp_iters,
    )


def _make_pallas_forward(n, alpha_1, sigma_1, alpha_2, scale_nominal,
                         qp_iters, block, interpret: bool = False):
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu

    def kernel(h_ref, xc_ref, w1_ref, w2_ref, w3_ref, b2_ref, b3_ref, out_ref):
        h = h_ref[:]
        mask = jax.lax.broadcasted_iota(jnp.int32, h.shape, 1) < n
        z1 = jnp.maximum(
            jnp.dot(h, w1_ref[:].T, preferred_element_type=jnp.float32)
            + xc_ref[:],
            0.0,
        )
        z2 = jnp.maximum(
            jnp.dot(z1, w2_ref[:].T, preferred_element_type=jnp.float32)
            + b2_ref[:],
            0.0,
        )
        f_tilde = (
            jnp.dot(z2, w3_ref[:].T, preferred_element_type=jnp.float32)
            + b3_ref[:]
        )
        out_ref[:] = _barrier_and_qp(
            h, f_tilde, mask, alpha_1, sigma_1, alpha_2, scale_nominal,
            qp_iters,
        )

    def forward(h_pad, xc_pad, p: FusedRhsParams):
        N = h_pad.shape[0]
        grid = (pl.cdiv(N, block),)
        blk = lambda i: (i, 0)
        full = lambda i: (0, 0)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, LANE), h_pad.dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((block, LANE), blk, memory_space=pltpu.VMEM),
                pl.BlockSpec((block, LANE), blk, memory_space=pltpu.VMEM),
                pl.BlockSpec((LANE, LANE), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((LANE, LANE), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((LANE, LANE), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block, LANE), blk, memory_space=pltpu.VMEM),
            cost_estimate=pl.CostEstimate(
                flops=2 * N * LANE * LANE * 3 + N * LANE * qp_iters * 4,
                bytes_accessed=N * LANE * 4 * 3 + LANE * LANE * 4 * 3,
                transcendentals=N * LANE * (2 if scale_nominal else 1),
            ),
            interpret=interpret,
        )(h_pad, xc_pad, p.W1, p.W2, p.W3, p.b2[None], p.b3[None])

    return forward


def _make_pallas_backward(n, alpha_1, sigma_1, qp_iters, block,
                          interpret: bool = False):
    """Fused VJP kernel for scale_nominal=False (the live certify/attack
    configuration; scale_nominal training epochs fall back to the jnp VJP).

    One grid pass over batch blocks; per block it recomputes the forward
    intermediates, applies the active-set projection VJP
    (d_nominal = P_free (g - mean_free g), d_lower on the active set), then
    the relu-masked MLP transposes.  Weight/bias grads accumulate in place —
    sound because the TPU Pallas grid executes blocks sequentially."""
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu

    def kernel(nrows_ref, h_ref, xc_ref, g_ref, w1_ref, w2_ref, w3_ref,
               b2_ref, b3_ref, dh_ref, dxc_ref, dw1_ref, dw2_ref, dw3_ref,
               db2_ref, db3_ref):
        i = pl.program_id(0)
        nrows = nrows_ref[0]
        row = i * block + jax.lax.broadcasted_iota(
            jnp.int32, (block, LANE), 0
        )
        rvalid = row < nrows  # guard the ragged last block
        h = jnp.where(rvalid, h_ref[:], 0.0)
        xc = jnp.where(rvalid, xc_ref[:], 0.0)
        g = jnp.where(rvalid, g_ref[:], 0.0)
        W1, W2, W3 = w1_ref[:], w2_ref[:], w3_ref[:]
        mask = (jax.lax.broadcasted_iota(jnp.int32, h.shape, 1) < n) & rvalid

        # recompute forward intermediates (cheaper than storing them)
        z1 = jnp.maximum(
            jnp.dot(h, W1.T, preferred_element_type=jnp.float32) + xc, 0.0
        )
        z2 = jnp.maximum(
            jnp.dot(z1, W2.T, preferred_element_type=jnp.float32) + b2_ref[:],
            0.0,
        )
        f_tilde = (
            jnp.dot(z2, W3.T, preferred_element_type=jnp.float32) + b3_ref[:]
        )
        lower = -alpha_1 * (jnp.exp(sigma_1 * h) - 1.0)
        mu = _masked_bisect(lower, f_tilde, mask, qp_iters)

        # active-set VJP of the cone projection (mirrors _mcp_bwd)
        active = ((f_tilde - mu) < lower) & mask
        free = mask & ~active
        gm = jnp.where(mask, g, 0.0)
        n_free = jnp.maximum(
            jnp.sum(free, axis=-1, keepdims=True).astype(g.dtype), 1.0
        )
        corr = jnp.sum(jnp.where(free, gm, 0.0), -1, keepdims=True) / n_free
        d_ft = jnp.where(free, gm - corr, 0.0)
        d_lower = jnp.where(active, gm - corr, 0.0)

        # barrier d lower/dh, then the relu-masked MLP transposes
        dh = d_lower * (-alpha_1 * sigma_1 * jnp.exp(sigma_1 * h))
        d_pre2 = jnp.dot(d_ft, W3, preferred_element_type=jnp.float32)
        d_pre2 = jnp.where(z2 > 0, d_pre2, 0.0)
        d_pre1 = jnp.dot(d_pre2, W2, preferred_element_type=jnp.float32)
        d_pre1 = jnp.where(z1 > 0, d_pre1, 0.0)
        dh = dh + jnp.dot(d_pre1, W1, preferred_element_type=jnp.float32)
        dh_ref[:] = dh
        dxc_ref[:] = d_pre1

        dW1 = jnp.dot(d_pre1.T, h, preferred_element_type=jnp.float32)
        dW2 = jnp.dot(d_pre2.T, z1, preferred_element_type=jnp.float32)
        dW3 = jnp.dot(d_ft.T, z2, preferred_element_type=jnp.float32)
        db2 = jnp.sum(d_pre2, 0, keepdims=True)
        db3 = jnp.sum(d_ft, 0, keepdims=True)

        @pl.when(i == 0)
        def _init():
            dw1_ref[:] = jnp.zeros_like(dw1_ref)
            dw2_ref[:] = jnp.zeros_like(dw2_ref)
            dw3_ref[:] = jnp.zeros_like(dw3_ref)
            db2_ref[:] = jnp.zeros_like(db2_ref)
            db3_ref[:] = jnp.zeros_like(db3_ref)

        dw1_ref[:] += dW1
        dw2_ref[:] += dW2
        dw3_ref[:] += dW3
        db2_ref[:] += db2
        db3_ref[:] += db3

    def backward(h_pad, xc_pad, g, p: FusedRhsParams):
        N = h_pad.shape[0]
        grid = (pl.cdiv(N, block),)
        blk = lambda i: (i, 0)
        full = lambda i: (0, 0)
        f32 = jax.ShapeDtypeStruct
        nrows = jnp.asarray([N], jnp.int32)
        return pl.pallas_call(
            kernel,
            out_shape=(
                f32((N, LANE), h_pad.dtype),   # dh
                f32((N, LANE), h_pad.dtype),   # dxc
                f32((LANE, LANE), h_pad.dtype),  # dW1
                f32((LANE, LANE), h_pad.dtype),  # dW2
                f32((LANE, LANE), h_pad.dtype),  # dW3
                f32((1, LANE), h_pad.dtype),   # db2
                f32((1, LANE), h_pad.dtype),   # db3
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((block, LANE), blk, memory_space=pltpu.VMEM),
                pl.BlockSpec((block, LANE), blk, memory_space=pltpu.VMEM),
                pl.BlockSpec((block, LANE), blk, memory_space=pltpu.VMEM),
                pl.BlockSpec((LANE, LANE), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((LANE, LANE), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((LANE, LANE), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LANE), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LANE), full, memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((block, LANE), blk, memory_space=pltpu.VMEM),
                pl.BlockSpec((block, LANE), blk, memory_space=pltpu.VMEM),
                pl.BlockSpec((LANE, LANE), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((LANE, LANE), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((LANE, LANE), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LANE), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LANE), full, memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
        )(nrows, h_pad, xc_pad, g, p.W1, p.W2, p.W3, p.b2[None], p.b3[None])

    return backward


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9)
)
def fused_rhs(h_pad, xc_pad, p: FusedRhsParams, n: int, alpha_1, sigma_1,
              alpha_2, scale_nominal: bool = False, qp_iters: int = 30,
              block: int = 512):
    """Fused RHS on padded tiles: (N, LANE) x (N, LANE) x params -> (N, LANE).

    Uses the Pallas kernel on TPU and the jnp reference elsewhere."""
    if jax.default_backend() in ("tpu", "axon"):
        fwd = _make_pallas_forward(
            n, alpha_1, sigma_1, alpha_2, scale_nominal, qp_iters, block
        )
        return fwd(h_pad, xc_pad, p)
    return rhs_reference(
        h_pad, xc_pad, p, n, alpha_1, sigma_1, alpha_2, scale_nominal,
        qp_iters,
    )


def _fused_fwd(h_pad, xc_pad, p, n, a1, s1, a2, scale_nominal, qp_iters, block):
    out = fused_rhs(h_pad, xc_pad, p, n, a1, s1, a2, scale_nominal, qp_iters,
                    block)
    return out, (h_pad, xc_pad, p)


def _fused_bwd(n, a1, s1, a2, scale_nominal, qp_iters, block, res, g):
    h_pad, xc_pad, p = res
    if jax.default_backend() in ("tpu", "axon") and not scale_nominal:
        bwd = _make_pallas_backward(n, a1, s1, qp_iters, block)
        dh, dxc, dW1, dW2, dW3, db2, db3 = bwd(h_pad, xc_pad, g, p)
        return dh, dxc, FusedRhsParams(dW1, dW2, dW3, db2[0], db3[0])
    _, vjp = jax.vjp(
        lambda h, xc, pp: rhs_reference(
            h, xc, pp, n, a1, s1, a2, scale_nominal, qp_iters
        ),
        h_pad, xc_pad, p,
    )
    return vjp(g)


fused_rhs.defvjp(_fused_fwd, _fused_bwd)

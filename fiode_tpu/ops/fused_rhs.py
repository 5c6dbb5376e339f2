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

Differentiation: `fused_rhs` carries a custom VJP whose backward is the VJP
of the pure-jnp reference implementation (`rhs_reference`) — bitwise-close
forward, exact active-set/matmul backward, so the fused path is usable in
attacks and ODE-CE training too.
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
                         qp_iters, block):
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
        )(h_pad, xc_pad, p.W1, p.W2, p.W3, p.b2[None], p.b3[None])

    return forward


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
    _, vjp = jax.vjp(
        lambda h, xc, pp: rhs_reference(
            h, xc, pp, n, a1, s1, a2, scale_nominal, qp_iters
        ),
        h_pad, xc_pad, p,
    )
    return vjp(g)


fused_rhs.defvjp(_fused_fwd, _fused_bwd)

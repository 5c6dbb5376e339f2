"""Fused Pallas kernel for the Fourier-domain orthogonal convolution.

The XLA path (`ops/cayley.apply_freq_matrices`, impl='dft') lowers one Cayley
conv layer to five HBM-round-tripping stages: two DFT GEMMs, a batched
per-frequency complex mix, and two inverse GEMMs — ~7 GB of intermediate
traffic per 8k-image KWLarge layer.  This kernel keeps the whole chain
resident in VMEM: for each (batch-tile, frequency-block) grid step it

    1. forward-DFTs the batch tile against a (Fb, n^2) slice of the dense
       rDFT matrix (MXU GEMM, K = n^2),
    2. applies the per-frequency (co, ci) mixing matrices of the block
       (batched complex matmul as four real ones),
    3. accumulates the inverse-DFT partial product into the output tile
       (MXU GEMM over the frequency block),

so the Fourier-domain activations never leave the chip.  The frequency axis
is the accumulation (innermost) grid dimension; the output tile lives in
VMEM across it.

Semantics match `apply_freq_matrices(x, Q)` exactly (same dense-DFT
formulation, reference libs/ortho_conv capability; FI-ODE
dynamics/classification.py:69-75 uses these layers); the backward pass
falls back to the jnp reference path via custom_vjp, mirroring
`ops/fused_rhs`.

Environment gate: layers use this kernel when FIODE_FUSED_CONV=1 (off by
default).

Measured verdict (v5e, B=8192, ci=co=32, n=32, through the axon relay):
the kernel lowers and runs at bt<=16 (42.8 ms/layer at bt=16/fb=136) but
LOSES to the XLA dense-DFT path (22.3 ms/layer).  Two structural reasons:
(a) Mosaic pads the 32-wide mixing operands to 128 lanes, quadrupling
their VMEM footprint and capping the batch tile at 16 (bt=32 exhausts
VMEM), and (b) the per-frequency (32x32) mixing matmuls run the MXU at
~6% utilisation regardless of fusion.  XLA's giant un-fused GEMMs win on
this hardware; the kernel is kept as a correct, tested fusion workbench
(and the measured numbers as the record of why the default is off).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .cayley import _dft2_mats, apply_freq_matrices

__all__ = ["fused_freq_apply"]


def _pick_block_f(F: int) -> int:
    """Largest divisor of F that is <= 160 and a multiple of 8 (f32
    sublane); falls back to F itself (interpret mode / odd sizes)."""
    best = F
    for d in range(8, 161, 8):
        if F % d == 0:
            best = d
    return best


def _fused_forward(x, Qr, Qi, *, block_b, interpret):
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu

    B, ci, n, _ = x.shape
    F, co, _ = Qr.shape
    p = n * n
    D2, M2 = _dft2_mats(n)
    D2 = jnp.asarray(D2)
    M2 = jnp.asarray(M2)

    bt = min(block_b, B)
    pad_b = (-B) % bt
    if pad_b:
        x = jnp.concatenate(
            [x, jnp.zeros((pad_b,) + x.shape[1:], x.dtype)], 0
        )
    Bp = x.shape[0]
    fb = _pick_block_f(F)
    xp = x.reshape(Bp, ci, p)
    M2T = M2.T  # (F, p): TPU lowering wants trailing block dims (8,128)-
    # divisible or full-size; a (p, Fb) column block of M2 violates that,
    # an (Fb, p) row block of M2^T satisfies it

    def kernel(x_ref, d2r_ref, d2i_ref, qr_ref, qi_ref, m2r_ref, m2i_ref,
               out_ref):
        """One (batch-tile i, frequency-block j) grid step.

        x_ref   (BT, ci, p)   batch tile, p = n*n spatial pixels
        d2*_ref (Fb, p)       forward rDFT rows of this frequency block
        q*_ref  (Fb, co, ci)  per-frequency mixing matrices
        m2*_ref (Fb, p)       inverse rDFT rows (M2^T) of this block
        out_ref (BT, co, p)   accumulated across the frequency axis
        """
        j = pl.program_id(1)

        # Mosaic constraints shape this dataflow (probed on v5e): 3-D x 2-D
        # dot_generals lower, 2-D x 3-D and lane-splitting reshapes do not,
        # and batched dots need an identity reshape to force the canonical
        # (batch, lhs-free, rhs-free) layout before storing.

        # 1. forward DFT: (BT, ci, p) . (Fb, p) -> (BT, ci, Fb) -> (Fb, BT, ci)
        tr = (((2,), (1,)), ((), ()))

        def fdot(m):
            t = jax.lax.dot_general(x_ref[:], m, tr,
                                    preferred_element_type=jnp.float32)
            return jnp.transpose(t, (2, 0, 1))

        xfr = fdot(d2r_ref[:])
        xfi = fdot(d2i_ref[:])

        # 2. per-frequency mix: (Fb, BT, ci) x (Fb, co, ci) -> (Fb, BT, co)
        mix = (((2,), (2,)), ((0,), (0,)))

        def bdot(v, q):
            r = jax.lax.dot_general(v, q, mix,
                                    preferred_element_type=jnp.float32)
            return r.reshape(fb, bt, co)

        yfr = bdot(xfr, qr_ref[:]) - bdot(xfi, qi_ref[:])
        yfi = bdot(xfi, qr_ref[:]) + bdot(xfr, qi_ref[:])

        # 3. inverse-DFT partial sum, oriented so the result IS the output
        #    tile: (BT, co, Fb) . (Fb, p) -> (BT, co, p)
        ytr = jnp.transpose(yfr, (1, 2, 0))
        yti = jnp.transpose(yfi, (1, 2, 0))
        acc = (((2,), (0,)), ((), ()))
        yr = jax.lax.dot_general(ytr, m2r_ref[:], acc,
                                 preferred_element_type=jnp.float32)
        yr -= jax.lax.dot_general(yti, m2i_ref[:], acc,
                                  preferred_element_type=jnp.float32)

        @pl.when(j == 0)
        def _():
            out_ref[:] = yr

        @pl.when(j > 0)
        def _():
            out_ref[:] = out_ref[:] + yr

    grid = (Bp // bt, F // fb)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, ci, p), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fb, p), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fb, p), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fb, co, ci), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fb, co, ci), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fb, p), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fb, p), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, co, p), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, co, p), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, D2.real, D2.imag, Qr, Qi, M2T.real, M2T.imag)

    y = out.reshape(Bp, co, n, n)
    return y[:B] if pad_b else y


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_freq_apply(x, Q, block_b: int = 16, interpret: bool = False):
    """Fused orthogonal-convolution apply: semantics of
    ``apply_freq_matrices(x, Q)`` with all intermediates VMEM-resident.

    Args:
      x: (B, ci, n, n) float32 input.
      Q: (F, co, ci) complex64 per-frequency semi-orthogonal matrices
         (``F = n * (n // 2 + 1)``).
      block_b: batch-tile size (VMEM budget knob).
      interpret: run under the pallas interpreter (CPU testing).

    Returns:
      (B, co, n, n) float32.
    """
    return _fused_forward(
        x, Q.real, Q.imag, block_b=block_b, interpret=interpret
    )


def _fused_fwd(x, Q, block_b, interpret):
    return fused_freq_apply(x, Q, block_b, interpret), (x, Q)


def _fused_bwd(block_b, interpret, res, g):
    # backward through the jnp reference path (one fused linear map; the
    # VJP is the transposed frequency application — cheap relative to the
    # forward-heavy inference workloads this kernel targets)
    x, Q = res
    _, vjp = jax.vjp(
        lambda x_, Q_: apply_freq_matrices(x_, Q_, impl="dft"), x, Q
    )
    return vjp(g)


fused_freq_apply.defvjp(_fused_fwd, _fused_bwd)

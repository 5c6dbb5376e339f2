"""Cayley-transform orthogonal parameterisations (dense + FFT convolution).

The reference's Lipschitz-1 layers come from its `libs/ortho_conv` submodule
(a fork of locuslab/orthogonal-convolutions; see FI-ODE README.md:69 and
dynamics/classification.py:69-75).  This module provides the same capability
surface, built TPU-first:

  * ``cayley(W)``        — dense Cayley transform producing an orthogonal
                           (or semi-orthogonal) matrix from an unconstrained
                           weight, used both inside layers and to densify
                           trained weights for certification
                           (reference dynamics/classification.py:281-294).
  * ``cayley_linear_kernel`` — the full CayleyLinear weight map
                           W -> cayley(alpha * W / ||W||).
  * ``cayley_conv_kernel`` / ``cayley_conv_apply`` — orthogonal convolution in
                           the Fourier domain: per-frequency Cayley transform
                           of the FFT'd kernel, applied by batched complex
                           matmuls (maps onto the MXU as real 2x2-block GEMMs
                           via XLA's complex lowering).

All functions are pure and differentiable; orthogonality is exact up to the
linear solve tolerance.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "cayley",
    "cayley_linear_kernel",
    "cayley_conv_apply",
    "groupsort2",
]


def cayley(W: jax.Array) -> jax.Array:
    """Cayley transform of a (co, ci) real or complex matrix.

    For square W: skew-symmetrise A = W - W^H and return
    (I - A)(I + A)^{-1} which is orthogonal/unitary.

    For rectangular W (co > ci, "tall"): follow the semi-orthogonal
    construction of orthogonal-convolutions — split W into a square block U
    (ci x ci) and remainder V ((co-ci) x ci), form A = U - U^H + V^H V, and
    return the stacked [ (I+A)^{-1}(I-A) ; -2 V (I+A)^{-1} ] whose columns are
    orthonormal.  For co < ci the transpose construction is used.
    """
    if W.ndim == 2:
        W = W[None]
        squeeze = True
    else:
        squeeze = False

    _, co, ci = W.shape
    transposed = co < ci
    if transposed:
        W = jnp.conjugate(jnp.swapaxes(W, -2, -1))
        co, ci = ci, co

    U = W[:, :ci, :]
    V = W[:, ci:, :]
    eye = jnp.eye(ci, dtype=W.dtype)
    UH = jnp.conjugate(jnp.swapaxes(U, -2, -1))
    VH = jnp.conjugate(jnp.swapaxes(V, -2, -1))
    A = U - UH + VH @ V
    # solve (I + A) X = (I - A)  and  (I + A) Y = V^H-free identity
    iplusA = eye + A
    top = jnp.linalg.solve(iplusA, eye - A)
    bottom = -2.0 * V @ jnp.linalg.solve(iplusA, eye)
    Q = jnp.concatenate([top, bottom], axis=-2)

    if transposed:
        Q = jnp.conjugate(jnp.swapaxes(Q, -2, -1))
    if squeeze:
        Q = Q[0]
    return Q


def cayley_linear_kernel(W: jax.Array, alpha: jax.Array) -> jax.Array:
    """The CayleyLinear weight map: cayley(alpha * W / ||W||_F).

    Matches the densification used for certification in the reference
    (dynamics/classification.py:282-293).
    """
    return cayley(alpha * W / jnp.linalg.norm(W))


def _fft_kernel(weight: jax.Array, n: int) -> jax.Array:
    """2-D real FFT of a (co, ci, k, k) conv kernel zero-padded to (n, n).

    Returns shape (n * (n//2+1), co, ci) complex — one small matrix per
    retained frequency.
    """
    co, ci, k, _ = weight.shape
    # circular convolution kernel: place and shift so the center tap is at 0
    kernel = jnp.zeros((co, ci, n, n), dtype=weight.dtype)
    kernel = kernel.at[:, :, :k, :k].set(weight)
    shift = -(k // 2)
    kernel = jnp.roll(kernel, (shift, shift), axis=(-2, -1))
    wfft = jnp.fft.rfft2(kernel)  # (co, ci, n, n//2+1)
    wfft = jnp.transpose(wfft, (2, 3, 0, 1)).reshape(-1, co, ci)
    return jnp.conjugate(wfft)


def cayley_conv_apply(
    x: jax.Array, weight: jax.Array, alpha: jax.Array
) -> jax.Array:
    """Orthogonal (circular) convolution via per-frequency Cayley transform.

    Args:
      x:      (batch, ci, n, n) input in NCHW (n must cover the kernel).
      weight: (co, ci, k, k) unconstrained kernel.
      alpha:  scalar learnable norm target.

    Returns:
      (batch, co_out, n, n) where co_out = max(co, ci) collapses to the true
      output channels: following the reference library the semi-orthogonal
      matrix always has orthonormal *columns*, so outputs have co channels.

    The whole op is three batched complex matmuls plus FFTs — all MXU/VPU
    friendly; no im2col.
    """
    batch, ci, n, _ = x.shape
    co = weight.shape[0]
    wfft = _fft_kernel(weight, n)  # (F, co, ci)
    scale = alpha / jnp.linalg.norm(wfft)
    Q = cayley(scale * wfft)  # (F, co, ci) semi-orthogonal per frequency
    xfft = jnp.fft.rfft2(x)  # (batch, ci, n, n//2+1)
    F = n * (n // 2 + 1)
    xfft = jnp.transpose(xfft, (2, 3, 1, 0)).reshape(F, ci, batch)
    yfft = Q @ xfft  # (F, co, batch)
    yfft = yfft.reshape(n, n // 2 + 1, co, batch)
    yfft = jnp.transpose(yfft, (3, 2, 0, 1))  # (batch, co, n, n//2+1)
    y = jnp.fft.irfft2(yfft, s=(n, n))
    return y


def groupsort2(x: jax.Array, axis: int = -1) -> jax.Array:
    """GroupSort with group size 2 (MaxMin) along ``axis``.

    A gradient-norm-preserving activation (the reference's GroupSort from
    libs/ortho_conv, used in Cayley backbones; models.py:49-54).
    """
    n = x.shape[axis]
    assert n % 2 == 0, "groupsort2 needs an even dimension"
    x2 = jnp.moveaxis(x, axis, -1)
    shape = x2.shape
    x2 = x2.reshape(*shape[:-1], n // 2, 2)
    lo = jnp.min(x2, axis=-1)
    hi = jnp.max(x2, axis=-1)
    out = jnp.stack([lo, hi], axis=-1).reshape(shape)
    return jnp.moveaxis(out, -1, axis)

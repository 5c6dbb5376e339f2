"""Flax layers: Normalize, Cayley orthogonal linear/conv, Lipschitz-tracked
conv/linear, GroupSort.

Capability parity with the reference's layer zoo:
  * Normalize               — models.py:17-26 (mean/std inside the model so
                              attacks/certification act in [0,1] pixel space)
  * CayleyLinear            — libs/ortho_conv layer used by the dynamics
                              (dynamics/classification.py:69-75); learnable
                              alpha, weight mapped through
                              cayley(alpha * W / ||W||)
  * CayleyConv              — FFT-domain orthogonal convolution; stride-2 is
                              realised as invertible space-to-depth followed
                              by a stride-1 orthogonal conv (the standard
                              construction from "Orthogonalizing Convolutional
                              Layers with the Cayley Transform")
  * LipsConv / LipsLinear   — plain conv/linear whose sigma_max is tracked by
                              power iteration (dynamics/classification.py:19-28);
                              here the singular vectors are carried in a
                              separate functional state (see train/lips.py)
  * GroupSort               — MaxMin activation (gradient-norm preserving)
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.cayley import (
    apply_freq_matrices,
    cayley,
    cayley_conv_apply,
    cayley_conv_kernel,
    cayley_linear_kernel,
    groupsort2,
)

__all__ = [
    "Normalize",
    "CayleyLinear",
    "CayleyConv",
    "LipsLinear",
    "LipsConv",
    "GroupSort",
    "space_to_depth",
    "cache_cayley_params",
]


def cache_cayley_params(cached_module, train_params, example_x, rng=None):
    """Densify trained Cayley weights into the ``cached=True`` twin's params.

    Walks the cached module's param structure (obtained shape-only via
    ``jax.eval_shape``) alongside the trained params: every {"Q"} leaf-dict
    is filled with the orthogonalised weight — ``cayley_linear_kernel`` for
    2-D Q, per-frequency ``cayley_conv_kernel`` for 4-D (n, nf, co, ci) Q —
    and everything else (biases, Normalize stats, plain layers) is copied
    through.  The equivalent of the ortho_conv fork's test-model weight
    caching (reference models.py:154-165: ortho_models_test.* share the
    train models' state_dicts).
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    shapes = jax.eval_shape(cached_module.init, rng, example_x)
    if "params" in shapes:
        shapes = shapes["params"]
    src = train_params["params"] if "params" in train_params else train_params

    def fill(shape_tree, src_tree):
        if isinstance(shape_tree, dict):
            if "Q" in shape_tree:
                q = shape_tree["Q"]
                out = {}
                if q.ndim == 2:
                    out["Q"] = cayley_linear_kernel(
                        src_tree["weight"], src_tree["alpha"]
                    )
                else:
                    n, nf, co, ci = q.shape
                    out["Q"] = cayley_conv_kernel(
                        src_tree["weight"], src_tree["alpha"], n
                    ).reshape(n, nf, co, ci)
                if "bias" in shape_tree:
                    out["bias"] = src_tree["bias"]
                return out
            return {k: fill(v, src_tree[k]) for k, v in shape_tree.items()}
        return src_tree

    return {"params": fill(shapes, src)}


class Normalize(nn.Module):
    """(x - mu) / std with fixed statistics baked into the graph."""

    mu: Sequence[float]
    std: Sequence[float]

    @nn.compact
    def __call__(self, x):
        # NCHW: broadcast over (C, 1, 1)
        mu = jnp.asarray(self.mu, x.dtype).reshape(-1, 1, 1)
        std = jnp.asarray(self.std, x.dtype).reshape(-1, 1, 1)
        return (x - mu) / std


class GroupSort(nn.Module):
    """MaxMin over pairs of *channels*: axis 1 for NCHW, last axis otherwise."""

    @nn.compact
    def __call__(self, x):
        axis = 1 if x.ndim == 4 else -1
        return groupsort2(x, axis)


class CayleyLinear(nn.Module):
    """Orthogonal linear layer y = Q x + b, Q = cayley(alpha W / ||W||).

    ``cached=True`` is the test/inference variant (the ortho_conv fork's
    ``models_test`` twins, reference models.py:154-165): the orthogonal Q is
    a parameter computed ONCE from trained weights by
    ``cache_cayley_params`` instead of re-orthogonalising every forward.
    """

    features: int
    use_bias: bool = True
    cached: bool = False

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        if self.cached:
            # NaN init: a cached twin used without cache_cayley_params is a
            # bug (it would otherwise silently emit zero features); NaN
            # surfaces the misuse at the first forward
            Q = self.param(
                "Q",
                lambda _k, s: jnp.full(s, jnp.nan, jnp.float32),
                (self.features, in_features),
            )
        else:
            W = self.param(
                "weight",
                nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
                (self.features, in_features),
            )
            alpha = self.param(
                "alpha", lambda _k: jnp.linalg.norm(W).astype(jnp.float32)
            )
            Q = cayley(alpha * W / jnp.linalg.norm(W))
        y = x @ Q.T
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b
        return y


def _fused_conv_enabled() -> bool:
    """Env gate: FIODE_FUSED_CONV=1 routes CayleyConv through the fused
    Pallas frequency-apply kernel (ops/fused_cayley_conv.py); off by
    default — measured slower than the XLA dense-DFT path on v5e (see
    that module's docstring for the numbers)."""
    from ..utils.debug import env_flag

    return env_flag("FIODE_FUSED_CONV")


def space_to_depth(x, block: int = 2):
    """Invertible downsampling: (B, C, H, W) -> (B, C*block^2, H/b, W/b)."""
    b, c, h, w = x.shape
    x = x.reshape(b, c, h // block, block, w // block, block)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))
    return x.reshape(b, c * block * block, h // block, w // block)


class CayleyConv(nn.Module):
    """Orthogonal circular convolution (FFT-domain Cayley), NCHW.

    stride=2 is emulated by space_to_depth(2) then a stride-1 orthogonal conv
    with kernel ceil(k/2) — the overall map remains norm-preserving because
    space_to_depth is an isometry.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = True
    cached: bool = False

    @nn.compact
    def __call__(self, x):
        if self.stride == 2:
            x = space_to_depth(x, 2)
            k = max(1, (self.kernel_size + 1) // 2)
        elif self.stride == 1:
            k = self.kernel_size
        else:
            raise ValueError("CayleyConv supports stride 1 or 2")
        ci = x.shape[1]
        if self.cached:
            # per-frequency semi-orthogonal matrices, precomputed once from
            # trained weights (cache_cayley_params); stored (n, nf, co, ci)
            # so the spatial size is recoverable from the shape
            n = x.shape[-1]
            nf = n // 2 + 1
            # NaN init for the same reason as CayleyLinear's cached Q:
            # an un-cached twin must fail loudly, not emit zeros
            Qf = self.param(
                "Q",
                lambda _k, s: jnp.full(s, jnp.nan, jnp.complex64),
                (n, nf, self.features, ci),
            )
            Qf = Qf.reshape(n * nf, self.features, ci)
            if _fused_conv_enabled():
                from ..ops.fused_cayley_conv import fused_freq_apply

                y = fused_freq_apply(x, Qf)
            else:
                y = apply_freq_matrices(x, Qf)
        else:
            W = self.param(
                "weight",
                nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
                (self.features, ci, k, k),
            )
            alpha = self.param(
                "alpha", lambda _k: jnp.linalg.norm(W).astype(jnp.float32)
            )
            if _fused_conv_enabled():
                from ..ops.cayley import cayley_conv_kernel
                from ..ops.fused_cayley_conv import fused_freq_apply

                y = fused_freq_apply(
                    x, cayley_conv_kernel(W, alpha, x.shape[-1])
                )
            else:
                y = cayley_conv_apply(x, W, alpha)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b[None, :, None, None]
        return y


class LipsLinear(nn.Module):
    """Plain linear layer whose spectral norm is tracked externally."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        W = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (self.features, in_features),
        )
        y = x @ W.T
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b
        return y


class LipsConv(nn.Module):
    """Plain NCHW conv (He-init, reference models.py:71-75) with tracked sigma."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        ci = x.shape[1]
        k = self.kernel_size
        # He normal: std = sqrt(2 / (k*k*out))  (reference init,
        # dynamics/classification.py:87-91)
        def he(key, shape):
            n = shape[2] * shape[3] * shape[0]
            return jax.random.normal(key, shape) * jnp.sqrt(2.0 / n)

        W = self.param("kernel", he, (self.features, ci, k, k))
        dn = jax.lax.conv_dimension_numbers(
            x.shape, W.shape, ("NCHW", "OIHW", "NCHW")
        )
        y = jax.lax.conv_general_dilated(
            x,
            W,
            (self.stride, self.stride),
            [(self.padding, self.padding)] * 2,
            dimension_numbers=dn,
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b[None, :, None, None]
        return y

"""Backbone Lipschitz tracking for Lipschitz-aware kappa scheduling.

Rebuild of the reference's compute_Lfx (utils.py:207-234): multiply
power-iteration sigma_max estimates through the backbone's conv/linear
layers, warm-starting each layer's singular vector across steps.  Cayley
backbones are orthogonal with GroupSort activations and isometric
downsampling, so their product is 1 (matching the reference, which finds no
plain conv/linear layers to multiply in that case).

The singular vectors are a functional state threaded through the train step
(the reference mutates `singular_u` buffers in place).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.backbones import PlainCNNBackbone, TinyMLPBackbone
from ..ops.power_iteration import power_iteration_conv, power_iteration_dense

__all__ = ["lfx_spec", "lfx_init", "compute_lfx"]


def _plain_cnn_layers(arch: str, in_shape):
    """(name, kind, stride, padding, input_shape) per Lips layer."""
    c, h, w = in_shape
    if arch == "4C3F":
        convs = [(32, 3, 1, 1), (32, 4, 2, 1), (64, 3, 1, 1), (64, 4, 2, 1)]
        linears = 3
    elif arch == "6C2F":
        convs = [(32, 3, 1, 1), (32, 3, 1, 1), (32, 4, 2, 1),
                 (64, 3, 1, 1), (64, 3, 1, 1), (64, 4, 2, 1)]
        linears = 2
    else:
        raise ValueError(arch)
    layers = []
    for i, (co, k, s, p) in enumerate(convs):
        layers.append((f"LipsConv_{i}", "conv", s, p, (c, h, w)))
        h = (h + 2 * p - k) // s + 1
        w = (w + 2 * p - k) // s + 1
        c = co
    for i in range(linears):
        layers.append((f"LipsLinear_{i}", "dense", None, None, None))
    return layers


def lfx_spec(backbone, input_shape) -> Optional[list]:
    """Layer walk for the backbone, or None if its Lipschitz constant is 1
    by construction (Cayley/orthogonal)."""
    if isinstance(backbone, PlainCNNBackbone):
        return _plain_cnn_layers(backbone.arch, input_shape)
    if isinstance(backbone, TinyMLPBackbone):
        return [("LipsLinear_0", "dense", None, None, None),
                ("LipsLinear_1", "dense", None, None, None)]
    return None  # KWLarge & friends: orthogonal, Lip 1


def lfx_init(backbone, backbone_params, input_shape, rng) -> Optional[Dict]:
    spec = lfx_spec(backbone, input_shape)
    if spec is None:
        return None
    us = {}
    for i, (name, kind, s, p, shp) in enumerate(spec):
        k = jax.random.fold_in(rng, i)
        if kind == "dense":
            m = backbone_params[name]["kernel"].shape[0]
            us[name] = jax.random.normal(k, (m,))
        else:
            us[name] = jax.random.normal(k, (1, *shp))
    return us


def compute_lfx(
    backbone, backbone_params, u_state: Optional[Dict], input_shape,
    n_iter: int = 1,
) -> Tuple[jax.Array, Optional[Dict]]:
    """Product of per-layer sigma_max estimates; returns (Lfx, new_u_state)."""
    if u_state is None:
        return jnp.asarray(1.0), None
    spec = lfx_spec(backbone, input_shape)
    Lfx = jnp.asarray(1.0)
    new_us = {}
    for name, kind, stride, padding, shp in spec:
        W = jax.lax.stop_gradient(backbone_params[name]["kernel"])
        u = u_state[name]
        if kind == "dense":
            sigma, u_new = power_iteration_dense(W, u, n_iter)
        else:
            sigma, u_new = power_iteration_conv(
                W, shp, u, n_iter, stride=stride, padding=padding
            )
        Lfx = Lfx * sigma
        new_us[name] = jax.lax.stop_gradient(u_new)
    return Lfx, new_us

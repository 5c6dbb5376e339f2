"""Backbone feature extractors (the ODE's input injection `param_map`).

Parity targets (reference models.py:29-178):
  * make_ortho_KWLarge_Concat / make_ortho_KWLargeMNIST_Concat —
    Cayley orthogonal-conv KWLarge nets with GroupSort, ending in a linear
    head to ``out_dim`` features (the "Concat" family of the FI-ODE
    ortho_conv fork).  Overall Lipschitz constant 1/min(std) in pixel space.
  * make_4C3F / make_4C3F_nolips / make_6C2F — plain CNNs with
    power-iteration-tracked Lipschitz layers (4C3F == KWLarge shape).

All models take NCHW in [0,1] and normalise internally (Normalize is the
first layer) so attacks and certification operate in pixel space
(dataset_loaders.py keeps transforms un-normalised for the same reason).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn

from .layers import (
    CayleyConv,
    CayleyLinear,
    GroupSort,
    LipsConv,
    LipsLinear,
    Normalize,
)

__all__ = ["KWLargeBackbone", "PlainCNNBackbone", "make_backbone"]


def _act(name: str):
    if name == "GroupSort":
        return GroupSort()
    if name == "ReLU":
        return lambda x: nn.relu(x)
    raise ValueError(f"unknown activation {name!r}")


class KWLargeBackbone(nn.Module):
    """Cayley orthogonal KWLarge: 4 conv + 3 linear, GroupSort activations.

    CIFAR shape: 3x32x32 -> 32c3 -> 32c4/s2 -> 64c3 -> 64c4/s2 -> flatten
                 -> 512 -> 512 -> out_dim.
    MNIST shape: 1x28x28 with the same channel progression (spatial 7x7).
    """

    out_dim: int = 128
    act: str = "GroupSort"
    mu: Sequence[float] = (0.0,)
    std: Sequence[float] = (1.0,)
    width: int = 1
    # test/inference twin (reference models.py:154-165 ortho_models_test.*):
    # Cayley transforms precomputed once via cache_cayley_params
    cached: bool = False
    # KWLarge_inter (reference models.py:172-178): expose the intermediate
    # 512-wide representation instead of the out_dim head (the submodule is
    # an empty stub; reconstructed from the factory name/shape)
    inter: bool = False

    @nn.compact
    def __call__(self, x):
        a = _act(self.act)
        w = self.width
        c = self.cached
        x = Normalize(self.mu, self.std)(x)
        x = a(CayleyConv(32 * w, 3, cached=c)(x))
        x = a(CayleyConv(32 * w, 4, stride=2, cached=c)(x))
        x = a(CayleyConv(64 * w, 3, cached=c)(x))
        x = a(CayleyConv(64 * w, 4, stride=2, cached=c)(x))
        x = x.reshape(x.shape[0], -1)
        x = a(CayleyLinear(512 * w, cached=c)(x))
        x = a(CayleyLinear(512, cached=c)(x))
        if self.inter:
            return x
        x = CayleyLinear(self.out_dim, cached=c)(x)
        return x


class PlainCNNBackbone(nn.Module):
    """4C3F / 6C2F-style CNNs with Lipschitz-trackable layers.

    arch='4C3F':  conv 32c3, 32c4/s2, 64c3, 64c4/s2 -> 512 -> 512 -> out_dim
    arch='6C2F':  conv 32c3 x2, 32c4/s2, 64c3 x2, 64c4/s2 -> 512 -> out_dim
    """

    arch: str = "4C3F"
    out_dim: int = 10
    act: str = "ReLU"
    mu: Sequence[float] = (0.0,)
    std: Sequence[float] = (1.0,)

    @nn.compact
    def __call__(self, x):
        a = _act(self.act)
        x = Normalize(self.mu, self.std)(x)
        if self.arch == "4C3F":
            x = a(LipsConv(32, 3, padding=1)(x))
            x = a(LipsConv(32, 4, stride=2, padding=1)(x))
            x = a(LipsConv(64, 3, padding=1)(x))
            x = a(LipsConv(64, 4, stride=2, padding=1)(x))
            x = x.reshape(x.shape[0], -1)
            x = a(LipsLinear(512)(x))
            x = a(LipsLinear(512)(x))
            x = LipsLinear(self.out_dim)(x)
        elif self.arch == "6C2F":
            x = a(LipsConv(32, 3, padding=1)(x))
            x = a(LipsConv(32, 3, padding=1)(x))
            x = a(LipsConv(32, 4, stride=2, padding=1)(x))
            x = a(LipsConv(64, 3, padding=1)(x))
            x = a(LipsConv(64, 3, padding=1)(x))
            x = a(LipsConv(64, 4, stride=2, padding=1)(x))
            x = x.reshape(x.shape[0], -1)
            x = a(LipsLinear(512)(x))
            x = LipsLinear(self.out_dim)(x)
        else:
            raise ValueError(f"unknown arch {self.arch!r}")
        return x


class TinyMLPBackbone(nn.Module):
    """Small flatten->MLP feature map (tests / fast CPU experiments; not in
    the reference zoo)."""

    out_dim: int = 10
    hidden: int = 64
    mu: Sequence[float] = (0.0,)
    std: Sequence[float] = (1.0,)

    @nn.compact
    def __call__(self, x):
        x = Normalize(self.mu, self.std)(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(LipsLinear(self.hidden)(x))
        x = LipsLinear(self.out_dim)(x)
        return x


def make_backbone(name: str, *, out_dim: int, act: str, mu, std) -> nn.Module:
    """Factory matching the reference's param_map registry
    (ExpConfig.py:107-162): ORTHO_KWLarge_Concat, ORTHO_KWLargeMNIST_Concat,
    CIFAR_4C3F, CIFAR_4C3F_nolips, CIFAR_6C2F, Identity."""
    if name in ("ORTHO_KWLarge_Concat", "ORTHO_KWLargeMNIST_Concat"):
        return KWLargeBackbone(out_dim=out_dim, act=act, mu=mu, std=std)
    if name in ("ORTHO_KWLarge_Concat_test", "ORTHO_KWLargeMNIST_Concat_test"):
        # test twins (reference models.py:154-165): same architecture with
        # the Cayley transforms precomputed once (fill params with
        # layers.cache_cayley_params from a trained checkpoint)
        return KWLargeBackbone(
            out_dim=out_dim, act=act, mu=mu, std=std, cached=True
        )
    if name == "ORTHO_KWLarge_inter":
        return KWLargeBackbone(
            out_dim=out_dim, act=act, mu=mu, std=std, inter=True
        )
    if name in ("CIFAR_4C3F", "CIFAR_4C3F_nolips"):
        return PlainCNNBackbone(arch="4C3F", out_dim=out_dim, act=act, mu=mu, std=std)
    if name == "CIFAR_6C2F":
        return PlainCNNBackbone(arch="6C2F", out_dim=out_dim, act=act, mu=mu, std=std)
    if name == "TinyMLP":
        return TinyMLPBackbone(out_dim=out_dim, mu=mu, std=std)
    if name == "Identity":
        # reference registry's Identity param_map: no feature extractor —
        # NeuralODEClassifier(backbone=None) feeds flattened pixels to the
        # dynamics input injection directly
        return None
    raise ValueError(f"unknown backbone {name!r}")

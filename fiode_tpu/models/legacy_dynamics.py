"""Legacy conv-feature dynamics (the LyaNet-heritage model family).

Capability rebuild of the reference's legacy dynamics modules, which are not
referenced by any live config (SURVEY.md §2.2) but are part of the API
surface:
  * ResNetBlockDyn (dynamics/resnet_block.py:5-49) — conv-block RHS over an
    image-shaped hidden state, with the input image injected through a stem;
  * DynBasicBlock / DynBottleneck / ResNetOutput (dynamics/naiveResNet.py:20-147)
    — ResNet block shapes with the residual connections deliberately removed
    (:51,63-64), acting as the RHS of an ODE over conv features.

State is (B, C, H, W); `state_init` produces h(0) from the input image (the
DefaultInitFun path that defers to dyn.state_init,
dynamics/init_coordinates.py:26-27).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["ConvBlockDynamics", "DynBasicBlock", "DynBottleneck", "ResNetOutput"]


def _conv(features, k=3, stride=1):
    # NCHW conv helper
    return nn.Conv(
        features, (k, k), strides=(stride, stride), padding="SAME",
        use_bias=False,
    )


class _NCHW(nn.Module):
    """Wrap an NHWC flax conv stack for NCHW tensors."""

    inner: nn.Module

    @nn.compact
    def __call__(self, x):
        x = jnp.transpose(x, (0, 2, 3, 1))
        x = self.inner(x)
        return jnp.transpose(x, (0, 3, 1, 2))


class DynBasicBlock(nn.Module):
    """BasicBlock-shaped RHS: conv-norm-act-conv-norm (NO residual add)."""

    features: int

    @nn.compact
    def __call__(self, h):  # h: (B, C, H, W)
        x = jnp.transpose(h, (0, 2, 3, 1))
        x = _conv(self.features)(x)
        x = nn.GroupNorm(num_groups=8)(x)
        x = nn.relu(x)
        x = _conv(self.features)(x)
        x = nn.GroupNorm(num_groups=8)(x)
        return jnp.transpose(x, (0, 3, 1, 2))


class DynBottleneck(nn.Module):
    """Bottleneck-shaped RHS: 1x1 squeeze -> 3x3 -> 1x1 expand (NO residual
    add).  As an ODE right-hand side dh/dt must match h's channel count, so
    the final 1x1 expands back to ``features`` and the squeeze width is
    ``features // expansion``."""

    features: int
    expansion: int = 4

    @nn.compact
    def __call__(self, h):
        x = jnp.transpose(h, (0, 2, 3, 1))
        c = self.features
        w = max(c // self.expansion, 1)
        groups = lambda ch: next(g for g in (8, 4, 2, 1) if ch % g == 0)
        x = nn.relu(nn.GroupNorm(num_groups=groups(w))(_conv(w, k=1)(x)))
        x = nn.relu(nn.GroupNorm(num_groups=groups(w))(_conv(w)(x)))
        x = nn.GroupNorm(num_groups=groups(c))(_conv(c, k=1)(x))
        return jnp.transpose(x, (0, 3, 1, 2))


class ConvBlockDynamics(nn.Module):
    """Conv dynamics over image-shaped hidden state with input injection.

    eval_dot(h, x): f = block(h) + stem(x); state_init(x) = stem(x) —
    the ResNetBlockDyn pattern (dynamics/resnet_block.py).
    """

    features: int = 32
    block: str = "basic"  # 'basic' | 'bottleneck'

    def setup(self):
        self.stem = _NCHW(
            nn.Sequential([
                nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False),
                nn.relu,
            ])
        )
        if self.block == "basic":
            self.body = DynBasicBlock(self.features)
        else:
            self.body = DynBottleneck(self.features)

    def state_init(self, x):
        return self.stem(x)

    def eval_dot(self, h, x, *, train: bool = False, scale_nominal=None):
        return self.body(h) + self.stem(x)

    def __call__(self, h, x, *, train: bool = False, scale_nominal=None):
        return self.eval_dot(h, x, train=train)


class ResNetOutput(nn.Module):
    """Global-pool + linear readout from conv state to logits
    (naiveResNet.py ResNetOutput)."""

    n_classes: int = 10

    @nn.compact
    def __call__(self, h):  # (B, C, H, W)
        x = jnp.mean(h, axis=(2, 3))
        return nn.Dense(self.n_classes)(x)

"""Normalizing-flow layers: affine coupling, flip, log, elementwise affine,
conv spline flow, and the residual coupling stack.

Parity targets: VISinger/modules.py:259-396 and models.py:221-251. Layout is
channels-last [B, T, C]; masks are [B, T, 1]. Each flow exposes
forward(x, mask, g) -> (y, logdet) and inverse(x, mask, g) -> y.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv1d, DDSConv
from .splines import piecewise_rational_quadratic_transform
from .wavenet import WaveNet


class ElementwiseAffine(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x, mask, g=None, reverse: bool = False,
                 deterministic: bool = True):
        m = self.param("m", nn.initializers.zeros, (self.channels,))
        logs = self.param("logs", nn.initializers.zeros, (self.channels,))
        if not reverse:
            y = (m + jnp.exp(logs) * x) * mask
            logdet = jnp.sum(logs * mask, axis=(1, 2))
            return y, logdet
        return (x - m) * jnp.exp(-logs) * mask


def flip(x):
    return jnp.flip(x, axis=-1)


class LogFlow(nn.Module):
    @nn.compact
    def __call__(self, x, mask, g=None, reverse: bool = False,
                 deterministic: bool = True):
        if not reverse:
            y = jnp.log(jnp.maximum(x, 1e-5)) * mask
            logdet = jnp.sum(-y, axis=(1, 2))
            return y, logdet
        return jnp.exp(x) * mask


class ResidualCouplingLayer(nn.Module):
    """Affine coupling: first half conditions a WaveNet that shifts (and
    optionally scales) the second half. Zero-init output projection."""

    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    mean_only: bool = False
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, mask, g=None, reverse: bool = False,
                 deterministic: bool = True):
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = Conv1d(self.hidden_channels, 1, name="pre")(x0) * mask
        h = WaveNet(self.hidden_channels, self.kernel_size, self.dilation_rate,
                    self.n_layers, gin_channels=self.gin_channels,
                    dropout_rate=self.dropout_rate, name="enc")(
                        h, mask, g=g, deterministic=deterministic)
        stats = Conv1d(half * (2 - self.mean_only), 1,
                       kernel_init=nn.initializers.zeros, name="post")(h) * mask
        if self.mean_only:
            m, logs = stats, jnp.zeros_like(stats)
        else:
            m, logs = stats[..., :half], stats[..., half:]

        if not reverse:
            y1 = (m + x1 * jnp.exp(logs)) * mask
            logdet = jnp.sum(logs, axis=(1, 2))
            return jnp.concatenate([x0, y1], axis=-1), logdet
        y1 = (x1 - m) * jnp.exp(-logs) * mask
        return jnp.concatenate([x0, y1], axis=-1)


class ConvFlow(nn.Module):
    """Spline coupling flow over 2-channel inputs (SDP internals)."""

    in_channels: int
    filter_channels: int
    kernel_size: int
    n_layers: int
    num_bins: int = 10
    tail_bound: float = 5.0

    @nn.compact
    def __call__(self, x, mask, g=None, reverse: bool = False,
                 deterministic: bool = True):
        half = self.in_channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = Conv1d(self.filter_channels, 1, name="pre")(x0)
        h = DDSConv(self.kernel_size, self.n_layers, name="convs")(
            h, mask, g=g, deterministic=deterministic)
        h = Conv1d(half * (self.num_bins * 3 - 1), 1,
                   kernel_init=nn.initializers.zeros, name="proj")(h) * mask

        b, t, _ = x0.shape
        h = h.reshape(b, t, half, -1)  # [B, T, C/2, 3*bins-1]
        scale = math.sqrt(self.filter_channels)
        uw = h[..., : self.num_bins] / scale
        uh = h[..., self.num_bins: 2 * self.num_bins] / scale
        ud = h[..., 2 * self.num_bins:]

        y1, logabsdet = piecewise_rational_quadratic_transform(
            x1, uw, uh, ud, inverse=reverse, tails="linear",
            tail_bound=self.tail_bound)
        y = jnp.concatenate([x0, y1], axis=-1) * mask
        if not reverse:
            return y, jnp.sum(logabsdet * mask, axis=(1, 2))
        return y


class ResidualCouplingBlock(nn.Module):
    """n_flows x (coupling + flip); the VITS spec_flow (models.py:221-251)."""

    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    n_flows: int = 4
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, mask, g=None, reverse: bool = False,
                 deterministic: bool = True):
        layers = [
            ResidualCouplingLayer(
                self.channels, self.hidden_channels, self.kernel_size,
                self.dilation_rate, self.n_layers,
                gin_channels=self.gin_channels, mean_only=True,
                name=f"coupling_{i}")
            for i in range(self.n_flows)
        ]
        if not reverse:
            for layer in layers:
                x, _ = layer(x, mask, g=g, reverse=False,
                             deterministic=deterministic)
                x = flip(x)
            return x
        for layer in reversed(layers):
            x = flip(x)
            x = layer(x, mask, g=g, reverse=True, deterministic=deterministic)
        return x

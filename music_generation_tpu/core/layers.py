"""Basic 1-D building blocks (channels-last [B, T, C]).

Covers the reference's modules.py LayerNorm/FFN/DDSConv/conv conventions
(VISinger/modules.py:20-108, attentions.py:257-303) as flax modules, plus a
weight-normalized conv used by the GAN stack.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

LRELU_SLOPE = 0.1


def same_pad(kernel_size: int, dilation: int = 1) -> tuple[int, int]:
    span = (kernel_size - 1) * dilation
    return (span // 2, span - span // 2)


def causal_pad(kernel_size: int, dilation: int = 1) -> tuple[int, int]:
    return ((kernel_size - 1) * dilation, 0)


class Conv1d(nn.Module):
    """1-D conv on [B, T, C] with torch-style explicit padding and optional
    weight normalization (reparametrize kernel = g * v / ||v||)."""

    features: int
    kernel_size: int = 1
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    causal: bool = False
    weight_norm: bool = False
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kshape = (self.kernel_size, in_features // self.groups, self.features)
        kernel = self.param("kernel", self.kernel_init, kshape)
        if self.weight_norm:
            g = self.param(
                "g", lambda _: jnp.linalg.norm(
                    kernel.reshape(-1, self.features), axis=0))
            norm = jnp.linalg.norm(kernel.reshape(-1, self.features), axis=0)
            kernel = kernel * (g / jnp.maximum(norm, 1e-12))
        pad = causal_pad(self.kernel_size, self.dilation) if self.causal \
            else same_pad(self.kernel_size, self.dilation)
        dtype = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), kernel.astype(dtype),
            window_strides=(self.stride,),
            padding=(pad,),
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=self.groups,
        )
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + bias.astype(dtype)
        return y


class ConvTranspose1d(nn.Module):
    """Transposed 1-D conv matching torch ConvTranspose1d(k, u, p=(k-u)//2):
    output length is exactly T * stride (for even k-u)."""

    features: int
    kernel_size: int
    stride: int
    weight_norm: bool = True
    kernel_init: Callable = nn.initializers.normal(stddev=0.01)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        k, u = self.kernel_size, self.stride
        p = (k - u) // 2
        kshape = (k, in_features, self.features)
        kernel = self.param("kernel", self.kernel_init, kshape)
        if self.weight_norm:
            g = self.param(
                "g", lambda _: jnp.linalg.norm(
                    kernel.reshape(-1, self.features), axis=0))
            norm = jnp.linalg.norm(kernel.reshape(-1, self.features), axis=0)
            kernel = kernel * (g / jnp.maximum(norm, 1e-12))
        dtype = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), kernel.astype(dtype),
            window_strides=(1,),
            padding=((k - 1 - p, k - 1 - p),),
            lhs_dilation=(u,),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return y + bias.astype(dtype)


class LayerNorm1d(nn.Module):
    """LayerNorm over the channel axis of [B, T, C]."""
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.epsilon)(x)


class FFN(nn.Module):
    """Conv feed-forward: conv -> relu/gelu -> dropout -> conv, masked.
    Parity: attentions.FFN (attentions.py:257-303)."""

    out_channels: int
    filter_channels: int
    kernel_size: int
    dropout_rate: float = 0.0
    gelu: bool = False
    causal: bool = False

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        h = Conv1d(self.filter_channels, self.kernel_size, causal=self.causal)(x * mask)
        h = h * jax.nn.sigmoid(1.702 * h) if self.gelu else jax.nn.relu(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        h = Conv1d(self.out_channels, self.kernel_size, causal=self.causal)(h * mask)
        return h * mask


class DDSConv(nn.Module):
    """Dilated depth-separable conv stack (modules.py:70-108)."""

    kernel_size: int
    n_layers: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, mask, g=None, deterministic: bool = True):
        channels = x.shape[-1]
        if g is not None:
            x = x + g
        for i in range(self.n_layers):
            dilation = self.kernel_size ** i
            y = Conv1d(channels, self.kernel_size, dilation=dilation,
                       groups=channels, name=f"sep_{i}")(x * mask)
            y = jax.nn.gelu(LayerNorm1d(name=f"norm1_{i}")(y))
            y = Conv1d(channels, 1, name=f"pw_{i}")(y)
            y = jax.nn.gelu(LayerNorm1d(name=f"norm2_{i}")(y))
            y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
            x = x + y
        return x * mask


class ConvReluNorm(nn.Module):
    """Conv->LN->ReLU stack with zero-init residual proj (modules.py:35-67)."""

    hidden_channels: int
    out_channels: int
    kernel_size: int
    n_layers: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        h = x
        for i in range(self.n_layers):
            h = Conv1d(self.hidden_channels, self.kernel_size, name=f"conv_{i}")(h * mask)
            h = LayerNorm1d(name=f"norm_{i}")(h)
            h = nn.Dropout(self.dropout_rate)(jax.nn.relu(h), deterministic=deterministic)
        proj = Conv1d(self.out_channels, 1, kernel_init=nn.initializers.zeros,
                      name="proj")(h)
        return (x + proj) * mask

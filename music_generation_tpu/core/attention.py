"""Windowed relative-position multi-head attention + FFT-block encoder.

Parity target: VISinger/attentions.py:13-255 (window_size=4 learned relative
key/value embeddings, shared across heads; post-norm residual blocks). The
relative<->absolute index shuffles are the standard pad/reshape tricks,
expressed with static shapes so XLA fuses them.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import FFN, Conv1d, LayerNorm1d

MASK_VALUE = -1e4


def _relative_to_absolute(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, T, 2T-1] relative logits -> [B, H, T, T] absolute."""
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x = x.reshape(b, h, t * 2 * t)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, t - 1)))
    return x.reshape(b, h, t + 1, 2 * t - 1)[:, :, :t, t - 1:]


def _absolute_to_relative(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, T, T] attention weights -> [B, H, T, 2T-1] relative."""
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, t - 1)))
    x = x.reshape(b, h, t * t + t * (t - 1))
    x = jnp.pad(x, ((0, 0), (0, 0), (t, 0)))
    return x.reshape(b, h, t, 2 * t)[:, :, :, 1:]


def _window_embeddings(emb: jnp.ndarray, length: int, window: int) -> jnp.ndarray:
    """Select/pad the [*, 2w+1, D] learned window embeddings to [*, 2T-1, D]."""
    pad = max(length - (window + 1), 0)
    start = max((window + 1) - length, 0)
    if pad > 0:
        emb = jnp.pad(emb, ((0, 0), (pad, pad), (0, 0)))
    return emb[:, start: start + 2 * length - 1]


class RelativeMultiHeadAttention(nn.Module):
    channels: int
    n_heads: int
    window_size: Optional[int] = None
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, context, attn_mask=None, deterministic: bool = True):
        d_k = self.channels // self.n_heads
        q = Conv1d(self.channels, 1, kernel_init=nn.initializers.xavier_uniform(),
                   name="q")(x)
        k = Conv1d(self.channels, 1, kernel_init=nn.initializers.xavier_uniform(),
                   name="k")(context)
        v = Conv1d(self.channels, 1, kernel_init=nn.initializers.xavier_uniform(),
                   name="v")(context)

        b, t_t, _ = q.shape
        t_s = k.shape[1]
        q = q.reshape(b, t_t, self.n_heads, d_k).transpose(0, 2, 1, 3)
        k = k.reshape(b, t_s, self.n_heads, d_k).transpose(0, 2, 1, 3)
        v = v.reshape(b, t_s, self.n_heads, d_k).transpose(0, 2, 1, 3)

        scale = d_k ** -0.5
        scores = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)

        if self.window_size is not None:
            assert t_s == t_t, "relative attention is self-attention only"
            rel_stddev = d_k ** -0.5
            emb_k = self.param("emb_rel_k",
                               nn.initializers.normal(rel_stddev),
                               (1, 2 * self.window_size + 1, d_k))
            emb_v = self.param("emb_rel_v",
                               nn.initializers.normal(rel_stddev),
                               (1, 2 * self.window_size + 1, d_k))
            rel_k = _window_embeddings(emb_k, t_s, self.window_size)
            rel_logits = jnp.einsum("bhld,hmd->bhlm", q * scale, rel_k)
            scores = scores + _relative_to_absolute(rel_logits)

        if attn_mask is not None:
            scores = jnp.where(attn_mask == 0, MASK_VALUE, scores)
        p = jax.nn.softmax(scores, axis=-1)
        p = nn.Dropout(self.dropout_rate)(p, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", p, v)

        if self.window_size is not None:
            rel_v = _window_embeddings(emb_v, t_s, self.window_size)
            rel_w = _absolute_to_relative(p)
            out = out + jnp.einsum("bhlm,hmd->bhld", rel_w, rel_v)

        out = out.transpose(0, 2, 1, 3).reshape(b, t_t, self.channels)
        return Conv1d(self.channels, 1, name="out")(out)


class TransformerEncoder(nn.Module):
    """Stack of post-norm FFT blocks with windowed relative self-attention.
    Parity: attentions.Encoder (attentions.py:13-47)."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    dropout_rate: float = 0.0
    window_size: int = 4

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        attn_mask = mask[:, None, :, 0][:, :, None, :] * mask[:, None, :, 0][:, :, :, None]
        x = x * mask
        for i in range(self.n_layers):
            y = RelativeMultiHeadAttention(
                self.hidden_channels, self.n_heads, self.window_size,
                self.dropout_rate, name=f"attn_{i}")(
                    x, x, attn_mask, deterministic)
            y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
            x = LayerNorm1d(name=f"norm1_{i}")(x + y)
            y = FFN(self.hidden_channels, self.filter_channels, self.kernel_size,
                    self.dropout_rate, name=f"ffn_{i}")(x, mask, deterministic)
            y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
            x = LayerNorm1d(name=f"norm2_{i}")(x + y)
        return x * mask

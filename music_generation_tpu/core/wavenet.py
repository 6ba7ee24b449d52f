"""WaveNet-style gated dilated conv stack (the VITS "WN" block).

Parity: VISinger/modules.py:111-184 — per-layer weight-normalized dilated
convs, fused tanh*sigmoid gate, residual + skip accumulation. Channels-last;
the gate is a single fused elementwise op XLA folds into the conv epilogue.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv1d


def gated_activation(x_in: jnp.ndarray, g_l: jnp.ndarray, channels: int) -> jnp.ndarray:
    acts = x_in + g_l
    return jnp.tanh(acts[..., :channels]) * jax.nn.sigmoid(acts[..., channels:])


class WaveNet(nn.Module):
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, mask, g=None, deterministic: bool = True):
        h = self.hidden_channels
        output = jnp.zeros_like(x)
        if g is not None:
            g_all = Conv1d(2 * h * self.n_layers, 1, weight_norm=True,
                           name="cond")(g)
        for i in range(self.n_layers):
            dilation = self.dilation_rate ** i
            x_in = Conv1d(2 * h, self.kernel_size, dilation=dilation,
                          weight_norm=True, name=f"in_{i}")(x)
            g_l = g_all[..., i * 2 * h:(i + 1) * 2 * h] if g is not None \
                else jnp.zeros_like(x_in)
            acts = gated_activation(x_in, g_l, h)
            acts = nn.Dropout(self.dropout_rate)(acts, deterministic=deterministic)
            if i < self.n_layers - 1:
                rs = Conv1d(2 * h, 1, weight_norm=True, name=f"res_skip_{i}")(acts)
                x = (x + rs[..., :h]) * mask
                output = output + rs[..., h:]
            else:
                rs = Conv1d(h, 1, weight_norm=True, name=f"res_skip_{i}")(acts)
                output = output + rs
        return output * mask

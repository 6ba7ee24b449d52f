"""Duration predictors shared by the SVS model and the melody models.

- DurationPredictor: 3-conv sigmoid head predicting each phone's fraction of
  its note duration (parity: VISinger/models.py:100-148).
- StochasticDurationPredictor: VITS normalizing-flow duration model, used by
  the transformer_melody SDP variant (parity: VISinger/models.py:19-97,
  transformer_melody/durationpredictor.py).
Layout: [B, T, C] features, [B, T, 1] masks.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.flows import ConvFlow, ElementwiseAffine, LogFlow, flip
from ..core.layers import Conv1d, DDSConv, LayerNorm1d


class DurationPredictor(nn.Module):
    filter_channels: int
    kernel_size: int
    dropout_rate: float
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, mask, g=None, deterministic: bool = True):
        x = jax.lax.stop_gradient(x)
        if g is not None:
            g = jax.lax.stop_gradient(g)
            x = x + Conv1d(x.shape[-1], 1, name="cond")(g)
        for i in range(3):
            x = Conv1d(self.filter_channels, self.kernel_size,
                       name=f"conv_{i}")(x * mask)
            x = LayerNorm1d(name=f"norm_{i}")(jax.nn.relu(x))
            x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        x = Conv1d(1, 1, name="proj")(x * mask)
        x = jax.nn.sigmoid(x) * mask
        return x[..., 0]  # [B, T] fraction in (0, 1)


class LogDurationPredictor(nn.Module):
    """Same trunk but linear output (log-duration), used by melody models
    where durations are regressed in log space (parity: the non-SDP branch of
    transformer_melody; reference DurationPredictor without sigmoid would be
    used via exp(logw))."""
    filter_channels: int
    kernel_size: int
    dropout_rate: float
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, mask, g=None, deterministic: bool = True):
        x = jax.lax.stop_gradient(x)
        if g is not None:
            g = jax.lax.stop_gradient(g)
            x = x + Conv1d(x.shape[-1], 1, name="cond")(g)
        for i in range(3):
            x = Conv1d(self.filter_channels, self.kernel_size,
                       name=f"conv_{i}")(x * mask)
            x = LayerNorm1d(name=f"norm_{i}")(jax.nn.relu(x))
            x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        x = Conv1d(1, 1, name="proj")(x * mask)
        return x[..., 0] * mask[..., 0]


class StochasticDurationPredictor(nn.Module):
    """Flow-based duration model. forward (reverse=False) returns the NLL per
    batch item given ground-truth durations w [B, T, 1]; reverse returns
    log-durations sampled from noise."""

    in_channels: int
    kernel_size: int
    dropout_rate: float
    n_flows: int = 4
    gin_channels: int = 0

    def setup(self):
        fc = self.in_channels  # reference overrides filter_channels with in_channels
        self.pre = Conv1d(fc, 1, name="pre")
        self.proj = Conv1d(fc, 1, name="proj")
        self.convs = DDSConv(self.kernel_size, 3, dropout_rate=self.dropout_rate,
                             name="convs")
        if self.gin_channels:
            self.cond = Conv1d(fc, 1, name="cond")

        self.log_flow = LogFlow()
        self.ea = ElementwiseAffine(2)
        self.spec_flows = [
            ConvFlow(2, fc, self.kernel_size, n_layers=3, name=f"flow_{i}")
            for i in range(self.n_flows)
        ]

        self.post_pre = Conv1d(fc, 1, name="post_pre")
        self.post_proj = Conv1d(fc, 1, name="post_proj")
        self.post_convs = DDSConv(self.kernel_size, 3,
                                  dropout_rate=self.dropout_rate, name="post_convs")
        self.post_ea = ElementwiseAffine(2)
        self.post_flows = [
            ConvFlow(2, fc, self.kernel_size, n_layers=3, name=f"post_flow_{i}")
            for i in range(4)
        ]

    def _trunk(self, x, mask, g, deterministic):
        x = jax.lax.stop_gradient(x)
        x = self.pre(x)
        if g is not None:
            x = x + self.cond(jax.lax.stop_gradient(g))
        x = self.convs(x, mask, deterministic=deterministic)
        return self.proj(x) * mask

    def __call__(self, x, mask, w=None, g=None, reverse: bool = False,
                 noise_scale: float = 1.0, deterministic: bool = True):
        x = self._trunk(x, mask, g, deterministic)
        if not reverse:
            assert w is not None
            b, t, _ = w.shape
            h_w = self.post_proj(self.post_convs(self.post_pre(w), mask,
                                                 deterministic=deterministic)) * mask
            e_q = jax.random.normal(self.make_rng("noise"), (b, t, 2)) * mask
            z_q, logdet_tot_q = e_q, 0.0
            z_q, ld = self.post_ea(z_q, mask)
            logdet_tot_q += ld
            for f in self.post_flows:
                z_q, ld = f(z_q, mask, g=(x + h_w), deterministic=deterministic)
                logdet_tot_q += ld
                z_q = flip(z_q)
            z_u, z1 = z_q[..., :1], z_q[..., 1:]
            u = jax.nn.sigmoid(z_u) * mask
            z0 = (w - u) * mask
            logdet_tot_q += jnp.sum(
                (jax.nn.log_sigmoid(z_u) + jax.nn.log_sigmoid(-z_u)) * mask,
                axis=(1, 2))
            logq = jnp.sum(-0.5 * (math.log(2 * math.pi) + e_q ** 2) * mask,
                           axis=(1, 2)) - logdet_tot_q

            z0, logdet_tot = self.log_flow(z0, mask)
            z = jnp.concatenate([z0, z1], axis=-1)
            z, ld = self.ea(z, mask)
            logdet_tot += ld
            for f in self.spec_flows:
                z, ld = f(z, mask, g=x, deterministic=deterministic)
                logdet_tot += ld
                z = flip(z)
            nll = jnp.sum(0.5 * (math.log(2 * math.pi) + z ** 2) * mask,
                          axis=(1, 2)) - logdet_tot
            return nll + logq
        else:
            b, t, _ = x.shape
            z = jax.random.normal(self.make_rng("noise"), (b, t, 2)) * noise_scale
            # Reverse order, dropping the first flow like the reference
            # (models.py:90-91): flip+CF3, flip+CF2, flip+CF1, flip, affine.
            for f in reversed(self.spec_flows[1:]):
                z = flip(z)
                z = f(z, mask, g=x, reverse=True)
            z = flip(z)
            z = self.ea(z, mask, reverse=True)
            return z[..., 0]  # log-durations [B, T]

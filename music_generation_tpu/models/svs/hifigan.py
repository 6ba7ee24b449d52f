"""HiFi-GAN vocoder: generator + multi-period/multi-scale discriminators.

Parity: VISinger/models.py:292-441 (Generator with upsample 8/8/2/2, kernel
16/16/4/4, ResBlock1 k=3/7/11 d=(1,3,5); MPD periods 2,3,5,7,11 + one scale
discriminator). Channels-last: audio is [B, S, 1].

TPU notes: the whole generator is a chain of (transposed) convs + leaky-relu,
which XLA maps onto the MXU as implicit GEMMs and fuses the activations; the
hot loop is the final high-rate resblocks, kept in a single fused graph.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.layers import LRELU_SLOPE, Conv1d, ConvTranspose1d


class ResBlock1(nn.Module):
    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 5)

    @nn.compact
    def __call__(self, x, mask=None):
        for j, d in enumerate(self.dilations):
            xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
            if mask is not None:
                xt = xt * mask
            xt = Conv1d(self.channels, self.kernel_size, dilation=d,
                        weight_norm=True, name=f"conv1_{j}")(xt)
            xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
            if mask is not None:
                xt = xt * mask
            xt = Conv1d(self.channels, self.kernel_size, dilation=1,
                        weight_norm=True, name=f"conv2_{j}")(xt)
            x = x + xt
        return x * mask if mask is not None else x


class ResBlock2(nn.Module):
    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3)

    @nn.compact
    def __call__(self, x, mask=None):
        for j, d in enumerate(self.dilations):
            xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
            if mask is not None:
                xt = xt * mask
            xt = Conv1d(self.channels, self.kernel_size, dilation=d,
                        weight_norm=True, name=f"conv_{j}")(xt)
            x = x + xt
        return x * mask if mask is not None else x


class Generator(nn.Module):
    resblock: str = "1"
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5),) * 3
    upsample_rates: Sequence[int] = (8, 8, 2, 2)
    upsample_initial_channel: int = 512
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, g=None, exc=None):
        """x: [B, T_frames, C] latent -> [B, T_frames * prod(rates), 1] audio.

        exc: optional NSF harmonic source [B, T_frames * prod(rates), 1]
        (models/svs/excitation.py). Injected after every upsample stage via
        a learned strided conv, so the high-rate resblocks shape harmonics
        around a source with the right periodicity instead of having to
        phase-track an arbitrary fundamental from near-constant input.
        """
        res_cls = ResBlock1 if self.resblock == "1" else ResBlock2
        x = Conv1d(self.upsample_initial_channel, 7, name="conv_pre")(x)
        if g is not None:
            x = x + Conv1d(self.upsample_initial_channel, 1, name="cond")(g)
        num_kernels = len(self.resblock_kernel_sizes)
        total_up = 1
        for u in self.upsample_rates:
            total_up *= u
        rate_so_far = 1
        for i, (u, k) in enumerate(zip(self.upsample_rates,
                                       self.upsample_kernel_sizes)):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            x = ConvTranspose1d(ch, k, u, weight_norm=True, name=f"up_{i}")(x)
            rate_so_far *= u
            if exc is not None:
                stride = total_up // rate_so_far
                x = x + Conv1d(ch, max(2 * stride, 3), stride=stride,
                               name=f"exc_{i}")(exc.astype(x.dtype))
            xs = None
            for j, (rk, rd) in enumerate(zip(self.resblock_kernel_sizes,
                                             self.resblock_dilation_sizes)):
                y = res_cls(ch, rk, tuple(rd), name=f"res_{i}_{j}")(x)
                xs = y if xs is None else xs + y
            x = xs / num_kernels
        x = jax.nn.leaky_relu(x)
        # small-init the output projection (1e-2 x the incoming activation
        # scale): the decoder starts squarely in tanh's linear region. With
        # the default init the random resblock stack's activation scale can
        # land the pre-tanh signal in the saturated tail, where ALL
        # waveform-loss gradients (~tanh') vanish and training locks into a
        # DC rail it can never leave (observed: full-size toy runs converge
        # to output = +0.99 with a 0.04-peak-to-peak ripple). Small-not-zero:
        # at exactly 0 the mel clamp and |audio|^2-style terms ALSO have
        # dead gradients.
        x = Conv1d(1, 7, use_bias=False, name="conv_post",
                   kernel_init=nn.initializers.variance_scaling(
                       1e-4, "fan_in", "truncated_normal"))(x)
        return jnp.tanh(x)


class DiscriminatorP(nn.Module):
    """Period discriminator: fold audio [B, S, 1] into [B, S/p, p] and run
    2-D convs over (time, period)."""
    period: int
    kernel_size: int = 5
    stride: int = 3

    @nn.compact
    def __call__(self, x):
        b, s, _ = x.shape
        p = self.period
        n_pad = (p - s % p) % p
        if n_pad:
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
        t = x.shape[1] // p
        x = x.reshape(b, t, p, 1)  # NHWC
        fmap = []
        pad = ((self.kernel_size - 1) // 2, (self.kernel_size - 1) // 2)
        for i, ch in enumerate([32, 128, 512, 1024]):
            x = nn.Conv(ch, (self.kernel_size, 1), strides=(self.stride, 1),
                        padding=(pad, (0, 0)), name=f"conv_{i}")(x)
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = nn.Conv(1024, (self.kernel_size, 1), padding=(pad, (0, 0)),
                    name="conv_4")(x)
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
        x = nn.Conv(1, (3, 1), padding=((1, 1), (0, 0)), name="conv_post")(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class DiscriminatorS(nn.Module):
    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        fmap = []
        specs = [  # (channels, kernel, stride, groups)
            (16, 15, 1, 1), (64, 41, 4, 4), (256, 41, 4, 16),
            (1024, 41, 4, 64), (1024, 41, 4, 256), (1024, 5, 1, 1),
        ]
        for i, (ch, k, s, gr) in enumerate(specs):
            x = Conv1d(ch, k, stride=s, groups=gr, weight_norm=True,
                       name=f"conv_{i}")(x)
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = Conv1d(1, 3, weight_norm=True, name="conv_post")(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)

    @nn.compact
    def __call__(self, y, y_hat):
        discs = [DiscriminatorS(name="disc_s")] + [
            DiscriminatorP(p, name=f"disc_p{p}") for p in self.periods]
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for d in discs:
            out_r, fmap_r = d(y)
            out_g, fmap_g = d(y_hat)
            y_d_rs.append(out_r)
            y_d_gs.append(out_g)
            fmap_rs.append(fmap_r)
            fmap_gs.append(fmap_g)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs

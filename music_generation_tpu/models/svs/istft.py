"""iSTFT and multi-band iSTFT vocoder decoders (TPU-only speed variants).

Based on "Lightweight and High-Fidelity End-to-End Text-to-Speech with
Multi-Band Generation and Inverse Short-Time Fourier Transform"
(arXiv 2210.15975, the MB-iSTFT-VITS family): the most expensive HiFi-GAN
upsampling stages — the ones running at the highest temporal resolution —
are replaced by an inverse STFT head (and, in the multi-band variant, a
fixed PQMF synthesis filterbank), cutting decoder FLOPs several-fold while
keeping the learned part of the vocoder at low temporal resolution where the
MXU is efficient.

These are drop-in replacements for the reference's HiFi-GAN decoder
(VISinger/models.py:292-351) selected via SVSConfig.decoder_type; they keep
the [B, T_frames, C] -> [B, T_frames * hop_length, 1] contract. No reference
counterpart exists — this is a beyond-parity performance option; checkpoints
trained with one decoder type are not interchangeable with another.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.layers import LRELU_SLOPE, Conv1d, ConvTranspose1d
from .hifigan import ResBlock1, ResBlock2


def _hann(n_fft: int) -> np.ndarray:
    # periodic Hann (matches torch.hann_window / stft conventions)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft)


def istft_overlap_add(mag: jnp.ndarray, phase: jnp.ndarray, n_fft: int,
                      hop: int) -> jnp.ndarray:
    """[B, T, n_fft//2+1] magnitude/phase frames -> [B, T * hop] samples.

    Windowed irfft + overlap-add with COLA normalization; n_fft/hop are
    small static ints (default 16/4) so the adds unroll into a fused XLA
    graph — no dynamic scatter.
    """
    assert n_fft % hop == 0, (n_fft, hop)
    b, t, _ = mag.shape
    # irfft as a real basis matmul (the TPU backend has no complex ops, and
    # at n_fft=16 a [n_bins, n_fft] GEMM is the MXU-native form anyway):
    # x[n] = 1/N * sum_k w_k * (Re_k cos(2pi k n/N) - Im_k sin(2pi k n/N)),
    # w_k = 1 for k in {0, N/2}, else 2.
    n_bins = n_fft // 2 + 1
    k = np.arange(n_bins)[:, None]
    n = np.arange(n_fft)[None, :]
    w = np.where((k == 0) | (k == n_fft // 2), 1.0, 2.0) / n_fft
    cos_b = jnp.asarray(w * np.cos(2 * np.pi * k * n / n_fft), mag.dtype)
    sin_b = jnp.asarray(w * np.sin(2 * np.pi * k * n / n_fft), mag.dtype)
    re = mag * jnp.cos(phase)
    im = mag * jnp.sin(phase)
    frames = re @ cos_b - im @ sin_b                      # [B, T, n_fft]
    win = jnp.asarray(_hann(n_fft), frames.dtype)
    frames = frames * win
    r = n_fft // hop                # frames overlapping each output sample
    total = t * hop + (n_fft - hop)
    out = jnp.zeros((b, total), frames.dtype)
    # chunk k of every frame lands at frame_start + k*hop: r static adds
    chunks = frames.reshape(b, t, r, hop)
    for k in range(r):
        flat = chunks[:, :, k, :].reshape(b, t * hop)
        out = out.at[:, k * hop: k * hop + t * hop].add(flat)
    # COLA normalization: the synthesis window was applied once (the network
    # predicts spectra directly, no analysis window), so divide by the
    # window-sum envelope at each sample
    env_w = np.zeros(total, np.float64)
    for i in range(t):
        env_w[i * hop: i * hop + n_fft] += _hann(n_fft)
    out = out / jnp.asarray(np.maximum(env_w, 1e-6), out.dtype)
    # trim the n_fft-hop tail so length == t*hop (head retains the partial
    # first frames; the model learns the convention)
    return out[:, : t * hop]


def pqmf_filters(subbands: int, taps: int = 62, cutoff: float = 0.142,
                 beta: float = 9.0, synthesis: bool = False) -> np.ndarray:
    """Cosine-modulated Kaiser prototype filterbank (near-perfect-
    reconstruction PQMF, the standard MB-MelGAN/MB-iSTFT design).

    [subbands, taps+1] filters; the synthesis bank differs from the
    analysis bank by the sign of the (-1)^k * pi/4 phase term.
    """
    from scipy.signal import firwin
    proto = firwin(taps + 1, cutoff, window=("kaiser", beta))
    n = np.arange(taps + 1)
    sign = -1.0 if synthesis else 1.0
    filters = np.zeros((subbands, taps + 1))
    for k in range(subbands):
        filters[k] = (2 * proto *
                      np.cos((2 * k + 1) * np.pi / (2 * subbands)
                             * (n - taps / 2)
                             + sign * (-1) ** k * np.pi / 4))
    return filters


def pqmf_synthesis(bands: jnp.ndarray, filters: np.ndarray) -> jnp.ndarray:
    """[B, T, S] sub-band signals -> [B, T*S] full-band signal.

    Upsample each band by S (zero-stuffing) and convolve with its synthesis
    filter (``pqmf_filters(..., synthesis=True)``) — expressed as one conv
    over the stacked band axis so XLA fuses it into a single GEMM-like op.
    """
    b, t, s = bands.shape
    taps = filters.shape[1] - 1
    # zero-stuff: [B, T, S] -> [B, T*S, S]
    up = jnp.zeros((b, t * s, s), bands.dtype)
    up = up.at[:, ::s, :].set(bands)
    # lax conv is correlation; flip taps to get true convolution with g_k
    kernel = jnp.asarray(filters[:, ::-1].T[:, :, None] * s, bands.dtype)
    out = jax.lax.conv_general_dilated(
        up, kernel, window_strides=(1,),
        padding=[(taps // 2, taps - taps // 2)],
        dimension_numbers=("NHC", "HIO", "NHC"))
    return out[..., 0]


def _hifigan_trunk(mdl, x, g):
    """Shared conv_pre + upsample/resblock trunk (the learned low-rate part
    of both iSTFT generators; same structure as hifigan.Generator's body)."""
    res_cls = ResBlock1 if mdl.resblock == "1" else ResBlock2
    x = Conv1d(mdl.upsample_initial_channel, 7, name="conv_pre")(x)
    if g is not None:
        x = x + Conv1d(mdl.upsample_initial_channel, 1, name="cond")(g)
    num_kernels = len(mdl.resblock_kernel_sizes)
    for i, (u, k) in enumerate(zip(mdl.upsample_rates,
                                   mdl.upsample_kernel_sizes)):
        ch = mdl.upsample_initial_channel // (2 ** (i + 1))
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        x = ConvTranspose1d(ch, k, u, weight_norm=True, name=f"up_{i}")(x)
        xs = None
        for j, (rk, rd) in enumerate(zip(mdl.resblock_kernel_sizes,
                                         mdl.resblock_dilation_sizes)):
            y = res_cls(ch, rk, tuple(rd), name=f"res_{i}_{j}")(x)
            xs = y if xs is None else xs + y
        x = xs / num_kernels
    return jax.nn.leaky_relu(x)


def _mag_phase(h, n_bins):
    mag = jnp.exp(jnp.clip(h[..., :n_bins], -10.0, 6.0))
    phase = jnp.pi * jnp.tanh(h[..., n_bins:])
    return mag, phase


class ISTFTGenerator(nn.Module):
    """HiFi-GAN trunk at low rate + iSTFT head (single band).

    prod(upsample_rates) * istft_hop must equal the model hop_length.
    """
    resblock: str = "1"
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5),) * 3
    upsample_rates: Sequence[int] = (8, 8)
    upsample_kernel_sizes: Sequence[int] = (16, 16)
    upsample_initial_channel: int = 512
    istft_n_fft: int = 16
    istft_hop: int = 4
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, g=None):
        x = _hifigan_trunk(self, x, g)
        n_bins = self.istft_n_fft // 2 + 1
        h = Conv1d(2 * n_bins, 7, name="istft_head")(x)
        mag, phase = _mag_phase(h, n_bins)
        audio = istft_overlap_add(mag, phase, self.istft_n_fft,
                                  self.istft_hop)
        return jnp.tanh(audio)[..., None]


class MBISTFTGenerator(nn.Module):
    """Multi-band variant: trunk at even lower rate emits `subbands`
    iSTFT heads; a fixed PQMF synthesis bank recombines the bands.

    prod(upsample_rates) * istft_hop * subbands == hop_length.
    """
    resblock: str = "1"
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5),) * 3
    upsample_rates: Sequence[int] = (4, 4)
    upsample_kernel_sizes: Sequence[int] = (8, 8)
    upsample_initial_channel: int = 512
    istft_n_fft: int = 16
    istft_hop: int = 4
    subbands: int = 4
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, g=None):
        x = _hifigan_trunk(self, x, g)
        n_bins = self.istft_n_fft // 2 + 1
        h = Conv1d(2 * n_bins * self.subbands, 7, name="istft_head")(x)
        b, t, _ = h.shape
        h = h.reshape(b, t, self.subbands, 2 * n_bins)
        mag, phase = _mag_phase(h, n_bins)
        bands = []
        for s in range(self.subbands):
            bands.append(istft_overlap_add(mag[:, :, s], phase[:, :, s],
                                           self.istft_n_fft, self.istft_hop))
        bands = jnp.stack(bands, axis=-1)           # [B, T*hop, S]
        filters = pqmf_filters(self.subbands, synthesis=True)
        audio = pqmf_synthesis(bands, filters)
        return jnp.tanh(audio)[..., None]

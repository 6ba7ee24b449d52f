"""Spectrogram features in pure JAX (framing as strided gather + rFFT).

Parity: VISinger/utils/utils.py:385-432 — reflect-pad (n_fft-hop)/2, hann
window, center=False, magnitude sqrt(|S|^2 + 1e-6); mel basis is the
Slaney-style filterbank (librosa.filters.mel defaults, fmin=50 fmax=7600),
log-compressed with clip(1e-5).

The frame+FFT+matmul pipeline is one fused XLA program; the mel projection is
a single [F, n_freq] x [n_freq, n_mels] GEMM on the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window (torch.hann_window semantics)."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def _hz_to_mel(f):
    """Slaney mel scale (librosa htk=False)."""
    f = np.asarray(f, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
                    mels)


def _mel_to_hz(m):
    m = np.asarray(m, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)),
                    freqs)


@functools.lru_cache(maxsize=8)
def mel_filterbank(sr: int = 22050, n_fft: int = 1024, n_mels: int = 80,
                   fmin: float = 50.0, fmax: float = 7600.0) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank [n_mels, n_fft//2+1]."""
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_freqs)
    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2: n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def frame_signal(y: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """[B, S] -> [B, n_frames, frame_length] via gather (no center padding)."""
    n_frames = 1 + (y.shape[-1] - frame_length) // hop
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(frame_length)[None, :]
    return y[..., idx]


def spectrogram(y: jnp.ndarray, n_fft: int = 1024, hop: int = 256,
                win_length: int = 1024) -> jnp.ndarray:
    """Linear magnitude spectrogram. y: [B, S] in [-1, 1].
    Returns [B, n_frames, n_fft//2+1]; n_frames = S // hop (after padding)."""
    pad = (n_fft - hop) // 2
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    frames = frame_signal(y, n_fft, hop)
    window = jnp.asarray(hann_window(win_length))
    spec = jnp.fft.rfft(frames * window, n=n_fft, axis=-1)
    return jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + 1e-6)


def spec_to_mel(spec: jnp.ndarray, sr: int = 22050, n_fft: int = 1024,
                n_mels: int = 80, fmin: float = 50.0,
                fmax: float = 7600.0) -> jnp.ndarray:
    """Linear [B, F, n_freq] -> log-mel [B, F, n_mels]."""
    basis = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax))
    mel = jnp.einsum("bfn,mn->bfm", spec, basis)
    return jnp.log(jnp.clip(mel, min=1e-5))


def mel_spectrogram(y: jnp.ndarray, sr: int = 22050, n_fft: int = 1024,
                    hop: int = 256, win_length: int = 1024, n_mels: int = 80,
                    fmin: float = 50.0, fmax: float = 7600.0) -> jnp.ndarray:
    return spec_to_mel(spectrogram(y, n_fft, hop, win_length),
                       sr, n_fft, n_mels, fmin, fmax)

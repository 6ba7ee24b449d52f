"""NSF-style harmonic excitation for the vocoder decoder.

The reference's VISinger-1 decoder (models.py:292-341) vocodes straight from
the latent z. On held notes — the common case in singing — the frame-level
input is nearly constant in time, and a stack of (transposed) convolutions
cannot phase-track an arbitrary fundamental from a constant input: its output
is locked to periods commensurate with the upsample factor. Observed on the
sine-singer toy set as a hard mel-L1 floor (~0.6) with the log-mel term
pushing conv_post into tanh saturation (DC output).

The fix — standard in singing vocoders since NSF / NSF-HiFiGAN and adopted by
VISinger-2 — is to hand the decoder an explicit harmonic source: a sine wave
at the target F0, generated at sample rate with a running phase
(cumulative-sum integral of the instantaneous frequency), injected at every
upsample stage through small strided convolutions. The network then shapes
harmonics/noise around a source that already has the right periodicity.

TPU notes: the phase integral is one jnp.cumsum (log-depth associative scan,
bandwidth-trivial at [B, S] f32); the per-stage downsamplers are strided
convs XLA maps onto the MXU. The excitation is generated ONCE at full length
by the caller and sliced/windowed alongside the latent, so the frame-chunked
decode (pipeline/synthesis.py _chunked_decode) keeps a continuous phase
across chunk boundaries.
"""

from __future__ import annotations

import jax.numpy as jnp

# log1p(Hz) threshold below which a predicted F0 is treated as unvoiced
# (expm1(3.43) ~ 30 Hz, below any singing fundamental)
VOICED_LOG_F0_MIN = 3.43
EXC_AMPLITUDE = 0.1


def harmonic_excitation(log_f0: jnp.ndarray, hop: int, sample_rate: int,
                        amplitude: float = EXC_AMPLITUDE) -> jnp.ndarray:
    """Frame-level log1p-F0 [B, T] -> sample-level sine source [B, T*hop, 1].

    Unvoiced frames (log_f0 below VOICED_LOG_F0_MIN) contribute zero signal
    and zero phase advance, so a note restarting after a rest begins from the
    held phase rather than a discontinuity.
    """
    # f32 regardless of compute dtype: the phase integral accumulates ~1e4
    # radians over a clip and bf16 cumsum would destroy it
    log_f0 = log_f0.astype(jnp.float32)
    f0 = jnp.expm1(jnp.clip(log_f0, 0.0, 9.0))  # Hz, <= ~8 kHz
    voiced = (log_f0 > VOICED_LOG_F0_MIN).astype(jnp.float32)
    f0 = f0 * voiced
    f0_up = jnp.repeat(f0, hop, axis=1)                      # [B, S]
    phase = 2.0 * jnp.pi * jnp.cumsum(f0_up / sample_rate, axis=1)
    exc = amplitude * jnp.sin(phase) * jnp.repeat(voiced, hop, axis=1)
    return exc[..., None]

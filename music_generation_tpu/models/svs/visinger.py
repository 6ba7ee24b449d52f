"""VISinger: VITS-derived singing-voice synthesizer (flax, TPU-first).

Parity targets (structure and tensor semantics, re-laid-out channels-last):
  - TextEncoder with 4 summed embeddings          VISinger/models.py:151-218
  - DurationPredictor (sigmoid fraction)          VISinger/models.py:100-148
  - TextPostNet (pos-emb -> F0 -> mel -> prior)   VISinger/ext_modules/*
  - PosteriorEncoder / ResidualCouplingBlock      VISinger/models.py:221-289
  - HiFi-GAN decoder                              VISinger/models.py:292-351
  - AE variant (SpecDecoder + spec_proj)          VISinger/models_ae.py diff
  - LengthRegulator                               VISinger/models.py:705-739
    (re-expressed as a batched cumsum+gather, see core.masking)

Everything in `infer` is a single jit-compiled XLA program with static
max-frame shape; variable length is carried by masks + a trailing trim on the
host.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.attention import TransformerEncoder
from ...core.flows import ResidualCouplingBlock
from ...core.layers import Conv1d
from ...core.masking import expand_by_durations, feature_mask, rand_slice_segments
from ...core.wavenet import WaveNet
from ..duration import DurationPredictor
from .hifigan import Generator

# --- F0 quantization (jnp twin of frontend.pitch.f0_to_coarse) -------------
_F0_BIN = 256
_F0_MEL_MIN = 1127.0 * math.log(1.0 + 50.0 / 700.0)
_F0_MEL_MAX = 1127.0 * math.log(1.0 + 1100.0 / 700.0)


def f0_to_coarse(f0: jnp.ndarray) -> jnp.ndarray:
    mel = 1127.0 * jnp.log(1.0 + f0 / 700.0)
    scaled = jnp.where(
        mel > 0,
        (mel - _F0_MEL_MIN) * (_F0_BIN - 2) / (_F0_MEL_MAX - _F0_MEL_MIN) + 1.0,
        mel)
    scaled = jnp.clip(scaled, 1.0, _F0_BIN - 1)
    return jnp.floor(scaled + 0.5).astype(jnp.int32)


def note_hz_frames(note_ids: jnp.ndarray, frames: jnp.ndarray,
                   max_frames: int) -> jnp.ndarray:
    """Per-frame Hz of the score's MIDI notes (0 at rests, note_id 0),
    length-regulated with the SAME per-phone frame counts as the text
    hidden — the deterministic pitch base for f0_mode="score" and the
    f0_residual head. [B, T_phones] int note ids -> [B, max_frames] f32."""
    hz_ph = jnp.where(
        note_ids > 0,
        440.0 * jnp.exp2((note_ids.astype(jnp.float32) - 69.0) / 12.0),
        0.0)
    hz_fr, _ = expand_by_durations(hz_ph[..., None], frames, max_frames)
    return hz_fr[..., 0]


@dataclasses.dataclass(frozen=True)
class SVSConfig:
    """Model hyperparameters (defaults = VISinger/configs/ours_ae.json)."""
    n_vocab: int = 100
    n_vocab_note: int = 100
    n_vocab_shengdiao: int = 300
    spec_channels: int = 513          # filter_length // 2 + 1
    inter_channels: int = 192
    hidden_channels: int = 192
    filter_channels: int = 768
    n_heads: int = 2
    n_layers: int = 6
    kernel_size: int = 3
    p_dropout: float = 0.1
    resblock: str = "1"
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5),) * 3
    upsample_rates: Sequence[int] = (8, 8, 2, 2)
    upsample_initial_channel: int = 512
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    segment_size: int = 12288         # samples per training slice (AE config)
    n_speakers: int = 0
    gin_channels: int = 0
    autoencoder: bool = True          # models_ae variant (SpecDecoder path)
    decoder_bf16: bool = False        # run the HiFi-GAN stack in bfloat16
    # vocoder decoder family (beyond-parity speed option, models/svs/istft.py
    # after arXiv 2210.15975): "hifigan" (reference parity), "istft" (iSTFT
    # head replaces the last upsample stages), "mb_istft" (+ PQMF subbands).
    # istft_upsample_rates * istft_hop (* subbands) must equal hop_length.
    decoder_type: str = "hifigan"
    istft_n_fft: int = 16
    istft_hop: int = 4
    istft_upsample_rates: Sequence[int] = (8, 8)
    istft_upsample_kernel_sizes: Sequence[int] = (16, 16)
    mb_subbands: int = 4
    mb_upsample_rates: Sequence[int] = (4, 4)
    mb_upsample_kernel_sizes: Sequence[int] = (8, 8)
    sampling_rate: int = 22050
    hop_length: int = 256
    frame_seconds: float = 0.0116     # duration->frames divisor (models.py:639)
    # NSF harmonic excitation (models/svs/excitation.py): hand the decoder a
    # sample-rate sine source at the target F0 (GT log-f0 in training,
    # predicted log-f0 at inference). Beyond-parity: the reference's plain
    # HiFi-GAN-on-z decoder cannot phase-track held notes (observed mel-L1
    # floor + tanh saturation on stationary-pitch data); this is the
    # NSF/VISinger-2-style fix. hifigan decoder_type only.
    nsf: bool = False
    # Inference F0 source: "predict" (reference parity — the F0Predictor's
    # frame log-f0 drives the f0 embedding and the NSF source,
    # ext_modules/text_post_net; pipline_inference_svs_v6_multispeaker.py
    # serves exactly this) or "score" (beyond-parity pitch control: the
    # frame F0 is derived from the score's MIDI note ids instead, so the
    # output is in tune by construction — standard practice in production
    # singing synthesis where the score dictates pitch). Training is
    # unaffected (GT F0 is always used there).
    f0_mode: str = "predict"
    # Residual F0 head (beyond-parity): the F0Predictor's zero-initialized
    # output is a deviation ADDED to the score note's frame log-F0 (same
    # length regulation as the text hidden), instead of an absolute log-F0.
    # The model starts exactly on pitch and learns only the expressive
    # deviation (vibrato, transitions, unvoiced dips), which removes the
    # systematic intonation bias an absolute head converges to on small
    # corpora (observed +1.5 st on the toy set, artifacts/
    # sung_song_sweep.json) while keeping f0_mode="predict" expressive —
    # unlike the hard "score" override. Applies to training AND inference;
    # checkpoints are tree-compatible either way (same parameters, only the
    # out-conv init and the head's meaning differ).
    f0_residual: bool = False

    @property
    def hop_seconds(self) -> float:
        return self.hop_length / self.sampling_rate

    @property
    def segment_frames(self) -> int:
        return self.segment_size // self.hop_length


class TextEncoder(nn.Module):
    cfg: SVSConfig

    @nn.compact
    def __call__(self, phones, note_ids, note_durations, shengdiao, mask,
                 deterministic: bool = True):
        h = self.cfg.hidden_channels
        emb = (
            nn.Embed(self.cfg.n_vocab, h,
                     embedding_init=nn.initializers.normal(h ** -0.5),
                     name="emb_phoneme")(phones)
            + nn.Embed(self.cfg.n_vocab_note, h,
                       embedding_init=nn.initializers.normal(h ** -0.5),
                       name="emb_note_pitch")(note_ids)
            + nn.Dense(h, name="emb_note_duration")(note_durations[..., None])
            + nn.Embed(self.cfg.n_vocab_shengdiao, h,
                       name="emb_shengdiao")(shengdiao)
        ) * math.sqrt(h)
        x = TransformerEncoder(
            h, self.cfg.filter_channels, self.cfg.n_heads, self.cfg.n_layers,
            self.cfg.kernel_size, self.cfg.p_dropout, name="encoder")(
                emb * mask, mask, deterministic=deterministic)
        return x * mask


class F0Predictor(nn.Module):
    cfg: SVSConfig
    n_layers: int = 6
    # zero-init the output conv so a residual head (cfg.f0_residual) starts
    # at exactly the note pitch; parameter tree is unchanged
    zero_init: bool = False

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        h = TransformerEncoder(
            self.cfg.hidden_channels, self.cfg.filter_channels,
            self.cfg.n_heads, self.n_layers, self.cfg.kernel_size,
            self.cfg.p_dropout, name="encoder")(x * mask, mask,
                                                deterministic=deterministic)
        out_init = (nn.initializers.zeros if self.zero_init
                    else nn.initializers.lecun_normal())
        log_f0 = Conv1d(1, 1, kernel_init=out_init,
                        name="out")(h * mask) * mask
        return log_f0[..., 0]


class MelPredictNetwork(nn.Module):
    cfg: SVSConfig
    out_channels: int = 80
    n_layers: int = 4

    @nn.compact
    def __call__(self, x, condition, mask, deterministic: bool = True):
        if condition is not None:
            x = x + Conv1d(x.shape[-1], 1, name="condition_proj")(condition)
        x = x * mask
        x = TransformerEncoder(
            self.cfg.hidden_channels, self.cfg.filter_channels,
            self.cfg.n_heads, self.n_layers, self.cfg.kernel_size,
            self.cfg.p_dropout, name="encoder")(x, mask,
                                                deterministic=deterministic)
        return Conv1d(self.out_channels, 1, name="out")(x * mask) * mask


class FramePriorNetwork(nn.Module):
    out_channels: int
    condition_channels: int
    n_layers: int = 4

    @nn.compact
    def __call__(self, x, condition, mask):
        if condition is not None:
            x = x + Conv1d(x.shape[-1], 1, name="condition_proj")(condition)
        x = x * mask
        for i in range(self.n_layers):
            x = jax.nn.gelu(Conv1d(self.out_channels, 1, name=f"conv_{i}")(x))
            x = x * mask
        return x


class TextPostNet(nn.Module):
    """Position emb -> F0 predictor -> mel predictor -> frame prior -> (m, logs)."""
    cfg: SVSConfig
    max_positions: int = 2000

    @nn.compact
    def __call__(self, x, mask, f0_score=None, lf0_base=None,
                 deterministic: bool = True):
        h = self.cfg.hidden_channels
        t = x.shape[1]
        pos_emb = nn.Embed(self.max_positions, h, name="position_embeddings")(
            jnp.arange(t)[None, :])
        x_emb = (x + pos_emb) * mask

        log_f0 = F0Predictor(self.cfg, zero_init=self.cfg.f0_residual,
                             name="f0_predictor")(x_emb, mask, deterministic)
        if lf0_base is not None:
            # residual head: the predictor output is a deviation around the
            # score note's log1p-F0 (cfg.f0_residual)
            log_f0 = (log_f0 + lf0_base) * mask[..., 0]
        if f0_score is None:
            f0_score = f0_to_coarse(jnp.exp(log_f0) - 1.0)
        f0_emb = nn.Embed(300, h, name="f0_emb")(f0_score) * mask

        mel_predict = MelPredictNetwork(self.cfg, name="mel_predict_net")(
            x_emb, f0_emb, mask, deterministic)
        x_hidden = FramePriorNetwork(h, h, name="frame_prior_net")(
            mel_predict, f0_emb, mask)
        stats = Conv1d(2 * self.cfg.inter_channels, 1, name="proj")(
            x_hidden * mask) * mask
        m = stats[..., : self.cfg.inter_channels]
        logs = stats[..., self.cfg.inter_channels:]
        return m, logs, log_f0, mel_predict


class PosteriorEncoder(nn.Module):
    cfg: SVSConfig

    @nn.compact
    def __call__(self, spec, mask, g=None, deterministic: bool = True,
                 noise=None):
        x = Conv1d(self.cfg.hidden_channels, 1, name="pre")(spec) * mask
        x = WaveNet(self.cfg.hidden_channels, 5, 1, 16,
                    gin_channels=self.cfg.gin_channels, name="enc")(
                        x, mask, g=g, deterministic=deterministic)
        stats = Conv1d(2 * self.cfg.inter_channels, 1, name="proj")(x) * mask
        m = stats[..., : self.cfg.inter_channels]
        logs = stats[..., self.cfg.inter_channels:]
        if noise is None:  # injectable for cross-framework parity tests
            noise = jax.random.normal(self.make_rng("noise"), m.shape)
        z = (m + noise * jnp.exp(logs)) * mask
        return z, m, logs, x


class SpecDecoder(nn.Module):
    """z -> predicted linear spectrogram (AE variant, ext_modules/spec_decoder.py)."""
    cfg: SVSConfig

    @nn.compact
    def __call__(self, x, mask, g=None, deterministic: bool = True):
        x = Conv1d(self.cfg.hidden_channels, 1, name="pre")(x) * mask
        x = WaveNet(self.cfg.hidden_channels, 5, 1, 16,
                    gin_channels=self.cfg.gin_channels, name="enc")(
                        x, mask, g=g, deterministic=deterministic)
        return Conv1d(self.cfg.spec_channels, 1, name="proj")(x) * mask


class VISinger(nn.Module):
    """Full synthesizer. Methods:
      - infer(...): score -> waveform (jittable, static max_frames)
      - __call__(...): training forward (returns pieces for GAN/VAE losses)
    """
    cfg: SVSConfig

    def setup(self):
        c = self.cfg
        self.text_encoder = TextEncoder(c, name="text_encoder")
        self.duration_predictor = DurationPredictor(
            256, 3, 0.5, name="duration_predictor")
        self.text_post_net = TextPostNet(c, name="text_post_net")
        self.spec_encoder = PosteriorEncoder(c, name="spec_encoder")
        self.spec_flow = ResidualCouplingBlock(
            c.inter_channels, c.hidden_channels, 5, 1, 4,
            gin_channels=c.gin_channels, name="spec_flow")
        dil = tuple(tuple(d) for d in c.resblock_dilation_sizes)
        if c.decoder_type == "istft":
            from .istft import ISTFTGenerator
            up = int(np.prod(c.istft_upsample_rates)) * c.istft_hop
            assert up == c.hop_length, (up, c.hop_length)
            self.decoder = ISTFTGenerator(
                c.resblock, tuple(c.resblock_kernel_sizes), dil,
                tuple(c.istft_upsample_rates),
                tuple(c.istft_upsample_kernel_sizes),
                c.upsample_initial_channel, c.istft_n_fft, c.istft_hop,
                gin_channels=c.gin_channels, name="decoder")
        elif c.decoder_type == "mb_istft":
            from .istft import MBISTFTGenerator
            up = (int(np.prod(c.mb_upsample_rates)) * c.istft_hop
                  * c.mb_subbands)
            assert up == c.hop_length, (up, c.hop_length)
            self.decoder = MBISTFTGenerator(
                c.resblock, tuple(c.resblock_kernel_sizes), dil,
                tuple(c.mb_upsample_rates),
                tuple(c.mb_upsample_kernel_sizes),
                c.upsample_initial_channel, c.istft_n_fft, c.istft_hop,
                c.mb_subbands, gin_channels=c.gin_channels, name="decoder")
        else:
            assert c.decoder_type == "hifigan", c.decoder_type
            self.decoder = Generator(
                c.resblock, tuple(c.resblock_kernel_sizes), dil,
                tuple(c.upsample_rates), c.upsample_initial_channel,
                tuple(c.upsample_kernel_sizes), gin_channels=c.gin_channels,
                name="decoder")
        if c.nsf:
            assert c.decoder_type == "hifigan", (
                "NSF excitation is wired for the hifigan decoder only")
        if c.autoencoder:
            self.spec_decoder = SpecDecoder(c, name="spec_decoder")
            self.spec_proj = Conv1d(c.inter_channels, 1, name="spec_proj")

    def _decode(self, hidden, g=None, exc=None):
        kw = {}
        if exc is not None:
            assert self.cfg.nsf, "excitation passed but cfg.nsf is off"
            kw["exc"] = exc
        if self.cfg.decoder_bf16:
            # vocoder convs on the MXU in bf16; output back to f32
            return self.decoder(hidden.astype(jnp.bfloat16),
                                g=g, **kw).astype(jnp.float32)
        return self.decoder(hidden, g=g, **kw)

    def _excitation(self, log_f0):
        """Frame-level log1p-F0 [B, T] -> NSF sine source [B, T*hop, 1]."""
        from .excitation import harmonic_excitation
        return harmonic_excitation(log_f0, self.cfg.hop_length,
                                   self.cfg.sampling_rate)

    def _latent_to_audio(self, z, y_mask, g=None, deterministic=True,
                         log_f0=None):
        if self.cfg.autoencoder:
            spec_predict = self.spec_decoder(z, y_mask,
                                             deterministic=deterministic)
            hidden = self.spec_proj(spec_predict) * y_mask
        else:
            spec_predict = None
            hidden = z * y_mask
        exc = self._excitation(log_f0) if (self.cfg.nsf and log_f0 is not None
                                           ) else None
        return self._decode(hidden, g=g, exc=exc), spec_predict

    def infer(self, phones, x_lengths, note_ids, note_durations, shengdiao,
              max_frames: int, noise_scale: float = 1.0,
              ph_dur: Optional[jnp.ndarray] = None,
              noise: Optional[jnp.ndarray] = None):
        """Score -> waveform.

        phones/note_ids/shengdiao: int32 [B, T]; note_durations: f32 [B, T]
        seconds; x_lengths: int32 [B]. Returns (audio [B, max_frames*hop, 1],
        mel_len [B], aux dict).
        """
        hidden, mel_len, aux = self.infer_hidden(
            phones, x_lengths, note_ids, note_durations, shengdiao,
            max_frames, noise_scale=noise_scale, ph_dur=ph_dur, noise=noise)
        return self._decode(hidden, exc=aux.get("exc")), mel_len, aux

    def infer_hidden(self, phones, x_lengths, note_ids, note_durations,
                     shengdiao, max_frames: int, noise_scale: float = 1.0,
                     ph_dur: Optional[jnp.ndarray] = None,
                     noise: Optional[jnp.ndarray] = None):
        """infer() up to (but excluding) the vocoder decoder: returns the
        decoder input hidden [B, max_frames, C]. Lets callers run the
        decoder frame-chunked in the same jit program (decode_chunked) —
        the HiFi-GAN upsample activations, not the model, are what cap the
        batch size in HBM (b=32 x 512 frames needs ~22 G vs 15.75 G)."""
        c = self.cfg
        x_mask = feature_mask(x_lengths, phones.shape[1])
        h_text = self.text_encoder(phones, note_ids, note_durations,
                                   shengdiao, x_mask)
        if ph_dur is None:
            frac = self.duration_predictor(h_text, x_mask)
            phoneme_seconds = frac * note_durations
            frames = jnp.floor(phoneme_seconds / c.frame_seconds).astype(jnp.int32)
        else:
            frames = ph_dur
        frames = frames * x_mask[..., 0].astype(frames.dtype)

        h_lr, mel_len = expand_by_durations(h_text, frames, max_frames)
        mel_len = jnp.minimum(mel_len, max_frames)
        y_mask = feature_mask(mel_len, max_frames)

        f0_score_coarse = None
        lf0_score = None
        lf0_base = None
        if c.f0_mode == "score" or c.f0_residual:
            # frame F0 from the score's MIDI notes (0 = rest -> 0 Hz),
            # expanded with the SAME frame counts as the text hidden
            hz_fr = note_hz_frames(note_ids, frames,
                                   max_frames) * y_mask[..., 0]
            if c.f0_mode == "score":
                lf0_score = jnp.log1p(hz_fr)
                f0_score_coarse = f0_to_coarse(hz_fr)
            if c.f0_residual:
                lf0_base = jnp.log1p(hz_fr)
        m_p, logs_p, log_f0, mel_predict = self.text_post_net(
            h_lr, y_mask, f0_score=f0_score_coarse, lf0_base=lf0_base)
        if noise is None:
            noise = jax.random.normal(self.make_rng("noise"), m_p.shape)
        z_p = m_p + noise * jnp.exp(logs_p) * noise_scale
        z = self.spec_flow(z_p, y_mask, reverse=True)
        if c.autoencoder:
            spec_predict = self.spec_decoder(z, y_mask)
            hidden = self.spec_proj(spec_predict) * y_mask
        else:
            spec_predict = None
            hidden = z * y_mask
        lf0_used = (lf0_score if lf0_score is not None
                    else log_f0 * y_mask[..., 0])
        aux = {"log_f0": log_f0, "log_f0_used": lf0_used,
               "mel_predict": mel_predict,
               "spec_predict": spec_predict, "frames": frames}
        if c.nsf:
            # full-length source from the predicted (f0_mode="predict") or
            # score-derived (f0_mode="score") F0; callers slice it alongside
            # hidden so frame-chunked decodes stay phase-continuous
            aux["exc"] = self._excitation(lf0_used)
        return hidden, mel_len, aux

    def decode_hidden(self, hidden, g=None, exc=None):
        """Vocoder decoder only (pairs with infer_hidden)."""
        return self._decode(hidden, g=g, exc=exc)

    def infer_fake(self, spec, y_lengths, max_len: Optional[int] = None,
                   noise=None, log_f0=None):
        """Copy-synthesis: real spectrogram -> posterior z -> waveform
        (parity: models.py:686-693 == models_ae.py:664-672 — both variants
        feed z straight into the HiFi-GAN decoder, bypassing the AE spec
        decoder). Useful for vocoder-quality checks. log_f0: ground-truth
        frame F0 for the NSF source (required for cfg.nsf models)."""
        y_mask = feature_mask(y_lengths, spec.shape[1])
        z, _, _, _ = self.spec_encoder(spec, y_mask, noise=noise)
        z = z * y_mask
        exc = (self._excitation(log_f0) if (self.cfg.nsf and
                                            log_f0 is not None) else None)
        if max_len is not None:  # mask sliced with z (they must broadcast)
            z, y_mask = z[:, :max_len], y_mask[:, :max_len]
            if exc is not None:
                exc = exc[:, : max_len * self.cfg.hop_length]
        return self._decode(z, exc=exc), y_mask, z

    def copy_synthesis(self, spec, y_lengths, noise=None, log_f0=None):
        """Spectrogram -> posterior z -> the TRAINED decode path
        (z -> spec decoder -> decoder in the AE variant) -> waveform.

        Unlike infer_fake — which reproduces the reference's decoder(z)
        bypass verbatim (models_ae.py:664-672, pre-AE code that never sees
        the AE model's real decoder input) — this is the path the training
        objective optimizes, so it is the meaningful reconstruction-quality
        probe (tools/eval_copy_synthesis.py). log_f0: ground-truth frame F0
        for the NSF source (required for cfg.nsf models)."""
        y_mask = feature_mask(y_lengths, spec.shape[1])
        z, _, _, _ = self.spec_encoder(spec, y_mask, noise=noise)
        audio, _ = self._latent_to_audio(z, y_mask, log_f0=log_f0)
        return audio, y_mask, z

    def voice_conversion(self, spec, y_lengths, g_src=None, g_tgt=None):
        """Posterior -> flow -> inverse flow under a different speaker
        conditioning (parity: models.py:675-683; speaker embeddings are the
        g tensors when gin_channels > 0; like the reference, decodes z_hat
        directly — no AE spec decoder on this path)."""
        y_mask = feature_mask(y_lengths, spec.shape[1])
        z, m_q, logs_q, _ = self.spec_encoder(spec, y_mask, g=g_src)
        z_p = self.spec_flow(z, y_mask, g=g_src)
        z_hat = self.spec_flow(z_p, y_mask, g=g_tgt, reverse=True)
        return self._decode(z_hat * y_mask, g=g_tgt), y_mask, (z, z_p, z_hat)

    def __call__(self, phones, x_lengths, spec, y_lengths, note_ids,
                 note_durations, f0_score, phone_durations, shengdiao,
                 deterministic: bool = False, use_mas: bool = False,
                 log_f0=None):
        """Training forward (parity: models_ae.py forward).

        use_mas=True replaces the ground-truth ``phone_durations`` with
        monotonic-alignment-search targets computed inside the step (the
        commented-out VITS path at VISinger/models.py:590-604): the
        token-level prior — text_post_net applied to the UN-regulated text
        encoding, sharing the frame-level parameters — is aligned against
        the posterior sample z_p, and the per-token frame counts feed the
        LengthRegulator and the duration loss. Enables training corpora
        without phone-duration annotations.
        """
        c = self.cfg
        x_mask = feature_mask(x_lengths, phones.shape[1])
        h_text = self.text_encoder(phones, note_ids, note_durations, shengdiao,
                                   x_mask, deterministic=deterministic)
        duration_fraction = self.duration_predictor(
            h_text, x_mask, deterministic=deterministic)

        max_frames = spec.shape[1]
        y_mask = feature_mask(y_lengths, max_frames)
        z, m_q, logs_q, _ = self.spec_encoder(spec, y_mask,
                                              deterministic=deterministic)
        z_p = self.spec_flow(z, y_mask)

        if use_mas:
            from ...ops import mas_duration_targets
            m_tok, logs_tok, _, _ = self.text_post_net(
                h_text, x_mask, deterministic=deterministic)
            phone_durations = mas_duration_targets(
                jax.lax.stop_gradient(z_p), jax.lax.stop_gradient(m_tok),
                jax.lax.stop_gradient(logs_tok), x_mask, y_mask)

        h_lr, _ = expand_by_durations(h_text, phone_durations, max_frames)

        # NOTE: keep the predicted F0 distinct from the ground-truth ``log_f0``
        # kwarg — the NSF excitation below must be driven by the GT contour
        # (teacher forcing); a shared name would silently shadow the batch F0
        # and let mel/adv gradients flow into the F0 predictor through the
        # sine source, dragging it away from its YIN target.
        lf0_base = None
        if c.f0_residual:
            # deviation target: the head trains against (GT lf0 - note lf0),
            # expanded with the ACTUAL durations that drove the
            # LengthRegulator (ground truth or in-step MAS)
            lf0_base = jnp.log1p(
                note_hz_frames(note_ids, phone_durations,
                               max_frames)) * y_mask[..., 0]
        m_p, logs_p, log_f0_pred, mel_predict = self.text_post_net(
            h_lr, y_mask, f0_score=f0_score, lf0_base=lf0_base,
            deterministic=deterministic)

        # reverse-KL sample
        noise = jax.random.normal(self.make_rng("noise"), m_p.shape)
        z_p_hat = m_p + noise * jnp.exp(logs_p)
        z_hat = self.spec_flow(z_p_hat, y_mask, reverse=True)

        if c.autoencoder:
            spec_predict = self.spec_decoder(z, y_mask,
                                             deterministic=deterministic)
            dec_input = self.spec_proj(spec_predict)
        else:
            spec_predict = None
            dec_input = z

        z_slice, ids_slice = rand_slice_segments(
            self.make_rng("slice"), dec_input, y_lengths, c.segment_frames)
        if c.nsf:
            assert log_f0 is not None, "cfg.nsf training needs batch log_f0"
            from ...core.masking import slice_segments
            exc = slice_segments(self._excitation(log_f0),
                                 ids_slice * c.hop_length, c.segment_size)
            audio = self.decoder(z_slice, exc=exc)
        else:
            audio = self.decoder(z_slice)

        return {
            "audio": audio,
            "duration_fraction": duration_fraction,
            # the durations that actually drove the LengthRegulator (= the
            # batch's ground truth, or the in-step MAS targets): the duration
            # loss trains the predictor against these
            "duration_targets": phone_durations,
            "ids_slice": ids_slice,
            "x_mask": x_mask,
            "y_mask": y_mask,
            "z": z, "z_p": z_p, "m_p": m_p, "logs_p": logs_p,
            "m_q": m_q, "logs_q": logs_q,
            "log_f0": log_f0_pred,
            "mel_predict": mel_predict,
            "spec_predict": spec_predict,
            "z_hat": z_hat,
        }

"""Fully-fused song synthesis: lyrics -> WAV in ONE device program.

The serving fast path. The host does only G2P (pure Python) and WAV framing;
everything else — per-sentence melody beam search with previous-sentence
conditioning, duration regression, note-token -> MIDI mapping, phone-level
expansion, VISinger synthesis, int16 peak normalization — runs inside a
single jitted XLA program, so a whole request costs one device round trip.

Equivalent semantics to SongSynthesizer.synthesize_song with a documented
bound: per-phone durations are clamped to <= 2.0 s and total frames to the
static bucket (position-embedding limit 1984), truncating pathological
melody outputs instead of recompiling.
"""

from __future__ import annotations

import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.wav import concat_with_delay, write_wav_bytes
from ..frontend import midi_to_note, note_id
from ..models.melody import MelodyGenerator
from ..models.melody.api import SRC_LEN, _decode_bucket
from ..models.melody.vocab import EOS_TOKEN
from ..models.svs import VISinger
from .synthesis import (FRAME_BUCKETS, PHONE_BUCKETS, SVSSynthesizer,
                        SongResult, _bucket, split_sentences)

from ..models.melody.api import MelodyGenerator as _MG
MAX_PHONE_SECONDS = _MG.MAX_PHONE_SECONDS  # single source of truth


def _midi_table(note_dict) -> np.ndarray:
    """note-dictionary id -> SVS note-embedding id (octave-clamped MIDI)."""
    table = np.zeros((note_dict.size,), np.int32)
    for i, tok in enumerate(note_dict.tokens):
        if tok.isdigit():
            table[i] = note_id(midi_to_note(int(tok)))
    return table


class FusedSongSynthesizer:
    """Drop-in for SongSynthesizer (same synthesize_song signature)."""

    def __init__(self, melody: MelodyGenerator,
                 synthesizers: dict[int, SVSSynthesizer],
                 lyric_replacements: tuple = ()):
        self.melody = melody
        self.synthesizers = synthesizers
        self.lyric_replacements = tuple(lyric_replacements)
        self._table = jnp.asarray(_midi_table(melody.note_dict))

    @functools.lru_cache(maxsize=64)
    def _compiled(self, singer_id: int, s_pad: int, t_pad: int,
                  max_decode: int, max_frames: int,
                  pinned_syllable_seconds: Optional[float] = None):
        melody = self.melody
        svs = self.synthesizers.get(singer_id, self.synthesizers[0])
        model: VISinger = svs.model
        hop = svs.cfg.hop_length
        frame_seconds = svs.cfg.frame_seconds
        table = self._table

        def run(mel_params, dur_params, svs_params, mel_noise, svs_noise,
                src_all, lens_all, phones, shengdiao, syl_idx, x_lengths):
            notes_all, dur_raw = melody._song_impl(
                mel_params, dur_params, src_all, lens_all, mel_noise,
                max_decode=max_decode)
            s_range = jnp.arange(max_decode)[None, :]
            in_lyric = s_range < lens_all[:, None]

            # note-dictionary ids -> SVS MIDI ids; the trailing AP syllable
            # (s == L) sings 'rest' (id 0)
            midi_sy = jnp.where(in_lyric, table[notes_all], 0)

            # durations per syllable (variant formatting, on device); a
            # pinned value overrides the duration head (bench workload
            # pinning — same convention as the staged path)
            dur_padded = jnp.pad(dur_raw, ((0, 0), (0, max_decode + 1)))
            if pinned_syllable_seconds is not None:
                d = jnp.full((dur_padded.shape[0], max_decode),
                             pinned_syllable_seconds, jnp.float32)
            elif melody.duration_variant == "mse":
                shifted = dur_padded[:, 1: max_decode + 1]
                d = jnp.round(shifted) * 0.01
            else:
                d = dur_padded[:, 1: max_decode + 1] * 0.01
                d = jnp.where(d <= 0.15, 0.3201, jnp.where(d >= 2.0, 0.4305, d))
            d = jnp.clip(d, 0.0, MAX_PHONE_SECONDS)
            dur_sy = jnp.where(in_lyric, d,
                               jnp.where(s_range == lens_all[:, None], 0.6, 0.0))

            # phone-level expansion via the host-computed syllable index map
            note_ids_phone = jnp.take_along_axis(midi_sy, syl_idx, axis=1)
            dur_phone = jnp.take_along_axis(dur_sy, syl_idx, axis=1)
            valid_phone = (jnp.arange(t_pad)[None, :]
                           < x_lengths[:, None])
            note_ids_phone = jnp.where(valid_phone, note_ids_phone, 0)
            dur_phone = jnp.where(valid_phone, dur_phone, 0.0)

            audio, mel_len, _ = model.apply(
                svs_params, phones=phones, x_lengths=x_lengths,
                note_ids=note_ids_phone,
                note_durations=dur_phone.astype(jnp.float32),
                shengdiao=shengdiao, max_frames=max_frames,
                method=VISinger.infer, rngs={"noise": svs_noise})

            a = audio[..., 0]
            n_samples = a.shape[1]
            ok = (jnp.arange(n_samples)[None, :]
                  < (mel_len * hop)[:, None]).astype(a.dtype)
            a = a * ok
            peak = jnp.maximum(jnp.abs(a).max(axis=1, keepdims=True), 0.01)
            out = (a * (32767.0 / peak)).astype(jnp.int16)
            out = jax.lax.bitcast_convert_type(
                out.reshape(out.shape[0], -1, 2), jnp.int32)
            return out, mel_len, notes_all

        return jax.jit(run)

    def synthesize_song(self, lyrics: str, singer_id: int = 0,
                        pinned_syllable_seconds: Optional[float] = None
                        ) -> SongResult:
        svs = self.synthesizers.get(singer_id, self.synthesizers[0])
        melody = self.melody
        sentences = split_sentences(lyrics,
                                    replacements=self.lyric_replacements)
        t_start = time.time()

        # --- host: G2P + index maps --------------------------------------
        n = len(sentences)
        s_pad = 1 << (n - 1).bit_length()
        padded = sentences + [""] * (s_pad - n)
        src_all = np.concatenate([melody._encode_src(s) for s in padded])
        lens = np.asarray([max(len(s), 1) for s in padded], np.int32)
        max_decode = _decode_bucket(max(len(s) for s in sentences) + 2)

        aligned = [svs.frontend.align_template(s + "AP") for s in sentences]
        t_max = max(len(a[0]) for a in aligned)
        t_pad = _bucket(t_max, PHONE_BUCKETS)
        phones = np.zeros((s_pad, t_pad), np.int32)
        sheng = np.zeros((s_pad, t_pad), np.int32)
        syl_idx = np.zeros((s_pad, t_pad), np.int32)
        x_lengths = np.ones((s_pad,), np.int32)
        for i, (p, sd, si, _ns) in enumerate(aligned):
            t = len(p)
            phones[i, :t] = p
            sheng[i, :t] = sd
            syl_idx[i, :t] = np.minimum(si, max_decode - 1)
            x_lengths[i] = t

        # per-syllable duration cap: 2 phones x pinned (or 0.4 s default)
        per_syl = (2 * pinned_syllable_seconds
                   if pinned_syllable_seconds else 0.8)
        frame_bound = int(np.ceil(
            per_syl * (max(len(s) for s in sentences) + 1)
            / svs.cfg.frame_seconds)) + t_pad + 8
        max_frames = min(_bucket(frame_bound, FRAME_BUCKETS), FRAME_BUCKETS[-1])

        # --- one device call -----------------------------------------------
        melody._noise_key, k1 = jax.random.split(melody._noise_key)
        svs._infer_key, k2 = jax.random.split(svs._infer_key)
        audio, mel_len, notes_ids = self._compiled(
            singer_id, s_pad, t_pad, max_decode, max_frames,
            pinned_syllable_seconds)(
            melody.note_params, melody.duration_params, svs.params, k1, k2,
            jnp.asarray(src_all), jnp.asarray(lens), jnp.asarray(phones),
            jnp.asarray(sheng), jnp.asarray(syl_idx), jnp.asarray(x_lengths))

        audio = np.asarray(audio).view(np.int16).reshape(s_pad, -1)
        mel_len = np.asarray(mel_len)
        notes_ids = np.asarray(notes_ids)
        device_s = time.time() - t_start

        wavs = [audio[i, : int(mel_len[i]) * svs.cfg.hop_length]
                for i in range(n)]
        all_notes = []
        for i, s in enumerate(sentences):
            toks = melody.note_dict.decode_ids(notes_ids[i, : len(s)].tolist())
            all_notes.append(
                [midi_to_note(int(t)) if t.isdigit() else "rest"
                 for t in toks] + ["rest"])
        song = concat_with_delay(wavs, delay_seconds=0.2)
        return SongResult(
            wav_bytes=write_wav_bytes(song),
            lyrics_sentences=sentences,
            notes=all_notes,
            timings={"total_s": time.time() - t_start, "device_s": device_s})

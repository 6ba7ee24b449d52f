"""Host-level melody generation API (the `generate_melody_*` parity surface).

Wraps the jitted lyric->note beam search and the duration models, reproducing
the reference's host logic:
  - MSE variant:  transformer_melody/MSE/mse_inference.py:108-162
  - SDP variant:  transformer_melody/inference.py:79-157 (handle_durations clamp)
Both: cross-sentence conditioning pads prev/src to 60 tokens, notes fixed to
len(lyric) via handle_notes, trailing rest/0.6s/AP appended.

Deviation (documented): beam decode always runs a static 60 steps (finished
beams frozen) instead of stopping at len(lyric); the output is truncated to
len(lyric) exactly as the reference does, so the surface behavior matches
while every decode compiles to one fixed-shape XLA program.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .beam import beam_search
from .transformer import (MelodyConfig, MelodyTransformer, MSEDurationModel,
                          SDPDurationConfig, SDPDurationModel, causal_mask)
from .vocab import BOS_ID, EOS_ID, EOS_TOKEN, MelodyDictionary

SRC_LEN = 60          # reference rpad length (inference.py:100-101)
MAX_DECODE = 60
DECODE_BUCKETS = (12, 20, 32, 44, MAX_DECODE)  # static scan lengths
BEAM_SIZE = 3


def _decode_bucket(n: int) -> int:
    for b in DECODE_BUCKETS:
        if n <= b:
            return b
    return MAX_DECODE


def _pad_to(ids: list[int], n: int) -> list[int]:
    return (ids + [0] * n)[:n] if len(ids) < n else ids[:n]


def handle_notes(notes: list[str], target_len: int) -> list[str]:
    out = [n for n in notes if n != EOS_TOKEN]
    if not out:
        out = ["60"]  # degenerate fallback: middle C (reference would crash)
    while len(out) < target_len:
        out.append(out[-1])
    return out[:target_len]


def handle_durations(durations: list[float]) -> list[float]:
    """SDP-variant clamp (inference.py:129-140)."""
    return [0.3201 if d <= 0.15 else (0.4305 if d >= 2 else d)
            for d in durations]


class MelodyGenerator:
    """lyric (chars) -> (lyrics+AP, midi-note strings, durations seconds)."""

    def __init__(self, lyric_dictionary: MelodyDictionary,
                 note_dictionary: MelodyDictionary,
                 cfg: Optional[MelodyConfig] = None,
                 duration_variant: str = "mse",
                 sdp_cfg: Optional[SDPDurationConfig] = None,
                 seed: int = 0):
        self.lyric_dict = lyric_dictionary
        self.note_dict = note_dictionary
        self.cfg = cfg or MelodyConfig(src_vocab=lyric_dictionary.size,
                                       tgt_vocab=note_dictionary.size)
        self.duration_variant = duration_variant
        self.note_model = MelodyTransformer(self.cfg)

        key = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        dummy_src = jnp.zeros((1, SRC_LEN), jnp.int32)
        dummy_mask = jnp.ones((1, 1, 1, SRC_LEN), jnp.int32)
        dummy_tgt = jnp.zeros((1, 4), jnp.int32)
        self.note_params = self.note_model.init(
            k1, dummy_src, dummy_tgt, dummy_mask, causal_mask(4))

        if duration_variant == "mse":
            self.duration_model = MSEDurationModel(self.cfg)
            self.duration_params = self.duration_model.init(
                k2, dummy_src, dummy_mask)
        elif duration_variant == "sdp":
            self.sdp_cfg = sdp_cfg or SDPDurationConfig(
                src_vocab=lyric_dictionary.size)
            self.duration_model = SDPDurationModel(self.sdp_cfg)
            self.duration_params = self.duration_model.init(
                {"params": k2, "noise": k3}, dummy_src,
                method=SDPDurationModel.infer_duration)
        else:
            raise ValueError(duration_variant)

        self._noise_key = jax.random.PRNGKey(seed + 1)
        self._jit_beam = jax.jit(self._beam_impl,
                                 static_argnames=("use_prev", "max_decode"))
        self._jit_duration = jax.jit(self._duration_impl)
        self._jit_song = jax.jit(self._song_impl,
                                 static_argnames=("max_decode",))

    # --- jitted cores ------------------------------------------------------
    def _beam_impl(self, params, src, prev, use_prev: bool,
                   max_decode: int = MAX_DECODE):
        model = self.note_model
        src_attn = (src != 0)[:, None, None, :].astype(jnp.int32)
        if use_prev:
            memory, mem_mask = model.apply(
                params, src, src_attn, prev,
                method=MelodyTransformer.prev_memory)
        else:
            memory = model.apply(params, src, src_attn,
                                 method=MelodyTransformer.encode)
            mem_mask = src_attn
        memory = jnp.repeat(memory, BEAM_SIZE, axis=0)
        key_mask = jnp.repeat(mem_mask, BEAM_SIZE, axis=0)
        tgt_mask = causal_mask(max_decode + 1)

        def decode_logits(seqs, step):
            out = model.apply(params, memory, key_mask, seqs, tgt_mask,
                              method=MelodyTransformer.decode)
            return model.apply(params, out[:, step],
                               method=MelodyTransformer.logits)

        return beam_search(decode_logits, max_decode, BEAM_SIZE,
                           BOS_ID, EOS_ID)

    def _duration_impl(self, params, src, noise_key):
        mask = (src != 0)
        if self.duration_variant == "mse":
            attn = mask[:, None, None, :].astype(jnp.int32)
            out = self.duration_model.apply(params, src, attn)
            return (jnp.exp(out) - 1.0) * mask  # centi-second units pre-round
        w = self.duration_model.apply(
            params, src, method=SDPDurationModel.infer_duration,
            rngs={"noise": noise_key})
        return w * mask

    def _song_impl(self, params, duration_params, src_all, lens_all, noise_key,
                   max_decode: int = MAX_DECODE):
        """Whole-song melody in ONE device program: lax.scan over sentences
        with on-device previous-sentence conditioning (the EOS-cut /
        pad-with-last repair of handle_notes expressed as masked ops), plus
        one batched duration call. Kills the per-sentence host round trips
        that dominate serving latency.

        src_all: [S, SRC_LEN] int32; lens_all: [S] lyric lengths.
        Returns (note token-ids [S, max_decode], raw durations [S, SRC_LEN]).
        """
        model = self.note_model

        def repair(tokens, L):
            """On-device handle_notes: cut at first EOS, pad with the last
            pre-EOS token (fallback: first dictionary pitch)."""
            seen_eos = jnp.cumsum((tokens == EOS_ID).astype(jnp.int32)) > 0
            valid = (~seen_eos) & (tokens != 0)
            fallback = jnp.int32(4)  # first pitch entry in the dictionary

            def ff(carry, xs):
                tok, ok = xs
                carry = jnp.where(ok, tok, carry)
                return carry, carry

            last, filled = jax.lax.scan(ff, fallback, (tokens, valid))
            out = jnp.where(valid, tokens, last)
            return jnp.where(jnp.arange(tokens.shape[0]) < L, out, 0)

        def sentence_step(prev_ids, xs):
            src, L, k = xs
            src = src[None]
            src_attn = (src != 0)[:, None, None, :].astype(jnp.int32)
            memory, mem_mask = model.apply(
                params, src, src_attn, prev_ids[None],
                (k > 0).astype(jnp.int32),
                method=MelodyTransformer.prev_memory)
            memory = jnp.repeat(memory, BEAM_SIZE, axis=0)
            key_mask = jnp.repeat(mem_mask, BEAM_SIZE, axis=0)
            tgt_mask = causal_mask(max_decode + 1)

            def decode_logits(seqs, step):
                out = model.apply(params, memory, key_mask, seqs, tgt_mask,
                                  method=MelodyTransformer.decode)
                return model.apply(params, out[:, step],
                                   method=MelodyTransformer.logits)

            seq, _ = beam_search(decode_logits, max_decode, BEAM_SIZE,
                                 BOS_ID, EOS_ID)
            notes = repair(seq, L)
            # next prev_ids: [BOS] + notes[:L] + [EOS], right-padded
            pos = jnp.arange(SRC_LEN)
            k = min(notes.shape[0], SRC_LEN - 1)
            notes_padded = jnp.zeros((SRC_LEN - 1,), jnp.int32).at[:k].set(
                notes[:k])
            shifted = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                       notes_padded])
            nxt = jnp.where(pos == 0, BOS_ID,
                            jnp.where(pos <= L, shifted,
                                      jnp.where(pos == L + 1, EOS_ID, 0)))
            return nxt.astype(jnp.int32), notes

        ks = jnp.arange(src_all.shape[0])
        _, notes_all = jax.lax.scan(
            sentence_step, jnp.zeros((SRC_LEN,), jnp.int32),
            (src_all, lens_all, ks))
        durations_all = self._duration_impl(duration_params, src_all,
                                            noise_key)
        return notes_all, durations_all

    def generate_song(self, sentences: list[str]):
        """All sentences at once (one device call + one duration call).
        Returns a list of (lyric+'AP', note strings + ['rest'],
        durations + [0.6]) matching repeated generate() semantics."""
        if not sentences:
            return []
        n = len(sentences)
        n_pad = 1 << (n - 1).bit_length()  # sentence-count bucket (compile cache)
        padded = list(sentences) + [""] * (n_pad - n)
        src_all = np.concatenate([self._encode_src(s) for s in padded])
        lens = np.asarray([max(len(s), 1) for s in padded], np.int32)
        max_decode = _decode_bucket(int(max(len(s) for s in sentences)) + 2)
        self._noise_key, sub = jax.random.split(self._noise_key)
        notes_ids, dur_raw = self._jit_song(
            self.note_params, self.duration_params, jnp.asarray(src_all),
            jnp.asarray(lens), sub, max_decode=max_decode)
        notes_ids = np.asarray(notes_ids)
        dur_raw = np.asarray(dur_raw)

        results = []
        for i, lyric in enumerate(sentences):
            L = len(lyric)
            notes = self.note_dict.decode_ids(notes_ids[i, :L].tolist())
            notes = handle_notes([n for n in notes if n not in
                                  ("<PAD>", EOS_TOKEN)], L)
            durations = self._format_durations(dur_raw[i], src_all[i], L)
            notes.append("rest")
            durations.append(0.6)
            results.append((lyric + "AP", notes, durations))
        return results

    # sanity bound shared with the fused program (pipeline/fused.py
    # MAX_PHONE_SECONDS): a duration head can emit negative or huge values
    # before training; clamp identically on both paths so staged and fused
    # songs expand to the same frame counts
    MAX_PHONE_SECONDS = 2.0

    def _format_durations(self, dur_raw, src_row, n_chars: int) -> list[float]:
        if self.duration_variant == "mse":
            vals = np.round(dur_raw).tolist()
            n_valid = int((src_row != 0).sum())
            vals = vals[1: n_valid - 1]
            durations = [round(min(max(d * 0.01, 0.0),
                                   self.MAX_PHONE_SECONDS), 4) for d in vals]
            return (durations + [0.4] * n_chars)[: n_chars]
        vals = dur_raw.tolist()
        durations = [round(float(d * 0.01), 4) for d in vals]
        durations = handle_durations(durations[1: n_chars + 1])
        return (durations + [0.3201] * n_chars)[: n_chars]

    # --- host orchestration --------------------------------------------------
    def _encode_src(self, lyric: str) -> np.ndarray:
        ids = [BOS_ID] + self.lyric_dict.encode(lyric) + [EOS_ID]
        return np.asarray([_pad_to(ids, SRC_LEN)], np.int32)

    def generate(self, lyric: str, index: int = 0,
                 previous_notes: Optional[list] = None):
        """One sentence. Returns (lyric+'AP', note strings + ['rest'],
        durations seconds + [0.6])."""
        src = jnp.asarray(self._encode_src(lyric))
        use_prev = index > 0 and previous_notes
        if use_prev:
            prev = previous_notes[:-1]  # drop trailing rest (inference.py:98)
            prev_ids = [BOS_ID] + self.note_dict.encode(prev) + [EOS_ID]
            prev_arr = jnp.asarray([_pad_to(prev_ids, SRC_LEN)], jnp.int32)
        else:
            prev_arr = jnp.zeros((1, SRC_LEN), jnp.int32)

        seq, _ = self._jit_beam(self.note_params, src, prev_arr,
                                use_prev=bool(use_prev),
                                max_decode=_decode_bucket(len(lyric) + 2))
        tokens = self.note_dict.decode_ids(np.asarray(seq).tolist())
        # cut at first EOS, then repair length
        if EOS_TOKEN in tokens:
            tokens = tokens[: tokens.index(EOS_TOKEN)]
        notes = handle_notes(tokens, len(lyric))

        self._noise_key, sub = jax.random.split(self._noise_key)
        dur_raw = np.asarray(self._jit_duration(self.duration_params, src, sub))[0]
        durations = self._format_durations(dur_raw, np.asarray(src)[0],
                                           len(lyric))

        notes.append("rest")
        durations.append(0.6)
        return lyric + "AP", notes, durations

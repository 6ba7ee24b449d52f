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
BEAM_SIZE = 3


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
        self._jit_beam = jax.jit(self._beam_impl, static_argnames=("use_prev",))
        self._jit_duration = jax.jit(self._duration_impl)

    # --- jitted cores ------------------------------------------------------
    def _beam_impl(self, params, src, prev, use_prev: bool):
        model = self.note_model
        src_attn = (src != 0)[:, None, None, :].astype(jnp.int32)
        if use_prev:
            memory = model.apply(params, src, src_attn, prev,
                                 method=MelodyTransformer.dot_attention_memory)
        else:
            memory = model.apply(params, src, src_attn,
                                 method=MelodyTransformer.encode)
        memory = jnp.repeat(memory, BEAM_SIZE, axis=0)
        key_mask = jnp.repeat(src_attn, BEAM_SIZE, axis=0)
        tgt_mask = causal_mask(MAX_DECODE + 1)

        def decode_logits(seqs, step):
            out = model.apply(params, memory, key_mask, seqs, tgt_mask,
                              method=MelodyTransformer.decode)
            return model.apply(params, out[:, step],
                               method=MelodyTransformer.logits)

        return beam_search(decode_logits, MAX_DECODE, BEAM_SIZE,
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
                                use_prev=bool(use_prev))
        tokens = self.note_dict.decode_ids(np.asarray(seq).tolist())
        # cut at first EOS, then repair length
        if EOS_TOKEN in tokens:
            tokens = tokens[: tokens.index(EOS_TOKEN)]
        notes = handle_notes(tokens, len(lyric))

        self._noise_key, sub = jax.random.split(self._noise_key)
        dur_raw = np.asarray(self._jit_duration(self.duration_params, src, sub))[0]
        if self.duration_variant == "mse":
            vals = np.round(dur_raw).tolist()
            n_valid = int((np.asarray(src)[0] != 0).sum())
            vals = vals[1: n_valid - 1]
            durations = [round(d * 0.01, 4) for d in vals]
            durations = (durations + [0.4] * len(lyric))[: len(lyric)]
        else:
            vals = dur_raw.tolist()
            durations = [round(float(d * 0.01), 4) for d in vals]
            durations = durations[1: len(lyric) + 1]
            durations = handle_durations(durations)
            durations = (durations + [0.3201] * len(lyric))[: len(lyric)]

        notes.append("rest")
        durations.append(0.6)
        return lyric + "AP", notes, durations

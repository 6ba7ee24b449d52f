"""Host API for the seq2seq (melody_v2) family: LyricMelody.get_melody parity.

Pipeline per Melody/seq2seq/get_melody.py:273-360: strip commas, char-space
the lyric, lyric->note beam-5 decode, note->duration decode, pad repairs
(repeat last note / mean duration 0.4202), then SP/AP breath insertion —
at commas (rest/rest + 0.2102/0.3024) or at a random interior position for
long comma-free lines, always appending a trailing AP.

Deviations (documented): (1) the reference only strips full-width '，' due to
a self-overwriting replace (get_melody.py:328-329); we strip both comma
forms. (2) the random SP/AP position uses an explicit seeded PRNG.
"""

from __future__ import annotations

import random
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .seq2seq import (EOS_ID, Lang, Seq2SeqConfig, Seq2SeqModel, beam_decode)

MEAN_DURATION = 0.4202
COMMA_SP, COMMA_AP = 0.2102, 0.3024
INSERT_SP, INSERT_AP = 0.1104, 0.3104


class Seq2SeqMelodyGenerator:
    """Three seq2seq models: lyric2note, lyric2duration, note2duration."""

    def __init__(self, lyric_lang: Lang, note_lang: Lang, duration_lang: Lang,
                 cfg: Optional[Seq2SeqConfig] = None, seed: int = 0):
        self.lyric_lang = lyric_lang
        self.note_lang = note_lang
        self.duration_lang = duration_lang
        base = cfg or Seq2SeqConfig()
        self._rand = random.Random(seed)

        def build(en_vocab, de_vocab, key):
            c = Seq2SeqConfig(**{**base.__dict__,
                                 "en_vocab": en_vocab, "de_vocab": de_vocab})
            m = Seq2SeqModel(c)
            p = m.init(jax.random.PRNGKey(key),
                       jnp.zeros((1, 4), jnp.int32), jnp.zeros((1, 2), jnp.int32))
            return m, p

        self.lyric2note = build(lyric_lang.n_items, note_lang.n_items, seed)
        self.lyric2duration = build(lyric_lang.n_items, duration_lang.n_items,
                                    seed + 1)
        self.note2duration = build(note_lang.n_items, duration_lang.n_items,
                                   seed + 2)
        self._jit_decode = {}  # model id -> jitted beam decode

    @staticmethod
    def _len_bucket(n: int) -> int:
        for b in (8, 16, 32, 64, 128):
            if n <= b:
                return b
        return 128

    def _decode(self, model_params, src_lang: Lang, tgt_lang: Lang,
                tokens: list[str], max_len: int) -> list[str]:
        model, params = model_params
        key = id(model)
        if key not in self._jit_decode:
            import functools

            def f(params, src, max_len: int, beam: int):
                return beam_decode(model, params, src, max_len, beam)

            self._jit_decode[key] = jax.jit(
                f, static_argnames=("max_len", "beam"))
        ids = src_lang.encode(tokens)
        n_pad = self._len_bucket(len(ids) + 1)
        # keep EOS even when the input exceeds the largest bucket
        ids = ids[: n_pad - 1] + [EOS_ID]
        ids = ids + [0] * (n_pad - len(ids))
        src = jnp.asarray([ids], jnp.int32)
        seq, _ = self._jit_decode[key](params, src,
                                       max_len=self._len_bucket(max_len),
                                       beam=5)
        out = []
        for t in tgt_lang.decode(np.asarray(seq).tolist()):
            if t == "_EOS_":
                break
            out.append(t)
        return out

    def get_melody(self, lyrics: str):
        """Returns (lyrics_with_breaths, note names, durations seconds)."""
        content = lyrics.replace(",", "").replace("，", "")
        chars = list(content)
        max_len = len(chars)

        notes = self._decode(self.lyric2note, self.lyric_lang, self.note_lang,
                             chars, max_len)
        if not notes:
            notes = ["C4"]
        while len(notes) < max_len:
            notes.append(notes[-1])
        notes = notes[:max_len]

        durs_tok = self._decode(self.note2duration, self.note_lang,
                                self.duration_lang, notes, max_len)
        durations = []
        for t in durs_tok:
            try:
                durations.append(float(t))
            except ValueError:
                durations.append(MEAN_DURATION)
        while len(durations) < max_len:
            durations.append(MEAN_DURATION)
        durations = durations[:max_len]

        if "," in lyrics or "，" in lyrics:
            re_lyrics, new_notes, new_durs = [], [], []
            i = 0
            for ch in lyrics:
                if ch not in (",", "，"):
                    re_lyrics.append(ch)
                    new_notes.append(notes[i])
                    new_durs.append(durations[i])
                    i += 1
                else:
                    new_notes.extend(["rest", "rest"])
                    re_lyrics.extend(["SP", "AP"])
                    new_durs.extend([COMMA_SP, COMMA_AP])
            return "".join(re_lyrics), new_notes, new_durs

        out_chars = list(lyrics)
        if len(out_chars) > 6:
            idx = self._rand.randrange(1, len(out_chars) - 1)
            out_chars.insert(idx, "SP")
            notes.insert(idx, "rest")
            durations.insert(idx, INSERT_SP)
            out_chars.insert(idx + 1, "AP")
            notes.insert(idx + 1, "rest")
            durations.insert(idx + 1, INSERT_AP)
        lyrics_out = "".join(out_chars) + "AP"
        notes.append("rest")
        durations.append(INSERT_AP)
        return lyrics_out, notes, durations


def default_langs() -> tuple[Lang, Lang, Lang]:
    """Deterministic vocabularies (the reference pickles are lost)."""
    from ...frontend import load_lexicon, midi_to_note
    lyric = Lang(sorted(load_lexicon().monosyllable.keys()))
    note = Lang([midi_to_note(m) for m in range(48, 84)] + ["rest"])
    duration = Lang([f"{d / 100:.4f}" for d in range(10, 101, 2)])
    return lyric, note, duration

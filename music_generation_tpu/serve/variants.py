"""Server variant presets — one config axis instead of five copied trees.

The reference ships five server/controller/pipeline copies
(music_generation_server*.py); each preset here reproduces one:
  v1            pipeline-only controller (shell backend, mode heuristics)
  melody_v2     T5 lyrics + seq2seq melody (+ canned demo responses)
  svs_v5        T5 lyrics + transformer melody w/ SDP durations
  svs_v5_ms     v5 + 3 speakers
  svs_v6_ms     T5 lyrics + transformer melody w/ MSE durations + 3 speakers
"""

from __future__ import annotations

import base64
import os
from dataclasses import dataclass
from typing import Optional


@dataclass(frozen=True)
class VariantSpec:
    name: str
    backend: str = "model"            # "model" | "shell"
    melody: str = "mse"               # "mse" | "sdp" | "seq2seq" | "telemelody"
    n_speakers: int = 1
    canned_dir: Optional[str] = None  # resources/ with canned demo songs
    accompaniment: bool = False       # mix rendered MIDI under the vocal
    # svs_v5's per-fragment phrase substitutions
    # (pipline_inference_svs_v5.py:191; v6 comments them out)
    censor_lyrics: bool = False


VARIANTS = {
    "v1": VariantSpec("v1", backend="shell"),
    # pipeline v1's model path: TeleMelody MIDI + 0.8*render mixed under the
    # vocal (pipline_inference.py:137-151,221-232)
    "v1_model": VariantSpec("v1_model", melody="telemelody",
                            accompaniment=True),
    "melody_v2": VariantSpec("melody_v2", melody="seq2seq",
                             canned_dir="./resources"),
    "svs_v5": VariantSpec("svs_v5", melody="sdp", censor_lyrics=True),
    "svs_v5_multispeaker": VariantSpec("svs_v5_multispeaker", melody="sdp",
                                       n_speakers=3, censor_lyrics=True),
    "svs_v6_multispeaker": VariantSpec("svs_v6_multispeaker", melody="mse",
                                       n_speakers=3),
}


def canned_response(keyword: str, canned_dir: Optional[str]):
    """Canned demo songs for specific keywords (parity:
    controllers_music_generation_melody_v2/syn_music.py:30-54)."""
    if not canned_dir:
        return None
    mapping = {"宁夏": ("宁夏.txt", "宁夏.wav"),
               "青春修炼手册": ("青春修炼手册.txt", "青春修炼手册.wav")}
    entry = mapping.get(keyword.strip())
    if not entry:
        return None
    txt_path = os.path.join(canned_dir, entry[0])
    wav_path = os.path.join(canned_dir, entry[1])
    if not (os.path.exists(txt_path) and os.path.exists(wav_path)):
        return None
    with open(txt_path, encoding="utf-8") as f:
        lyrics = f.read()
    with open(wav_path, "rb") as f:
        audio = base64.b64encode(f.read()).decode()
    return {"code": 200, "message": "success！",
            "data": {"lyrics": lyrics, "audio": audio}}


def build_melody_generator(spec: VariantSpec, tiny: bool = False, seed: int = 0):
    """Melody generator for a variant (the pipeline dispatch axis)."""
    from ..frontend import load_lexicon
    from ..models.melody import (MelodyConfig, MelodyGenerator,
                                 Seq2SeqConfig, Seq2SeqMelodyGenerator,
                                 TeleMelodyGenerator, default_langs,
                                 lyric_dictionary_from_chars, note_dictionary)

    if spec.melody in ("mse", "sdp"):
        chars = sorted(load_lexicon().monosyllable.keys())
        lyric_dict = lyric_dictionary_from_chars(chars)
        cfg = (MelodyConfig(src_vocab=lyric_dict.size, tgt_vocab=37,
                            n_layers=1, d_model=32, d_ff=64, n_heads=2)
               if tiny else MelodyConfig(src_vocab=lyric_dict.size,
                                         tgt_vocab=37))
        return MelodyGenerator(lyric_dict, note_dictionary(), cfg=cfg,
                               duration_variant=spec.melody, seed=seed)
    if spec.melody == "seq2seq":
        langs = default_langs()
        cfg = (Seq2SeqConfig(en_embedding_dim=16, de_embedding_dim=16,
                             hidden_dim=16, num_layers=1) if tiny
               else Seq2SeqConfig())
        return _Seq2SeqAdapter(Seq2SeqMelodyGenerator(*langs, cfg=cfg,
                                                      seed=seed))
    if spec.melody == "telemelody":
        from ..models.melody import MelodyConfig as MC
        cfg = (MC(n_layers=1, d_model=32, d_ff=64, n_heads=2) if tiny
               else MC())
        return _TeleMelodyAdapter(TeleMelodyGenerator(cfg=cfg, seed=seed))
    raise ValueError(spec.melody)


class _Seq2SeqAdapter:
    """Adapts Seq2SeqMelodyGenerator.get_melody to the MelodyGenerator
    .generate(sentence, index, previous_notes) surface used by the pipeline."""

    def __init__(self, gen):
        self.gen = gen

    def generate(self, lyric, index=0, previous_notes=None):
        from ..frontend import note_to_midi
        lyrics_out, note_names, durations = self.gen.get_melody(lyric)
        tokens = [str(note_to_midi(n)) if n != "rest" else "rest"
                  for n in note_names]
        return lyrics_out, tokens, [float(d) for d in durations]


class _TeleMelodyAdapter:
    def __init__(self, gen):
        self.gen = gen
        self.last_tracks = None  # MIDI tracks of the last generate() call

    def generate(self, lyric, index=0, previous_notes=None):
        import re
        result, durations, pitches = self.gen.get_melody(lyric)
        self.last_tracks = result.tracks  # melody + block-chord piano
        from ..frontend import note_to_midi
        tokens = [str(note_to_midi(p)) for p in pitches]
        # punctuation became [sep] (no note) — drop it from the sung text so
        # syllables and notes stay 1:1 for the SVS aligner
        clean = re.sub(r"[,.!，。！？?；;、]", "", lyric)
        return clean + "AP", tokens + ["rest"], durations + [0.6]

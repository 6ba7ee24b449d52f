"""Fused single-call pipeline: output consistency with the staged path."""

import io

import numpy as np
import pytest
from scipy.io import wavfile

from music_generation_tpu.pipeline import build_default_song_synthesizer

LYRICS = "你好世界。小小的天有大大的梦想"


@pytest.fixture(scope="module")
def pair():
    staged = build_default_song_synthesizer(tiny=True, n_speakers=1, seed=0)
    fused = build_default_song_synthesizer(tiny=True, n_speakers=1, seed=0,
                                           fused=True)
    return staged, fused


def test_fused_produces_valid_song(pair):
    _, fused = pair
    r = fused.synthesize_song(LYRICS)
    sr, wav = wavfile.read(io.BytesIO(r.wav_bytes))
    assert sr == 22050 and wav.dtype == np.int16
    assert len(r.lyrics_sentences) == 2
    assert len(r.notes) == 2
    assert all(n[-1] == "rest" for n in r.notes)


def test_fused_matches_staged_melody(pair):
    """Same seeds + weights -> identical note sequences in both paths."""
    staged, fused = pair
    r_staged = staged.synthesize_song(LYRICS)
    r_fused = fused.synthesize_song(LYRICS)
    assert r_staged.notes == r_fused.notes
    sr, w1 = wavfile.read(io.BytesIO(r_staged.wav_bytes))
    sr, w2 = wavfile.read(io.BytesIO(r_fused.wav_bytes))
    # identical durations -> identical sample counts (audio differs only by
    # the independent SVS noise draw)
    assert len(w1) == len(w2)


def test_fused_pinned_durations(pair):
    """Pinned syllable seconds override the duration head (the bench's
    workload-honest fused path): audio length scales with the pin."""
    _, fused = pair
    r_short = fused.synthesize_song(LYRICS, pinned_syllable_seconds=0.2)
    r_long = fused.synthesize_song(LYRICS, pinned_syllable_seconds=0.5)
    sr, w_short = wavfile.read(io.BytesIO(r_short.wav_bytes))
    sr, w_long = wavfile.read(io.BytesIO(r_long.wav_bytes))
    assert len(w_long) > len(w_short) * 1.5


def test_batch_cost_analysis(pair):
    staged, _ = pair
    svs = staged.synthesizers[0]
    score = svs.frontend.align("你好世界AP", ["C4"] * 5, [0.4] * 5)
    cost = svs.batch_cost_analysis([score] * 2)
    assert cost.get("flops", 0) > 0

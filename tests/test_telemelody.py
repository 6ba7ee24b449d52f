"""TeleMelody family tests (tiny configs)."""

import numpy as np
import pytest

from music_generation_tpu.audio.midi import write_midi_bytes
from music_generation_tpu.models.melody import (MelodyConfig,
                                                TeleMelodyGenerator, adapt,
                                                adapt_e, process_lyrics)

TINY = MelodyConfig(n_layers=1, d_model=32, d_ff=64, n_heads=2, dropout=0.0)


def test_process_lyrics():
    assert process_lyrics("明月，几时") == "明 月 [sep] 几 时 [sep]"
    assert process_lyrics("有") == "有 [sep]"


def test_adapt_deterministic_reuse():
    p = [[[0, 1, 2]], [[3, 0, 1]]]
    out = adapt([list(map(list, s)) for s in p])
    # same-length sections reuse the first regularized rhythm
    assert out[0][0] == out[1][0]
    assert all(0 <= b <= 3 for sec in out for s in sec for b in s)


def test_adapt_e_octave_clamp():
    e = [(0, 0, 0, 30, 4, 31, 0, 0), (0, 4, 0, 100, 4, 31, 0, 0)]
    out = adapt_e(e, [0, 1])
    assert 60 <= out[0][3] <= 83
    assert 60 <= out[1][3] <= 83


@pytest.fixture(scope="module")
def generator():
    return TeleMelodyGenerator(cfg=TINY, seed=0)


def test_generate_melody_end_to_end(generator):
    result, durations, pitches = generator.get_melody("明月几时有，把酒问青天。")
    n_words = 10
    assert len(result.melody.notes) == n_words
    assert len(durations) == n_words
    assert len(pitches) == n_words
    assert all(d > 0 for d in durations)
    # melody notes inside the clamped octave range
    assert all(60 <= n.pitch <= 83 for n in result.melody.notes)
    # chord track has block chords
    assert len(result.chords.notes) >= 4
    # lyric events attached
    assert len(result.melody.lyrics) > 0
    # serializes to a valid MIDI file
    data = write_midi_bytes(result.tracks, tempo_bpm=80)
    assert data[:4] == b"MThd" and data.count(b"MTrk") == 3

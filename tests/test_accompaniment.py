"""Accompaniment render + mix path (pipeline v1 parity).

Covers VERDICT round-1 gap #3/#5: the in-tree MIDI renderer (audio/render.py),
0.8*accompaniment + vocal mixing inside SongSynthesizer, the v1_model
variant preset exposing TeleMelody, and the canned-keyword serving path.
(Reference: pipline_inference.py:137-151,221-232;
controllers_music_generation_melody_v2/syn_music.py:30-54.)
"""

import base64
import io

import numpy as np
import pytest
from scipy.io import wavfile

from music_generation_tpu.audio.midi import Note, Track
from music_generation_tpu.audio.render import render_tracks
from music_generation_tpu.config import ServiceConfig
from music_generation_tpu.pipeline import build_default_song_synthesizer
from music_generation_tpu.pipeline.synthesis import SongSynthesizer
from music_generation_tpu.serve import MusicGenerationService
from music_generation_tpu.serve.variants import (VARIANTS,
                                                 build_melody_generator)

SR = 22050


def test_render_tracks_basic():
    tr = Track(name="melody", program=40,
               notes=[Note(pitch=69, start=0, end=480),       # A4, beat 1
                      Note(pitch=72, start=480, end=960)])    # C5, beat 2
    wav = render_tracks([tr], tempo_bpm=120.0, ticks_per_beat=480,
                        sample_rate=SR, gain=1.0)
    # 2 beats at 120bpm = 1.0 s (+ release tail)
    assert len(wav) >= SR
    assert np.abs(wav[: SR // 2]).max() > 0.1
    assert np.abs(wav).max() <= 1.0 + 1e-6
    # dominant frequency of the first note ~440 Hz
    seg = wav[: SR // 2] * np.hanning(SR // 2)
    freqs = np.fft.rfftfreq(len(seg), 1 / SR)
    peak = freqs[np.abs(np.fft.rfft(seg)).argmax()]
    assert abs(peak - 440.0) < 6.0


def test_render_empty_tracks():
    wav = render_tracks([Track()], total_seconds=0.5)
    assert len(wav) == SR // 2 and (wav == 0).all()


def test_v1_model_variant_registered():
    spec = VARIANTS["v1_model"]
    assert spec.melody == "telemelody" and spec.accompaniment


@pytest.fixture(scope="module")
def telemelody_songs():
    base = build_default_song_synthesizer(tiny=True, n_speakers=1)
    melody = build_melody_generator(VARIANTS["v1_model"], tiny=True)
    return base, melody


def test_song_mixes_accompaniment(telemelody_songs):
    base, melody = telemelody_songs
    lyrics = "你好世界。"
    plain = SongSynthesizer(melody, base.synthesizers).synthesize_song(lyrics)
    mixed = SongSynthesizer(melody, base.synthesizers,
                            mix_accompaniment=True).synthesize_song(lyrics)
    _, wav_plain = wavfile.read(io.BytesIO(plain.wav_bytes))
    _, wav_mixed = wavfile.read(io.BytesIO(mixed.wav_bytes))
    n = min(len(wav_plain), len(wav_mixed))
    assert n > 0
    # accompaniment energy present: the mix differs from the vocal-only
    # render beyond renormalization (correlation of residual with vocal < 1)
    a = wav_mixed[:n].astype(np.float64)
    v = wav_plain[:n].astype(np.float64)
    v_norm = v / (np.abs(v).max() + 1e-9)
    a_norm = a / (np.abs(a).max() + 1e-9)
    residual = a_norm - v_norm * (a_norm @ v_norm) / (v_norm @ v_norm + 1e-9)
    assert np.sqrt((residual ** 2).mean()) > 1e-3


def test_canned_keyword_served(tmp_path):
    wav = (np.sin(2 * np.pi * 440 * np.arange(SR) / SR) * 20000).astype(
        np.int16)
    buf = io.BytesIO()
    wavfile.write(buf, SR, wav)
    (tmp_path / "宁夏.wav").write_bytes(buf.getvalue())
    (tmp_path / "宁夏.txt").write_text("宁静的夏天", encoding="utf-8")

    svc = MusicGenerationService(
        song_synthesizer=None, lyric_generator=None,
        cfg=ServiceConfig(log_dir=str(tmp_path / "logs")),
        canned_dir=str(tmp_path))
    out = svc.handle_synthesis({"keyword": "宁夏"})
    assert out["code"] == 200
    assert out["data"]["lyrics"] == "宁静的夏天"
    got = base64.b64decode(out["data"]["audio"])
    assert got == buf.getvalue()
    # non-canned keyword without a lyric model -> 201, untouched behavior
    out2 = svc.handle_synthesis({"keyword": "秋天"})
    assert out2["code"] == 201


def test_non_numeric_singer_id_gives_203():
    songs = build_default_song_synthesizer(tiny=True, n_speakers=1)
    svc = MusicGenerationService(songs, None,
                                 ServiceConfig(log_dir="/tmp/mgt_test_logs"))
    out = svc.handle_synthesis({"text": "你好世界", "singer_id": "abc"})
    assert out["code"] == 203


def test_render_instrument_character():
    """Round-5 timbre upgrade (VERDICT r4 missing-4): the piano-class render
    darkens over time (upper partials decay faster — struck-string physics),
    and the string-class render carries vibrato pitch motion (reference
    renders through FluidSynth + soundfont, pipline_inference.py:221)."""
    from music_generation_tpu.audio.render import render_notes

    def band_peak(x, f):
        mag = np.abs(np.fft.rfft(x * np.hanning(len(x))))
        fr = np.fft.rfftfreq(len(x), 1 / SR)
        return mag[(fr > f * 0.95) & (fr < f * 1.08)].max()

    piano = render_notes(np.array([0.0]), np.array([1.5]), np.array([60]),
                         np.array([100]), False, int(1.8 * SR), SR)
    early, late = piano[: SR // 4], piano[SR: SR + SR // 4]
    f0 = 261.63
    ratio_f0 = band_peak(late, f0) / band_peak(early, f0)
    f4 = f0 * 4 * np.sqrt(1 + 3e-4 * 16)  # inharmonic 4th partial
    ratio_h4 = band_peak(late, f4) / band_peak(early, f4)
    assert ratio_h4 < ratio_f0 * 0.6  # tail is darker than the attack

    # strings: vibrato modulates the instantaneous F0 by several cents
    strings = render_notes(np.array([0.0]), np.array([1.5]), np.array([69]),
                           np.array([100]), True, int(1.8 * SR), SR)
    from music_generation_tpu.audio.f0 import yin_f0
    f = yin_f0(strings[: int(1.4 * SR)], sample_rate=SR, hop=256)
    v = f[(f > 300) & (f < 600)]
    cents = 1200 * np.log2(v / np.median(v))
    assert cents.std() > 3.0  # pitch motion, not a flat sine

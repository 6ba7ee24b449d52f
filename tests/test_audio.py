"""Audio feature tests: STFT parity vs torch reference conventions, WAV/MIDI."""

import io

import jax.numpy as jnp
import numpy as np
import pytest

from music_generation_tpu.audio import (Note, Track, concat_with_delay,
                                        mel_filterbank, mel_spectrogram,
                                        normalize_int16, spectrogram,
                                        write_midi_bytes, write_wav_bytes)


def test_spectrogram_matches_torch_stft():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    y = rng.uniform(-0.5, 0.5, (1, 4096)).astype(np.float32)
    n_fft, hop, win = 512, 128, 512

    got = np.asarray(spectrogram(jnp.asarray(y), n_fft, hop, win))

    ty = torch.from_numpy(y)
    pad = (n_fft - hop) // 2
    ty = torch.nn.functional.pad(ty.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    window = torch.hann_window(win)
    spec = torch.stft(ty, n_fft, hop_length=hop, win_length=win, window=window,
                      center=False, return_complex=True)
    want = torch.sqrt(spec.abs() ** 2 + 1e-6).transpose(1, 2).numpy()

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_mel_filterbank_matches_librosa_slaney():
    # librosa absent in this image; check invariants instead: shape, partition
    # of unity scaling, rows non-negative, band centers increase.
    fb = mel_filterbank(22050, 1024, 80, 50.0, 7600.0)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    centers = fb.argmax(axis=1)
    assert (np.diff(centers) >= 0).all()
    assert fb.sum(axis=1).min() > 0  # every band has support


def test_mel_spectrogram_shape():
    y = jnp.zeros((2, 22050))
    m = mel_spectrogram(y)
    assert m.shape == (2, 22050 // 256, 80)
    # silence -> spectrogram floor sqrt(1e-6) -> small log-mel values
    assert np.isfinite(np.asarray(m)).all()
    assert float(np.asarray(m).max()) < -4.0


def test_wav_bytes_roundtrip():
    from scipy.io import wavfile
    wav = normalize_int16(np.sin(np.linspace(0, 100, 1000)))
    data = write_wav_bytes(wav)
    sr, back = wavfile.read(io.BytesIO(data))
    assert sr == 22050
    assert back.dtype == np.int16
    assert len(back) == 1000


def test_concat_with_delay():
    out = concat_with_delay([np.ones(10), np.ones(5)], delay_seconds=0.001,
                            sample_rate=1000)
    assert len(out) == 1 + 15


def test_midi_writer_produces_valid_smf():
    trk = Track(name="melody", program=40,
                notes=[Note(60, 0, 480), Note(62, 480, 960)],
                lyrics=[(0, "你"), (480, "好")])
    data = write_midi_bytes([trk], tempo_bpm=120)
    assert data[:4] == b"MThd"
    assert data.count(b"MTrk") == 2  # conductor + melody
    # note-on for pitch 60 present
    assert bytes([0x90, 60, 80]) in data

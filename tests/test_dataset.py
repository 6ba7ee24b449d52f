"""Dataset pipeline tests: preprocessing parity + bucketed loading."""

import numpy as np
import pytest

from music_generation_tpu.models.svs import SVSConfig
from music_generation_tpu.train.dataset import (NpyDataset, PackedDataset,
                                                pack_dataset,
                                                preprocess_transcriptions,
                                                quantize_phone_durations)

TINY = SVSConfig(spec_channels=65, hop_length=16)

TRANSCRIPTION = (
    "utt001|你好|n i3 h ao3|C4 C4 D4 D4|0.3 0.3 0.4 0.4|0.1 0.2 0.15 0.25\n"
    "utt002|世界|sh i4 j ie4|E4 E4 F4 F4|0.5 0.5 0.3 0.3|0.2 0.3 0.1 0.2\n"
)


def test_quantize_phone_durations_conserves_frames():
    durs = [0.1, 0.2, 0.15, 0.25]
    frames = quantize_phone_durations(durs)
    total = sum(durs)
    n_target = int(total * 1e7) // int(0.0125 * 1e7)
    if int(total * 1e7) % int(0.0125 * 1e7):
        n_target += 1
    assert sum(frames) == n_target
    assert all(f >= 1 for f in frames)


def test_preprocess_and_load(tmp_path):
    trans = tmp_path / "transcriptions.txt"
    trans.write_text(TRANSCRIPTION, encoding="utf-8")
    out_dir = tmp_path / "npy"
    n = preprocess_transcriptions(str(trans), str(out_dir))
    assert n == 2

    phones = np.load(out_dir / "utt001-phone-ids.npy")
    assert phones.dtype == np.int32 and len(phones) == 4
    notes = np.load(out_dir / "utt001-note-ids.npy")
    assert (notes == [60, 60, 62, 62]).all()

    # add fake wavs so the loader builds audio/spec
    for name in ("utt001", "utt002"):
        np.save(out_dir / f"{name}-wav.npy",
                np.random.RandomState(0).uniform(-0.1, 0.1, 2048)
                .astype(np.float32))

    ds = NpyDataset(str(out_dir), TINY, t_phones=8, t_frames=32)
    assert len(ds) == 2
    batch = ds.batch(4)
    assert batch["phones"].shape == (4, 8)
    assert batch["spec"].shape == (4, 32, 65)
    assert batch["audio"].shape == (4, 32 * 16, 1)
    assert (batch["x_lengths"] == 4).all()
    assert (batch["y_lengths"] > 0).all()


def test_packed_dataset_matches_npy(tmp_path):
    """PackedDataset (indexed binary pack of the npy dir) must produce
    bit-identical batches to NpyDataset for the same seed."""
    trans = tmp_path / "transcriptions.txt"
    trans.write_text(TRANSCRIPTION, encoding="utf-8")
    out_dir = tmp_path / "npy"
    preprocess_transcriptions(str(trans), str(out_dir))
    for name in ("utt001", "utt002"):
        np.save(out_dir / f"{name}-wav.npy",
                np.random.RandomState(1).uniform(-0.1, 0.1, 2048)
                .astype(np.float32))

    packed = str(tmp_path / "packed")
    assert pack_dataset(str(out_dir), packed) == 2

    npy = NpyDataset(str(out_dir), TINY, t_phones=8, t_frames=32, seed=7)
    pk = PackedDataset(packed, TINY, t_phones=8, t_frames=32, seed=7)
    assert pk.names == npy.names
    for _ in range(3):
        a, b = npy.batch(4), pk.batch(4)
        assert sorted(a) == sorted(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
    pk.close()


def test_toy_voice_profiles_are_distinct():
    """Multispeaker toy axis (VOICES): the "deep" voice renders the SAME
    written score an octave below the "bright" voice with a darker
    harmonic profile — measurably lower F0 and spectral centroid. This is
    the training-data basis for the two differently-trained voices served
    behind singer_id (reference: three model instances,
    pipline_inference_svs_v6_multispeaker.py:166-171)."""
    from music_generation_tpu.train.toydata import _render_score

    sr = 22050
    notes, durs = ["C4", "E4", "G4"], [0.4, 0.4, 0.4]
    bright = _render_score(notes, durs, sr, voice="bright")
    deep = _render_score(notes, durs, sr, voice="deep")
    assert bright.shape == deep.shape

    def centroid(w):
        mag = np.abs(np.fft.rfft(w))
        freqs = np.fft.rfftfreq(len(w), 1.0 / sr)
        return float((mag * freqs).sum() / mag.sum())

    c_b, c_d = centroid(bright), centroid(deep)
    assert c_d < 0.6 * c_b  # darker timbre AND lower register

    from music_generation_tpu.audio.f0 import yin_f0
    f_b = yin_f0(bright, sample_rate=sr, hop=256)
    f_d = yin_f0(deep, sample_rate=sr, hop=256)
    med_b = float(np.median(f_b[f_b > 0]))
    med_d = float(np.median(f_d[f_d > 0]))
    # one octave apart (within half a semitone)
    assert abs(12 * np.log2(med_b / med_d) - 12.0) < 0.5

"""F0 extraction + real-data training ingestion.

Covers VERDICT round-1 gap #4: in-tree pitch tracking (audio/f0.py YIN),
wav ingestion in preprocess_transcriptions (-wav/-log-f0/-f0-score npys),
and a train step consuming ground-truth F0 instead of fabricated targets.
(Reference parity surface: VISinger/utils/pitch_utils.py:22 f0_to_coarse,
models.py:557-620 f0_score/log_f0 inputs.)
"""

import jax
import numpy as np
import pytest

from music_generation_tpu.audio.f0 import f0_targets, yin_f0
from music_generation_tpu.audio.wav import write_wav
from music_generation_tpu.models.svs import SVSConfig
from music_generation_tpu.train import (TrainConfig, create_states,
                                        make_train_step)
from music_generation_tpu.train.dataset import (NpyDataset,
                                                preprocess_transcriptions)

SR = 22050


def _harmonic(f0, seconds=1.0, partials=4, seed=0):
    t = np.arange(int(SR * seconds)) / SR
    wav = sum((0.5 / k) * np.sin(2 * np.pi * f0 * k * t)
              for k in range(1, partials + 1))
    wav += 0.01 * np.random.RandomState(seed).randn(len(t))
    return wav.astype(np.float32)


@pytest.mark.parametrize("true_f0", [110.0, 220.0, 330.5, 523.25])
def test_yin_recovers_harmonic_f0_within_5hz(true_f0):
    f0 = yin_f0(_harmonic(true_f0), SR)
    mid = f0[10:-10]
    voiced = mid[mid > 0]
    assert (mid > 0).mean() > 0.9
    assert abs(np.median(voiced) - true_f0) < 5.0
    assert np.abs(voiced - true_f0).max() < 5.0


def test_native_yin_matches_numpy():
    """runtime/native/yin.cc is an algorithmic twin of audio/f0.yin_f0:
    same voicing decisions and sub-0.1 Hz lag agreement on harmonic audio
    (the FFT-vs-direct correlation differ only by fp rounding; decision
    boundaries on real audio are far from the threshold)."""
    from music_generation_tpu.runtime.native_loader import (native_available,
                                                            yin_f0_native)
    if not native_available():
        pytest.skip("native toolchain unavailable")
    parts = [_harmonic(f, seconds=0.5, seed=i)
             for i, f in enumerate((110.0, 220.0, 330.5, 523.25))]
    silence = np.zeros(SR // 4, np.float32)
    wav = np.concatenate([silence] + parts + [silence])
    ref = yin_f0(wav, SR)
    fast = yin_f0_native(wav, SR)
    assert fast.shape == ref.shape
    agree = (ref > 0) == (fast > 0)
    assert agree.mean() > 0.99, agree.mean()
    both = (ref > 0) & (fast > 0)
    assert np.abs(ref[both] - fast[both]).max() < 0.1


def test_yin_silence_is_unvoiced():
    assert (yin_f0(np.zeros(SR), SR) == 0).all()


def test_yin_tracks_vibrato():
    t = np.arange(SR) / SR
    inst = 220.0 * (1 + 0.03 * np.sin(2 * np.pi * 5 * t))
    wav = np.sin(2 * np.pi * np.cumsum(inst) / SR)
    f0 = yin_f0(wav, SR)[10:-10]
    assert f0.min() < 216 and f0.max() > 224  # swings ~213..227 Hz


def test_f0_targets_shapes_and_coarse_bins():
    wav = _harmonic(220.0)
    log_f0, f0_score = f0_targets(wav, SR, hop=256)
    n_frames = 1 + len(wav) // 256
    assert log_f0.shape == (n_frames,) == f0_score.shape
    assert f0_score.dtype == np.int32
    assert f0_score.min() >= 1 and f0_score.max() <= 255
    v = log_f0[f0_score > 1]
    assert np.allclose(np.exp(v) - 1, 220.0, atol=8.0)


TINY = SVSConfig(
    inter_channels=16, hidden_channels=16, filter_channels=32, n_heads=2,
    n_layers=1, spec_channels=65, resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),), upsample_rates=(4, 4),
    upsample_initial_channel=32, upsample_kernel_sizes=(8, 8),
    segment_size=16 * 8, hop_length=16)

TRANSCRIPTION = (
    "utt001|你好|n i3 h ao3|C4 C4 D4 D4|0.3 0.3 0.4 0.4|0.1 0.2 0.15 0.25\n"
    "utt002|世界|sh i4 j ie4|E4 E4 F4 F4|0.5 0.5 0.3 0.3|0.2 0.3 0.1 0.2\n"
)


def test_preprocess_ingests_wavs_and_train_step_consumes_f0(tmp_path):
    trans = tmp_path / "transcriptions.txt"
    trans.write_text(TRANSCRIPTION, encoding="utf-8")
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    for name, f0 in (("utt001", 261.63), ("utt002", 329.63)):
        wav = _harmonic(f0, seconds=0.6) * 20000
        write_wav(str(wav_dir / f"{name}.wav"), wav, SR)
    out_dir = tmp_path / "npy"
    n = preprocess_transcriptions(str(trans), str(out_dir),
                                  wav_dir=str(wav_dir), sample_rate=SR,
                                  hop=TINY.hop_length)
    assert n == 2
    for name in ("utt001", "utt002"):
        for suffix in ("wav", "log-f0", "f0-score"):
            assert (out_dir / f"{name}-{suffix}.npy").exists(), suffix
    lf = np.load(out_dir / "utt001-log-f0.npy")
    voiced = lf[lf > 0]
    assert abs(np.median(np.exp(voiced) - 1) - 261.63) < 5.0

    ds = NpyDataset(str(out_dir), TINY, t_phones=8, t_frames=32)
    batch = ds.batch(2)
    # ground-truth targets, not the ones/zeros fallback
    assert (batch["log_f0"] != 0).any()
    assert (batch["f0_score"] > 1).any()
    assert np.abs(batch["audio"]).max() > 0

    import jax.numpy as jnp
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    gen_state, disc_state, gen, disc = create_states(TINY, TrainConfig(), jb)
    step = jax.jit(make_train_step(gen, disc, TINY, TrainConfig()))
    _, _, metrics = step(gen_state, disc_state, jb, jax.random.PRNGKey(0))
    assert all(np.isfinite(float(v)) for v in metrics.values())

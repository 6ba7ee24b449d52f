"""Numerical parity: reference PyTorch SynthesizerTrn vs our flax VISinger.

Builds the REFERENCE torch model (models_ae.py, loaded from /root/reference
with import stubs), converts its random-init state_dict through
compat.torch_import, runs both infer paths with IDENTICAL injected noise,
and compares the waveform. Target: <= 1e-3 MAE (BASELINE.md north-star);
in f32 on CPU the two implementations should agree far tighter.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not mounted")


def _load_reference_models_ae():
    """Import VISinger.models_ae with stubs for librosa / the py3.8 Cython
    extension / CUDA calls."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # stub the audio-analysis deps touched at import time (librosa.filters.mel,
    # parselmouth) — none are used on the infer path we exercise
    if "librosa" not in sys.modules:
        librosa = types.ModuleType("librosa")
        filters = types.ModuleType("librosa.filters")
        filters.mel = lambda *a, **k: np.zeros((80, 513), np.float32)
        core = types.ModuleType("librosa.core")
        librosa.filters = filters
        librosa.core = core
        sys.modules["librosa"] = librosa
        sys.modules["librosa.filters"] = filters
        sys.modules["librosa.core"] = core
    if "parselmouth" not in sys.modules:
        sys.modules["parselmouth"] = types.ModuleType("parselmouth")
    # monotonic_align stub (referenced only by commented-out training code)
    ma = types.ModuleType("VISinger.monotonic_align")
    ma.maximum_path = None
    sys.modules["VISinger.monotonic_align"] = ma
    # .cuda() no-ops (models.py:514 calls .cuda(0) in __init__)
    torch.nn.Module.cuda = lambda self, *a, **k: self
    from VISinger import models_ae
    return models_ae


SMALL = dict(inter_channels=32, hidden_channels=32, filter_channels=64,
             n_heads=2, n_layers=2, kernel_size=3, p_dropout=0.1,
             resblock="2", resblock_kernel_sizes=[3],
             resblock_dilation_sizes=[[1, 3]], upsample_rates=[4, 4],
             upsample_initial_channel=32, upsample_kernel_sizes=[8, 8])
SPEC_CHANNELS = 65
HOP = 16
MAX_FRAMES = 256


@pytest.fixture(scope="module")
def parity_setup():
    models_ae = _load_reference_models_ae()
    torch.manual_seed(0)
    ref = models_ae.SynthesizerTrn(
        100, SPEC_CHANNELS, 128 // HOP, **SMALL)
    ref.eval()

    from music_generation_tpu.compat.torch_import import (
        visinger_params_from_torch)
    from music_generation_tpu.models.svs import SVSConfig, VISinger

    cfg = SVSConfig(
        n_vocab=100, spec_channels=SPEC_CHANNELS,
        inter_channels=32, hidden_channels=32, filter_channels=64,
        n_heads=2, n_layers=2, kernel_size=3, p_dropout=0.1,
        resblock="2", resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),), upsample_rates=(4, 4),
        upsample_initial_channel=32, upsample_kernel_sizes=(8, 8),
        segment_size=128, hop_length=HOP, autoencoder=True)
    params = visinger_params_from_torch(ref.state_dict(), cfg)
    return ref, VISinger(cfg), params


def test_waveform_parity_non_ae():
    """Same harness against the non-AE models.py variant."""
    import jax.numpy as jnp
    _load_reference_models_ae()  # installs stubs + sys.path
    from VISinger import models as ref_models
    from music_generation_tpu.compat.torch_import import (
        visinger_params_from_torch)
    from music_generation_tpu.models.svs import SVSConfig, VISinger

    torch.manual_seed(1)
    ref = ref_models.SynthesizerTrn(100, SPEC_CHANNELS, 128 // HOP, **SMALL)
    ref.eval()
    cfg = SVSConfig(
        n_vocab=100, spec_channels=SPEC_CHANNELS, inter_channels=32,
        hidden_channels=32, filter_channels=64, n_heads=2, n_layers=2,
        kernel_size=3, p_dropout=0.1, resblock="2",
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
        upsample_rates=(4, 4), upsample_initial_channel=32,
        upsample_kernel_sizes=(8, 8), segment_size=128, hop_length=HOP,
        autoencoder=False)
    params = visinger_params_from_torch(ref.state_dict(), cfg)
    _compare(ref, VISinger(cfg), params, seed=3)


def _compare(ref, model, params, seed=0):
    import jax.numpy as jnp
    from music_generation_tpu.models.svs import VISinger
    rng = np.random.RandomState(seed)
    T = 10
    phones = rng.randint(3, 60, (1, T))
    note_ids = rng.randint(40, 80, (1, T))
    note_dur = rng.uniform(0.2, 0.5, (1, T)).astype(np.float32)
    shengdiao = rng.randint(3, 250, (1, T))
    noise = rng.randn(1, MAX_FRAMES, 32).astype(np.float32)

    real_randn_like = torch.randn_like

    def fake_randn_like(x):
        t = x.shape[2]
        return torch.from_numpy(np.transpose(noise[:, :t, :], (0, 2, 1)).copy())

    torch.randn_like = fake_randn_like
    try:
        with torch.no_grad():
            out = ref.infer(
                torch.LongTensor(phones), torch.LongTensor([T]),
                torch.LongTensor(note_ids), torch.FloatTensor(note_dur),
                phone_shengdiao=torch.LongTensor(shengdiao),
                noise_scale=1.0, length_scale=1)
        ref_audio = out[0][0, 0].numpy()
    finally:
        torch.randn_like = real_randn_like

    audio, mel_len, _ = model.apply(
        params,
        phones=jnp.asarray(phones, jnp.int32),
        x_lengths=jnp.asarray([T], jnp.int32),
        note_ids=jnp.asarray(note_ids, jnp.int32),
        note_durations=jnp.asarray(note_dur),
        shengdiao=jnp.asarray(shengdiao, jnp.int32),
        max_frames=MAX_FRAMES, noise=jnp.asarray(noise),
        method=VISinger.infer)
    ours = np.asarray(audio[0, :, 0])
    n = min(len(ref_audio), int(mel_len[0]) * HOP)
    mae = np.abs(ref_audio[:n] - ours[:n]).mean()
    print(f"waveform MAE={mae:.3e}, n={n}")
    assert len(ref_audio) == int(mel_len[0]) * HOP
    assert mae <= 1e-3


def test_waveform_parity(parity_setup):
    import jax.numpy as jnp
    from music_generation_tpu.models.svs import VISinger

    ref, model, params = parity_setup
    rng = np.random.RandomState(0)
    T = 10
    phones = rng.randint(3, 60, (1, T))
    note_ids = rng.randint(40, 80, (1, T))
    note_dur = rng.uniform(0.2, 0.5, (1, T)).astype(np.float32)
    shengdiao = rng.randint(3, 250, (1, T))
    noise = rng.randn(1, MAX_FRAMES, 32).astype(np.float32)

    # --- torch reference: patch randn_like to inject the same noise --------
    real_randn_like = torch.randn_like

    def fake_randn_like(x):
        # z_p noise: [B, C, T_frames]; slice our [B, F, C] buffer
        t = x.shape[2]
        return torch.from_numpy(
            np.transpose(noise[:, :t, :], (0, 2, 1)).copy())

    torch.randn_like = fake_randn_like
    try:
        with torch.no_grad():
            out = ref.infer(
                torch.LongTensor(phones), torch.LongTensor([T]),
                torch.LongTensor(note_ids), torch.FloatTensor(note_dur),
                phone_shengdiao=torch.LongTensor(shengdiao),
                noise_scale=1.0, length_scale=1)
        ref_audio = out[0][0, 0].numpy()
    finally:
        torch.randn_like = real_randn_like

    # --- ours ----------------------------------------------------------------
    audio, mel_len, aux = model.apply(
        params,
        phones=jnp.asarray(phones, jnp.int32),
        x_lengths=jnp.asarray([T], jnp.int32),
        note_ids=jnp.asarray(note_ids, jnp.int32),
        note_durations=jnp.asarray(note_dur),
        shengdiao=jnp.asarray(shengdiao, jnp.int32),
        max_frames=MAX_FRAMES, noise=jnp.asarray(noise),
        method=VISinger.infer)
    ours = np.asarray(audio[0, :, 0])

    n = min(len(ref_audio), int(mel_len[0]) * HOP)
    assert n > 0
    mae = np.abs(ref_audio[:n] - ours[:n]).mean()
    denom = np.abs(ref_audio[:n]).mean() + 1e-9
    print(f"waveform MAE={mae:.3e} (rel {mae / denom:.3e}), n={n}, "
          f"ref_len={len(ref_audio)}, mel_len={int(mel_len[0])}")
    assert len(ref_audio) == int(mel_len[0]) * HOP  # same predicted length
    assert mae <= 1e-3  # BASELINE.md north-star (expect ~1e-6 in f32)


def test_infer_fake_parity(parity_setup):
    """Copy-synthesis parity (models_ae.py:664-672): same spectrogram + same
    injected posterior noise -> same waveform, incl. the max_len slice."""
    import jax.numpy as jnp
    from music_generation_tpu.models.svs import VISinger

    ref, model, params = parity_setup
    rng = np.random.RandomState(7)
    frames = 48
    spec = rng.uniform(0, 1, (1, frames, SPEC_CHANNELS)).astype(np.float32)
    noise = rng.randn(1, frames, 32).astype(np.float32)
    max_len = 32

    real_randn_like = torch.randn_like

    def fake_randn_like(x):
        t = x.shape[2]
        return torch.from_numpy(np.transpose(noise[:, :t, :], (0, 2, 1)).copy())

    torch.randn_like = fake_randn_like
    try:
        with torch.no_grad():
            o, y_mask_t, z_t = ref.infer_fake(
                torch.from_numpy(np.transpose(spec, (0, 2, 1)).copy()),
                torch.LongTensor([frames]), max_len=max_len)
        ref_audio = o[0, 0].numpy()
    finally:
        torch.randn_like = real_randn_like

    audio, y_mask, z = model.apply(
        params, jnp.asarray(spec), jnp.asarray([frames], jnp.int32),
        max_len=max_len, noise=jnp.asarray(noise),
        method=VISinger.infer_fake)
    ours = np.asarray(audio)[0, :, 0]
    assert len(ref_audio) == max_len * HOP == len(ours)
    mae = np.abs(ref_audio - ours).mean()
    print(f"infer_fake MAE={mae:.3e}")
    assert mae <= 1e-3
    np.testing.assert_allclose(np.asarray(z)[0],
                               z_t[0].numpy().T[:max_len], atol=1e-4)

"""iSTFT / multi-band iSTFT decoder variants (models/svs/istft.py,
after arXiv 2210.15975 MB-iSTFT-VITS). Beyond-parity TPU speed option."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music_generation_tpu.models.svs import SVSConfig, VISinger
from music_generation_tpu.models.svs.istft import (istft_overlap_add,
                                                   pqmf_filters,
                                                   pqmf_synthesis)

TINY = SVSConfig(
    inter_channels=16, hidden_channels=16, filter_channels=32, n_heads=2,
    n_layers=1, spec_channels=65, resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),), upsample_rates=(4, 4),
    upsample_initial_channel=32, upsample_kernel_sizes=(8, 8),
    segment_size=16 * 8, hop_length=16)

TINY_ISTFT = dataclasses.replace(
    TINY, decoder_type="istft", istft_upsample_rates=(4,),
    istft_upsample_kernel_sizes=(8,), istft_hop=4, istft_n_fft=16)

TINY_MB = dataclasses.replace(
    TINY, decoder_type="mb_istft", mb_upsample_rates=(2,),
    mb_upsample_kernel_sizes=(4,), istft_hop=4, istft_n_fft=16,
    mb_subbands=2)


def test_istft_overlap_add_reconstructs_stft():
    """istft(stft(x)) == x (away from edges) for our frame conventions:
    frame t covers samples [t*hop, t*hop+n_fft) with a periodic Hann
    synthesis window and window-sum normalization."""
    n_fft, hop = 16, 4
    rng = np.random.RandomState(0)
    x = rng.randn(2, 128).astype(np.float32)
    t = (128 - n_fft) // hop + 1
    frames = np.stack([x[:, i * hop: i * hop + n_fft] for i in range(t)], 1)
    spec = np.fft.rfft(frames, axis=-1)
    out = np.asarray(istft_overlap_add(jnp.abs(spec).astype(jnp.float32),
                                       jnp.angle(spec).astype(jnp.float32),
                                       n_fft, hop))
    # interior samples (first/last n_fft samples see partial window sums)
    lo, hi = n_fft, t * hop - n_fft
    np.testing.assert_allclose(out[:, lo:hi], x[:, lo:hi], atol=2e-3)


def test_pqmf_near_perfect_reconstruction():
    """Analysis -> synthesis through the cosine-modulated filterbank
    reconstructs a bandlimited signal (delay-compensated) to ~35 dB SNR."""
    from scipy.signal import lfilter
    s = 4
    h_ana = pqmf_filters(s)
    h_syn = pqmf_filters(s, synthesis=True)
    taps = h_ana.shape[1] - 1
    rng = np.random.RandomState(1)
    # bandlimited-ish input: smooth random signal
    x = np.cumsum(rng.randn(4096)).astype(np.float64)
    x = x - x.mean()
    x /= np.abs(x).max()
    # analysis: convolve + decimate
    bands = np.stack([lfilter(h_ana[k], [1.0], x)[::s] for k in range(s)],
                     axis=-1)[None]  # [1, T/s, S]
    y = np.asarray(pqmf_synthesis(jnp.asarray(bands, jnp.float32), h_syn))
    # causal analysis delays taps/2; the centered synthesis conv adds none
    d = taps // 2
    xa, ya = x[: -d], y[0, d:]
    n = min(len(xa), len(ya))
    err = xa[:n] - ya[:n]
    snr = 10 * np.log10(np.sum(xa[:n] ** 2) / max(np.sum(err ** 2), 1e-12))
    assert snr > 30.0, snr


@pytest.mark.parametrize("cfg", [TINY_ISTFT, TINY_MB],
                         ids=["istft", "mb_istft"])
def test_decoder_variant_infer_shapes(cfg):
    model = VISinger(cfg)
    T, MAX_FRAMES = 8, 32
    rng = np.random.RandomState(0)
    batch = dict(
        phones=jnp.asarray(rng.randint(3, 60, (2, T)), jnp.int32),
        x_lengths=jnp.asarray([T, T - 2], jnp.int32),
        note_ids=jnp.asarray(rng.randint(40, 80, (2, T)), jnp.int32),
        note_durations=jnp.asarray(rng.uniform(0.1, 0.3, (2, T)), jnp.float32),
        shengdiao=jnp.asarray(rng.randint(3, 250, (2, T)), jnp.int32))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        **batch, max_frames=MAX_FRAMES, method=VISinger.infer)
    audio, mel_len, _ = jax.jit(
        lambda p, b: model.apply(p, **b, max_frames=MAX_FRAMES,
                                 method=VISinger.infer,
                                 rngs={"noise": jax.random.PRNGKey(2)})
    )(params, batch)
    assert audio.shape == (2, MAX_FRAMES * cfg.hop_length, 1)
    a = np.asarray(audio)
    assert np.all(np.isfinite(a)) and np.abs(a).max() <= 1.0


def test_istft_decoder_trains():
    """One GAN train step with the istft decoder: finite losses, params move."""
    from music_generation_tpu.train import (TrainConfig, create_states,
                                            make_train_step, synthetic_batch)
    tcfg = TrainConfig()
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(TINY_ISTFT, batch=2, t_phones=8,
                             t_frames=32).items()}
    gen_state, disc_state, gen, disc = create_states(TINY_ISTFT, tcfg, batch)
    step = jax.jit(make_train_step(gen, disc, TINY_ISTFT, tcfg))
    g2, d2, metrics = step(gen_state, disc_state, batch,
                           jax.random.PRNGKey(0))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    l0 = jax.tree_util.tree_leaves(gen_state.params)[0]
    l1 = jax.tree_util.tree_leaves(g2.params)[0]
    assert np.abs(np.asarray(l0 - l1)).max() > 0

"""SVS model tests: infer path shapes, jit-ability, train forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music_generation_tpu.models.svs import SVSConfig, VISinger, f0_to_coarse
from music_generation_tpu.models.svs.hifigan import (Generator,
                                                     MultiPeriodDiscriminator)

# Tiny config so tests run in seconds on CPU.
TINY = SVSConfig(
    n_vocab=100, n_vocab_note=100, n_vocab_shengdiao=300,
    spec_channels=65, inter_channels=16, hidden_channels=16,
    filter_channels=32, n_heads=2, n_layers=1, kernel_size=3, p_dropout=0.1,
    resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    upsample_rates=(4, 4), upsample_initial_channel=32,
    upsample_kernel_sizes=(8, 8), segment_size=16 * 8, hop_length=16,
)
HOP = 16  # prod(upsample_rates)


def _score_batch(t=12, b=2):
    rng = np.random.RandomState(0)
    return dict(
        phones=jnp.asarray(rng.randint(3, 60, (b, t)), jnp.int32),
        x_lengths=jnp.asarray([t, t - 4], jnp.int32),
        note_ids=jnp.asarray(rng.randint(40, 80, (b, t)), jnp.int32),
        note_durations=jnp.asarray(rng.uniform(0.1, 0.6, (b, t)), jnp.float32),
        shengdiao=jnp.asarray(rng.randint(3, 250, (b, t)), jnp.int32),
    )


@pytest.fixture(scope="module")
def model_and_params():
    model = VISinger(TINY)
    batch = _score_batch()
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    params = model.init(rngs, **batch, max_frames=64, method=VISinger.infer)
    return model, params


def test_f0_to_coarse_matches_numpy():
    from music_generation_tpu.frontend import f0_to_coarse as np_f0
    f0 = np.array([0.0, 50.0, 123.4, 440.0, 1100.0])
    got = np.asarray(f0_to_coarse(jnp.asarray(f0)))
    want = np_f0(f0)
    np.testing.assert_array_equal(got, want)


def test_infer_shapes(model_and_params):
    model, params = model_and_params
    batch = _score_batch()
    audio, mel_len, aux = model.apply(
        params, **batch, max_frames=64, method=VISinger.infer,
        rngs={"noise": jax.random.PRNGKey(2)})
    assert audio.shape == (2, 64 * HOP, 1)
    assert mel_len.shape == (2,)
    assert np.isfinite(np.asarray(audio)).all()
    assert aux["log_f0"].shape == (2, 64)
    assert aux["mel_predict"].shape == (2, 64, 80)
    assert aux["spec_predict"].shape == (2, 64, 65)


def test_infer_jits_and_is_deterministic(model_and_params):
    model, params = model_and_params
    batch = _score_batch()

    @jax.jit
    def run(params, noise_key, **kw):
        return model.apply(params, **kw, max_frames=64, method=VISinger.infer,
                           rngs={"noise": noise_key})

    a1, l1, _ = run(params, jax.random.PRNGKey(7), **batch)
    a2, l2, _ = run(params, jax.random.PRNGKey(7), **batch)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    a3, _, _ = run(params, jax.random.PRNGKey(8), **batch)
    assert np.abs(np.asarray(a1) - np.asarray(a3)).max() > 0  # noise matters


def test_train_forward(model_and_params):
    model, _ = model_and_params
    batch = _score_batch()
    b, t = 2, 12
    frames = 32
    spec = jnp.ones((b, frames, TINY.spec_channels)) * 0.1
    y_lengths = jnp.asarray([frames, frames - 8], jnp.int32)
    f0_score = jnp.ones((b, frames), jnp.int32) * 10
    phone_durations = jnp.ones((b, t), jnp.int32) * 2

    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "slice": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}
    out, params = VISinger(TINY).init_with_output(
        rngs, batch["phones"], batch["x_lengths"], spec, y_lengths,
        batch["note_ids"], batch["note_durations"], f0_score, phone_durations,
        batch["shengdiao"], deterministic=True)
    assert out["audio"].shape == (b, TINY.segment_frames * HOP, 1)
    assert out["z"].shape == (b, frames, TINY.inter_channels)
    assert out["duration_fraction"].shape == (b, t)
    assert np.isfinite(np.asarray(out["audio"])).all()


def test_generator_upsampling():
    gen = Generator(resblock="1", resblock_kernel_sizes=(3,),
                    resblock_dilation_sizes=((1, 3),), upsample_rates=(4, 4),
                    upsample_initial_channel=32, upsample_kernel_sizes=(8, 8))
    x = jnp.ones((1, 10, 16))
    y, _ = gen.init_with_output(jax.random.PRNGKey(0), x)
    assert y.shape == (1, 160, 1)
    assert float(jnp.abs(y).max()) <= 1.0  # tanh output


def test_discriminators():
    mpd = MultiPeriodDiscriminator(periods=(2, 3))
    y = jnp.ones((1, 320, 1))
    (outs_r, outs_g, fr, fg), _ = mpd.init_with_output(
        jax.random.PRNGKey(0), y, y * 0.5)
    assert len(outs_r) == 3  # 1 scale + 2 period
    assert len(fr[0]) == 7   # scale disc: 6 convs + post
    assert all(len(f) == 6 for f in fr[1:])  # period: 5 convs + post


@pytest.fixture(scope="module")
def vc_params():
    """Params covering the posterior/flow/decoder paths (the infer-method
    init does not trace spec_encoder)."""
    model = VISinger(TINY)
    spec = jnp.zeros((1, 8, TINY.spec_channels), jnp.float32)
    y_lengths = jnp.asarray([8], jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        spec, y_lengths, method=VISinger.voice_conversion)
    return model, params


def test_infer_fake_copy_synthesis(vc_params):
    """infer_fake: spectrogram -> posterior -> waveform, incl. the max_len
    slicing path (round-1 regression: y_mask must be sliced with z)."""
    model, params = vc_params
    frames = 32
    rng = np.random.RandomState(3)
    spec = jnp.asarray(rng.uniform(0, 1, (2, frames, TINY.spec_channels)),
                       jnp.float32)
    y_lengths = jnp.asarray([frames, frames - 8], jnp.int32)
    audio, y_mask, z = model.apply(
        params, spec, y_lengths, method=VISinger.infer_fake,
        rngs={"noise": jax.random.PRNGKey(11)})
    assert audio.shape == (2, frames * HOP, 1)
    assert z.shape == (2, frames, TINY.inter_channels)
    assert np.isfinite(np.asarray(audio)).all()
    # masked frames decode from zeroed latents
    assert np.asarray(y_mask)[1, frames - 8:].sum() == 0

    audio2, y_mask2, z2 = model.apply(
        params, spec, y_lengths, max_len=16, method=VISinger.infer_fake,
        rngs={"noise": jax.random.PRNGKey(11)})
    assert audio2.shape == (2, 16 * HOP, 1)
    assert y_mask2.shape[1] == 16 and z2.shape[1] == 16
    # decoder convs see past the slice boundary; compare away from it
    # (empirically the last ~5.2*HOP samples feel the boundary)
    receptive = 6 * HOP
    np.testing.assert_allclose(
        np.asarray(audio2)[:, : 16 * HOP - receptive],
        np.asarray(audio)[:, : 16 * HOP - receptive], atol=2e-5)


def test_voice_conversion_flow_roundtrip(vc_params):
    """voice_conversion with g_src == g_tgt must be the identity on the
    latent (flow invertibility) and decode like infer_fake."""
    model, params = vc_params
    # perturb the zero-initialized coupling post-convs so the flow is NOT
    # the identity (VITS zero-init) and invertibility is actually exercised
    keys = jax.random.split(jax.random.PRNGKey(99),
                            len(jax.tree_util.tree_leaves(params)))
    leaves, treedef = jax.tree_util.tree_flatten(params)
    params = jax.tree_util.tree_unflatten(
        treedef, [l + 0.01 * jax.random.normal(k, l.shape, l.dtype)
                  for l, k in zip(leaves, keys)])
    frames = 32
    rng = np.random.RandomState(4)
    spec = jnp.asarray(rng.uniform(0, 1, (2, frames, TINY.spec_channels)),
                       jnp.float32)
    y_lengths = jnp.asarray([frames, frames - 8], jnp.int32)
    audio, y_mask, (z, z_p, z_hat) = model.apply(
        params, spec, y_lengths, method=VISinger.voice_conversion,
        rngs={"noise": jax.random.PRNGKey(12)})
    assert audio.shape == (2, frames * HOP, 1)
    # z_p actually moved through the flow...
    assert np.abs(np.asarray(z_p) - np.asarray(z)).max() > 1e-3
    # ...and the inverse pass recovers z (flow invertibility)
    np.testing.assert_allclose(np.asarray(z_hat), np.asarray(z), atol=1e-4)

    fake_audio, _, _ = model.apply(
        params, spec, y_lengths, method=VISinger.infer_fake,
        rngs={"noise": jax.random.PRNGKey(12)})
    np.testing.assert_allclose(np.asarray(audio), np.asarray(fake_audio),
                               atol=1e-4)


def test_chunked_decode_matches_monolithic():
    """Frame-chunked vocoder decode (SVSSynthesizer decode_chunk_frames:
    lax.scan over halo'd windows) must produce the same waveform as the
    monolithic decode — the b=16 HBM cap remedy must not change audio."""
    from music_generation_tpu.pipeline.synthesis import SVSSynthesizer

    base = SVSSynthesizer(TINY, seed=5)
    chunked = SVSSynthesizer(TINY, params=base.params, seed=5,
                             decode_chunk_frames=16, decode_chunk_halo=8)
    texts = ["你好世界", "小小的天有大的梦想"]
    scores = []
    for text in texts:
        notes = (["C4", "C4", "D4", "D4", "E4", "E4", "G4", "G4", "A4",
                  "A4"] * 2)[: 2 * len(text)]
        scores.append(base.frontend.align(text, notes, [0.3] * len(notes)))
    ref = base.synthesize_batch(scores)
    got = chunked.synthesize_batch(scores)
    assert len(ref) == len(got) == 2
    for a, b in zip(ref, got):
        assert a.shape == b.shape and b.dtype == np.int16
        np.testing.assert_allclose(a.astype(np.int32), b.astype(np.int32),
                                   atol=1)


def test_chunked_decode_respects_max_batch_override():
    from music_generation_tpu.pipeline.synthesis import SVSSynthesizer
    s = SVSSynthesizer(TINY, seed=1, decode_chunk_frames=16, max_batch=32)
    assert s.max_batch == 32
    s2 = SVSSynthesizer(TINY, seed=1)
    assert s2.max_batch == SVSSynthesizer.MAX_BATCH

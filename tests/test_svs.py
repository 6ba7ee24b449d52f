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

"""NSF harmonic-excitation decoder tests (models/svs/excitation.py).

The plain HiFi-GAN-on-z decoder cannot phase-track an arbitrary fundamental
from near-constant frame input (observed mel-L1 floor + tanh saturation on
the stationary sine-singer set); cfg.nsf hands the decoder a sample-rate
sine source at the target F0. These tests pin the source's spectral
correctness and the end-to-end wiring (train forward, infer, copy-synthesis,
chunked decode phase continuity).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest  # noqa: F401

from music_generation_tpu.models.svs import SVSConfig, VISinger
from music_generation_tpu.models.svs.excitation import (EXC_AMPLITUDE,
                                                        harmonic_excitation)

TINY_NSF = SVSConfig(
    n_vocab=100, n_vocab_note=100, n_vocab_shengdiao=300,
    spec_channels=65, inter_channels=16, hidden_channels=16,
    filter_channels=32, n_heads=2, n_layers=1, kernel_size=3, p_dropout=0.1,
    resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    upsample_rates=(4, 4), upsample_initial_channel=32,
    upsample_kernel_sizes=(8, 8), segment_size=16 * 8, hop_length=16,
    nsf=True,
)


def test_excitation_is_a_sine_at_f0():
    sr, hop, t = 22050, 256, 64
    f0 = 261.63
    log_f0 = jnp.full((1, t), np.log1p(f0), jnp.float32)
    exc = np.asarray(harmonic_excitation(log_f0, hop, sr))[0, :, 0]
    assert exc.shape == (t * hop,)
    assert np.abs(exc).max() <= EXC_AMPLITUDE + 1e-6
    spec = np.abs(np.fft.rfft(exc * np.hanning(len(exc))))
    peak_hz = np.fft.rfftfreq(len(exc), 1.0 / sr)[spec.argmax()]
    assert abs(peak_hz - f0) < 3.0, peak_hz


def test_excitation_unvoiced_is_silent_and_holds_phase():
    sr, hop = 22050, 16
    log_f0 = jnp.concatenate([
        jnp.full((1, 8), np.log1p(200.0)),
        jnp.zeros((1, 4)),                      # rest: no signal, no advance
        jnp.full((1, 8), np.log1p(200.0))], axis=1).astype(jnp.float32)
    exc = np.asarray(harmonic_excitation(log_f0, hop, sr))[0, :, 0]
    assert np.all(exc[8 * hop: 12 * hop] == 0.0)
    # phase resumes exactly where it stopped: splice out the rest and the
    # signal must equal the continuous 200 Hz rendering
    cont = np.asarray(harmonic_excitation(
        jnp.full((1, 16), np.log1p(200.0), jnp.float32), hop, sr))[0, :, 0]
    spliced = np.concatenate([exc[: 8 * hop], exc[12 * hop:]])
    np.testing.assert_allclose(spliced, cont, atol=1e-5)


def _batch(b=2, t_ph=8, t_fr=32):
    rng = np.random.RandomState(0)
    c = TINY_NSF
    return {
        "phones": jnp.asarray(rng.randint(3, 60, (b, t_ph)), jnp.int32),
        "x_lengths": jnp.asarray([t_ph, t_ph - 2], jnp.int32),
        "spec": jnp.asarray(rng.rand(b, t_fr, c.spec_channels), jnp.float32),
        "y_lengths": jnp.asarray([t_fr, t_fr - 8], jnp.int32),
        "note_ids": jnp.asarray(rng.randint(40, 80, (b, t_ph)), jnp.int32),
        "note_durations": jnp.asarray(rng.uniform(0.1, 0.6, (b, t_ph)),
                                      jnp.float32),
        "f0_score": jnp.asarray(rng.randint(1, 255, (b, t_fr)), jnp.int32),
        "phone_durations": jnp.full((b, t_ph), 4, jnp.int32),
        "shengdiao": jnp.asarray(rng.randint(3, 250, (b, t_ph)), jnp.int32),
        "log_f0": jnp.asarray(np.log1p(rng.uniform(80, 400, (b, t_fr))),
                              jnp.float32),
    }


def test_nsf_train_forward_and_grad():
    model = VISinger(TINY_NSF)
    batch = _batch()
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "slice": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}
    variables = model.init(rngs, **batch, deterministic=True)
    # the excitation injectors exist
    dec = variables["params"]["decoder"]
    assert "exc_0" in dec and "exc_1" in dec

    def loss(params):
        out = model.apply({"params": params}, **batch, deterministic=True,
                          rngs={"noise": rngs["noise"], "slice": rngs["slice"],
                                "dropout": rngs["dropout"]})
        return jnp.mean(out["audio"] ** 2)

    g = jax.grad(loss)(variables["params"])
    gnorm = jnp.sqrt(sum(jnp.sum(x ** 2)
                         for x in jax.tree_util.tree_leaves(g["decoder"])))
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0


def test_nsf_train_excitation_is_teacher_forced():
    """The training-time sine source must be driven by the batch's
    ground-truth ``log_f0``, NOT the F0 predictor's output (regression: a
    shadowed variable once silently swapped them). Two consequences pinned
    here: (a) the audio loss has exactly zero gradient into the F0
    predictor — its only job is loss_f0; (b) changing the GT contour
    changes the waveform."""
    model = VISinger(TINY_NSF)
    batch = _batch()
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "slice": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}
    variables = model.init(rngs, **batch, deterministic=True)
    apply_rngs = {"noise": rngs["noise"], "slice": rngs["slice"],
                  "dropout": rngs["dropout"]}

    def audio_loss(params, b):
        out = model.apply({"params": params}, **b, deterministic=True,
                          rngs=apply_rngs)
        return jnp.mean(out["audio"] ** 2)

    g = jax.grad(audio_loss)(variables["params"], batch)
    f0_pred_g = g["text_post_net"]["f0_predictor"]
    gnorm = jnp.sqrt(sum(jnp.sum(x ** 2)
                         for x in jax.tree_util.tree_leaves(f0_pred_g)))
    assert float(gnorm) == 0.0, \
        "audio gradients leaked into the F0 predictor (excitation is " \
        "being built from the predicted contour instead of the batch GT)"

    # (b) the GT contour actually drives the excitation
    shifted = dict(batch)
    shifted["log_f0"] = batch["log_f0"] + 0.3
    a0 = model.apply(variables, **batch, deterministic=True, rngs=apply_rngs)
    a1 = model.apply(variables, **shifted, deterministic=True, rngs=apply_rngs)
    assert float(jnp.abs(a0["audio"] - a1["audio"]).max()) > 0.0
    # and the predicted-F0 output is unchanged by the GT swap
    np.testing.assert_allclose(np.asarray(a0["log_f0"]),
                               np.asarray(a1["log_f0"]), atol=0)


def test_nsf_infer_and_copy_synthesis_shapes():
    model = VISinger(TINY_NSF)
    batch = _batch()
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "slice": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}
    variables = model.init(rngs, **batch, deterministic=True)
    score = {k: batch[k] for k in ("phones", "x_lengths", "note_ids",
                                   "note_durations", "shengdiao")}
    audio, mel_len, aux = model.apply(
        variables, **score, max_frames=32, method=VISinger.infer,
        rngs={"noise": jax.random.PRNGKey(4)})
    assert audio.shape == (2, 32 * TINY_NSF.hop_length, 1)
    assert aux["exc"].shape == (2, 32 * TINY_NSF.hop_length, 1)

    rec, _, _ = model.apply(
        variables, batch["spec"], batch["y_lengths"], log_f0=batch["log_f0"],
        method=VISinger.copy_synthesis, rngs={"noise": jax.random.PRNGKey(5)})
    assert rec.shape == (2, 32 * TINY_NSF.hop_length, 1)


def test_nsf_chunked_decode_matches_monolithic():
    """Frame-chunked NSF decode must be bit-comparable to the monolithic
    decode: the excitation is precomputed at full length, so chunk
    boundaries keep a continuous phase."""
    from music_generation_tpu.pipeline.synthesis import SVSSynthesizer

    model = VISinger(TINY_NSF)
    batch = _batch()
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "slice": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}
    variables = model.init(rngs, **batch, deterministic=True)

    t_fr = 32
    hidden, mel_len, aux = model.apply(
        variables, batch["phones"], batch["x_lengths"], batch["note_ids"],
        batch["note_durations"], batch["shengdiao"], max_frames=t_fr,
        method=VISinger.infer_hidden, rngs={"noise": jax.random.PRNGKey(4)})
    mono = model.apply(variables, hidden, exc=aux["exc"],
                       method=VISinger.decode_hidden)

    synth = SVSSynthesizer.__new__(SVSSynthesizer)
    synth.model = model
    synth.cfg = TINY_NSF
    synth.decode_chunk_frames = 8
    synth.decode_chunk_halo = 6  # covers the tiny decoder's receptive field
    chunked = synth._chunked_decode(variables, hidden, exc=aux["exc"])
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(mono),
                               atol=2e-5)


def test_builder_propagates_nsf_to_serving_cfg():
    """`serve.app --nsf` serves checkpoints from `train --nsf`: the default
    pipeline builder must construct SVS models whose config (and param
    structure — the excitation injectors) matches the trained params, or
    the orbax restore would silently mismatch."""
    from music_generation_tpu.pipeline.synthesis import \
        build_default_song_synthesizer

    songs = build_default_song_synthesizer(tiny=True, n_speakers=1,
                                           svs_nsf=True)
    svs = songs.synthesizers[0]
    assert svs.cfg.nsf is True
    assert "exc_0" in svs.params["params"]["decoder"] or \
        "exc_0" in svs.params.get("decoder", {})

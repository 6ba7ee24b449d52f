"""SVSConfig.f0_mode — inference-time F0 source selection.

"predict" (default) is reference parity: the F0Predictor's frame contour
drives the f0 embedding and the NSF excitation
(ext_modules/text_post_net.py via models.py infer). "score" is the
beyond-parity pitch-control mode: frame F0 is derived from the score's MIDI
note ids, so the output is in tune by construction. The param tree is
identical in both modes (the predictor still runs), so trained checkpoints
transfer freely between them.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from music_generation_tpu.models.svs import SVSConfig, VISinger

TINY_NSF = SVSConfig(
    n_vocab=100, n_vocab_note=100, n_vocab_shengdiao=300,
    spec_channels=65, inter_channels=16, hidden_channels=16,
    filter_channels=32, n_heads=2, n_layers=1, kernel_size=3, p_dropout=0.1,
    resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    upsample_rates=(4, 4), upsample_initial_channel=32,
    upsample_kernel_sizes=(8, 8), segment_size=16 * 8, hop_length=16,
    nsf=True,
)

T_PH, MAX_FRAMES = 6, 48


def _score_inputs(midi=69):
    return dict(
        phones=jnp.asarray([[5, 9, 12, 20, 7, 3]], jnp.int32),
        x_lengths=jnp.asarray([T_PH], jnp.int32),
        note_ids=jnp.full((1, T_PH), midi, jnp.int32),
        note_durations=jnp.full((1, T_PH), 0.3, jnp.float32),
        shengdiao=jnp.asarray([[1, 2, 3, 1, 2, 3]], jnp.int32),
        ph_dur=jnp.full((1, T_PH), 6, jnp.int32),  # 36 valid frames
    )


def _infer(cfg, inputs, seed=0):
    model = VISinger(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(seed), "noise": jax.random.PRNGKey(1)},
        **inputs, max_frames=MAX_FRAMES, method=VISinger.infer)
    audio, mel_len, aux = model.apply(
        variables, **inputs, max_frames=MAX_FRAMES, noise_scale=0.0,
        method=VISinger.infer, rngs={"noise": jax.random.PRNGKey(2)})
    return variables, audio, mel_len, aux


def test_score_mode_frame_f0_is_note_pitch():
    cfg = dataclasses.replace(TINY_NSF, f0_mode="score")
    _, _, mel_len, aux = _infer(cfg, _score_inputs(midi=69))
    n = int(mel_len[0])
    assert n == 36
    used = np.asarray(aux["log_f0_used"])[0]
    np.testing.assert_allclose(used[:n], np.log1p(440.0), rtol=1e-6)
    assert np.all(used[n:] == 0.0)  # masked frames carry no pitch
    # excitation fundamental sits at the note pitch
    exc = np.asarray(aux["exc"])[0, : n * cfg.hop_length, 0]
    spec = np.abs(np.fft.rfft(exc * np.hanning(len(exc))))
    peak_hz = np.fft.rfftfreq(len(exc), 1.0 / cfg.sampling_rate)[spec.argmax()]
    assert abs(peak_hz - 440.0) < 40.0, peak_hz  # short window -> coarse bins


def test_score_mode_rest_notes_are_unvoiced():
    cfg = dataclasses.replace(TINY_NSF, f0_mode="score")
    inputs = _score_inputs(midi=60)
    inputs["note_ids"] = inputs["note_ids"].at[0, 2].set(0)  # rest
    _, _, mel_len, aux = _infer(cfg, inputs)
    used = np.asarray(aux["log_f0_used"])[0]
    assert np.all(used[12:18] == 0.0)        # the rest phone's 6 frames
    assert np.all(used[:12] > 0.0)


def test_predict_mode_unchanged_and_used_equals_predicted():
    _, _, mel_len, aux = _infer(TINY_NSF, _score_inputs())
    n = int(mel_len[0])
    used = np.asarray(aux["log_f0_used"])[0]
    pred = np.asarray(aux["log_f0"])[0]
    np.testing.assert_allclose(used[:n], pred[:n], rtol=1e-6)


def test_param_tree_identical_across_modes():
    """Checkpoints trained in predict mode must restore into a score-mode
    model: same params, byte for byte, given the same init seed."""
    inputs = _score_inputs()
    v_pred, *_ = _infer(TINY_NSF, inputs, seed=7)
    v_score, *_ = _infer(dataclasses.replace(TINY_NSF, f0_mode="score"),
                         inputs, seed=7)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        v_pred["params"], v_score["params"])


def test_score_mode_audio_tracks_transposed_notes():
    """Transposing the score by an octave must move the excitation's
    fundamental — the pitch really is score-driven."""
    cfg = dataclasses.replace(TINY_NSF, f0_mode="score")
    _, _, mel_len, aux_lo = _infer(cfg, _score_inputs(midi=57))
    _, _, _, aux_hi = _infer(cfg, _score_inputs(midi=69))
    lo = np.asarray(aux_lo["log_f0_used"])[0, :36]
    hi = np.asarray(aux_hi["log_f0_used"])[0, :36]
    ratio = (np.expm1(hi) / np.expm1(lo)).mean()
    np.testing.assert_allclose(ratio, 2.0, rtol=1e-5)

"""Residual F0 head (SVSConfig.f0_residual).

The F0Predictor's zero-initialized output becomes a deviation ADDED to the
score note's frame log-F0: the model starts exactly on pitch and trains only
the expressive deviation, removing the systematic intonation bias an
absolute head converges to on small corpora (+1.5 st on the toy set,
artifacts/sung_song_sweep.json) while keeping f0_mode="predict" expressive.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from music_generation_tpu.models.svs import VISinger
from music_generation_tpu.train import (TrainConfig, build_svs_config,
                                        create_states, make_train_step,
                                        synthetic_batch, tool_shapes)


def _infer(cfg, ph_dur=None):
    model = VISinger(cfg)
    t, fr = 8, 32
    notes = np.array([60, 62, 64, 65, 67, 0, 69, 71], np.int32)
    kwargs = dict(
        phones=jnp.asarray(np.arange(3, 3 + t, dtype=np.int32)[None]),
        x_lengths=jnp.asarray([t], jnp.int32),
        note_ids=jnp.asarray(notes[None]),
        note_durations=jnp.full((1, t), 4 * cfg.frame_seconds, jnp.float32),
        shengdiao=jnp.zeros((1, t), jnp.int32),
        max_frames=fr, method=VISinger.infer)
    if ph_dur is not None:
        kwargs["ph_dur"] = jnp.asarray(ph_dur[None])
    params = model.init({"params": jax.random.PRNGKey(0),
                         "noise": jax.random.PRNGKey(1)}, **kwargs)
    out = model.apply(params, **kwargs, rngs={"noise": jax.random.PRNGKey(2)})
    return notes, params, out


def test_residual_head_starts_on_pitch():
    """At init (zero-init out conv + zero bias) the predicted log-F0 equals
    the note's log1p-F0 exactly, frame-for-frame."""
    cfg = build_svs_config(tiny=True, f0_residual=True)
    ph_dur = np.full(8, 4, np.int32)  # pinned: 8 phones x 4 frames = 32
    notes, _, (audio, mel_len, aux) = _infer(cfg, ph_dur=ph_dur)
    assert int(mel_len[0]) == 32
    hz = np.where(notes > 0, 440.0 * 2.0 ** ((notes - 69.0) / 12.0), 0.0)
    expected = np.repeat(np.log1p(hz), 4)
    np.testing.assert_allclose(np.asarray(aux["log_f0"][0, :32]), expected,
                               rtol=0, atol=1e-6)
    # and the NSF-facing contour uses the same values in predict mode
    np.testing.assert_allclose(np.asarray(aux["log_f0_used"][0, :32]),
                               expected, rtol=0, atol=1e-6)


def test_absolute_head_differs_at_init():
    """Control: without f0_residual the head is absolute (lecun init), so it
    does NOT start at note pitch — the residual test above is not vacuous."""
    cfg = build_svs_config(tiny=True)
    ph_dur = np.full(8, 4, np.int32)
    notes, _, (_, _, aux) = _infer(cfg, ph_dur=ph_dur)
    hz = np.where(notes > 0, 440.0 * 2.0 ** ((notes - 69.0) / 12.0), 0.0)
    expected = np.repeat(np.log1p(hz), 4)
    assert np.abs(np.asarray(aux["log_f0"][0, :32]) - expected).max() > 0.1


def test_param_tree_identical():
    """A residual checkpoint restores into an absolute-head target and vice
    versa (same modules; only the out-conv init differs)."""
    _, p_res, _ = _infer(build_svs_config(tiny=True, f0_residual=True))
    _, p_abs, _ = _infer(build_svs_config(tiny=True))
    assert (jax.tree_util.tree_structure(p_res)
            == jax.tree_util.tree_structure(p_abs))


def test_residual_train_step_finite():
    cfg = build_svs_config(tiny=True, f0_residual=True)
    t_phones, t_frames = tool_shapes(True)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(cfg, batch=2, t_phones=t_phones,
                             t_frames=t_frames).items()}
    tcfg = dataclasses.replace(TrainConfig(), warmup_steps=0)
    gen_state, disc_state, gen, disc = create_states(cfg, tcfg, batch)
    step = jax.jit(make_train_step(gen, disc, cfg, tcfg))
    gen_state, disc_state, metrics = step(gen_state, disc_state, batch,
                                          jax.random.PRNGKey(0))
    for k in ("loss_gen", "loss_f0", "loss_mel", "loss_disc"):
        assert np.isfinite(float(metrics[k])), k

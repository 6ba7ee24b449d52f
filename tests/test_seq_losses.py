"""Sequence-model training objectives: losses finite + decreasing."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from music_generation_tpu.models.lyrics import GPT2, GPT2Config
from music_generation_tpu.models.melody import (MelodyConfig,
                                                MelodyTransformer,
                                                MSEDurationModel, causal_mask)
from music_generation_tpu.train.seq_losses import (cross_entropy,
                                                   duration_mse_loss, lm_loss,
                                                   make_seq_train_step,
                                                   melody_note_loss)

TINY = MelodyConfig(src_vocab=40, tgt_vocab=20, n_layers=1, d_model=32,
                    d_ff=64, n_heads=2, dropout=0.1)


def test_cross_entropy_masks_pad():
    logits = jnp.zeros((1, 3, 5))
    targets = jnp.asarray([[1, 2, 0]])  # last is PAD
    loss = cross_entropy(logits, targets)
    np.testing.assert_allclose(float(loss), np.log(5), rtol=1e-5)


def test_melody_note_training_improves():
    model = MelodyTransformer(TINY)
    rng = np.random.RandomState(0)
    batch = {
        "src": jnp.asarray(rng.randint(4, 40, (4, 8)), jnp.int32),
        "tgt_in": jnp.asarray(rng.randint(4, 20, (4, 6)), jnp.int32),
        "tgt_out": jnp.asarray(rng.randint(4, 20, (4, 6)), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), batch["src"], batch["tgt_in"],
                        jnp.ones((4, 1, 1, 8), jnp.int32), causal_mask(6))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = jax.jit(make_seq_train_step(melody_note_loss, model, opt))
    first = last = None
    for i in range(8):
        params, opt_state, loss = step(params, opt_state, batch,
                                       jax.random.PRNGKey(i))
        first = first if first is not None else float(loss)
        last = float(loss)
    assert np.isfinite(last)
    assert last < first  # memorizes the fixed batch


def test_duration_mse_loss_runs():
    model = MSEDurationModel(TINY)
    rng = np.random.RandomState(0)
    batch = {
        "src": jnp.asarray(rng.randint(4, 40, (2, 8)), jnp.int32),
        "durations_cs": jnp.asarray(rng.randint(20, 80, (2, 8)), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), batch["src"],
                        jnp.ones((2, 1, 1, 8), jnp.int32))
    loss = duration_mse_loss(model, params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


def test_lm_loss_runs():
    cfg = GPT2Config(vocab_size=50, n_layer=1, n_embd=32, n_head=2,
                     n_positions=64)
    model = GPT2(cfg)
    ids = jnp.asarray(np.random.RandomState(0).randint(1, 50, (2, 10)),
                      jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    loss = lm_loss(model, params, {"ids": ids})
    assert np.isfinite(float(loss))


def test_pipeline_checkpoint_roundtrip(tmp_path):
    from music_generation_tpu.compat import load_pipeline, save_pipeline
    from music_generation_tpu.pipeline import build_default_song_synthesizer
    s1 = build_default_song_synthesizer(tiny=True, n_speakers=1, seed=0)
    s2 = build_default_song_synthesizer(tiny=True, n_speakers=1, seed=99)
    save_pipeline(str(tmp_path), s1)
    load_pipeline(str(tmp_path), s2)
    a = jax.tree_util.tree_leaves(s1.synthesizers[0].params)[0]
    b = jax.tree_util.tree_leaves(s2.synthesizers[0].params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

"""Seq2seq RNN melody family tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music_generation_tpu.models.melody import (Lang, Seq2SeqConfig,
                                                Seq2SeqMelodyGenerator,
                                                Seq2SeqModel, beam_decode)

TINY = Seq2SeqConfig(en_vocab=30, de_vocab=20, en_embedding_dim=16,
                     de_embedding_dim=16, hidden_dim=16, num_layers=1,
                     bidirectional=True, use_lstm=False)


def test_lang_vocab():
    lang = Lang(["C4", "D4"])
    assert lang.item2index["_PAD_"] == 0
    assert lang.encode(["C4", "zzz"]) == [4, 1]
    assert lang.decode([4]) == ["C4"]


def test_encoder_decoder_shapes():
    model = Seq2SeqModel(TINY)
    src = jnp.asarray([[5, 6, 7, 2]], jnp.int32)
    tgt = jnp.asarray([[3, 5, 6]], jnp.int32)
    lp, params = model.init_with_output(jax.random.PRNGKey(0), src, tgt)
    assert lp.shape == (1, 3, 20)
    np.testing.assert_allclose(np.exp(np.asarray(lp)).sum(-1), 1.0, rtol=1e-4)


def test_beam_decode_runs():
    model = Seq2SeqModel(TINY)
    src = jnp.asarray([[5, 6, 7, 2]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), src, jnp.asarray([[3, 5]], jnp.int32))
    seq, score = beam_decode(model, params, src, max_len=6, beam=3)
    assert seq.shape == (6,)
    assert np.isfinite(float(score))


def test_lstm_variant():
    cfg = Seq2SeqConfig(**{**TINY.__dict__, "use_lstm": True})
    model = Seq2SeqModel(cfg)
    src = jnp.asarray([[5, 6, 7]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), src,
                        jnp.asarray([[3, 5]], jnp.int32))
    seq, _ = beam_decode(model, params, src, max_len=4, beam=2)
    assert seq.shape == (4,)


@pytest.fixture(scope="module")
def generator():
    lyric = Lang(list("你好世界小的天有大梦想，"))
    note = Lang(["C4", "D4", "E4", "rest"])
    dur = Lang(["0.3000", "0.4202", "0.5000"])
    return Seq2SeqMelodyGenerator(lyric, note, dur, cfg=TINY, seed=0)


def test_get_melody_comma_branch(generator):
    lyr, notes, durs = generator.get_melody("你好，世界")
    assert "SP" in lyr and "AP" in lyr
    assert notes.count("rest") >= 2
    assert len(notes) == len(durs)


def test_get_melody_long_line_inserts_breath(generator):
    lyr, notes, durs = generator.get_melody("小小的天有大大的梦想")
    assert lyr.endswith("AP")
    assert notes[-1] == "rest"
    assert "SP" in lyr  # >6 chars -> random interior breath
    assert len(notes) == len(durs)

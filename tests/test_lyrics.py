"""Lyric model tests (tiny configs): decode loops, bigram ban, tokenizer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music_generation_tpu.models.lyrics import (CharTokenizer, GPT2,
                                                GPT2Config, LyricGeneratorGPT2,
                                                LyricGeneratorT5, T5, T5Config,
                                                greedy_generate,
                                                topk_sample_generate)
from music_generation_tpu.models.lyrics.gpt2 import _ban_repeated_bigrams

TINY_GPT2 = GPT2Config(vocab_size=64, n_layer=2, n_embd=32, n_head=2,
                       n_positions=128)
TINY_T5 = T5Config(vocab_size=64, d_model=32, d_kv=8, d_ff=64, num_layers=1,
                   num_decoder_layers=1, num_heads=4)


def test_tokenizer_roundtrip():
    tok = CharTokenizer()
    ids = tok.encode("你好hello")
    assert tok.decode(ids) == "你好hello"
    assert tok.token_id("<Pop 流行>") != tok.token_id("[UNK]")
    assert tok.vocab_size > 5000


def test_ban_repeated_bigrams():
    # sequence: [5, 7, 5] at step=2 (last=5); bigram (5,7) seen -> ban 7
    tokens = jnp.asarray([[5, 7, 5, 0, 0]])
    logits = jnp.zeros((1, 10))
    out = _ban_repeated_bigrams(logits, tokens, 2, 10)
    assert float(out[0, 7]) < -1e8
    assert float(out[0, 6]) == 0.0


def test_gpt2_cached_decode_matches_full_forward():
    """KV-cached step decoding must agree with the full causal forward."""
    model = GPT2(TINY_GPT2)
    rng = jax.random.PRNGKey(0)
    ids = jax.random.randint(rng, (1, 6), 0, 64)
    params = model.init(rng, ids)
    full = model.apply(params, ids)  # [1, 6, V]

    from music_generation_tpu.models.lyrics.gpt2 import init_cache
    caches = init_cache(TINY_GPT2, 1, 6)
    step_logits = []
    for pos in range(6):
        lg, caches = model.apply(params, ids[:, pos], jnp.asarray(pos), caches,
                                 method=GPT2.decode_step)
        step_logits.append(lg)
    got = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(got),
                               rtol=2e-4, atol=2e-4)


def test_t5_cached_decode_matches_full_forward():
    model = T5(TINY_T5)
    rng = jax.random.PRNGKey(0)
    src = jax.random.randint(rng, (1, 5), 2, 64)
    src_mask = jnp.ones_like(src)
    tgt = jax.random.randint(jax.random.PRNGKey(1), (1, 4), 2, 64)
    params = model.init(rng, src, src_mask, tgt)
    full = model.apply(params, src, src_mask, tgt)

    from music_generation_tpu.models.lyrics.t5 import init_t5_cache
    memory = model.apply(params, src, src_mask, method=T5.encode)
    caches = init_t5_cache(TINY_T5, 1, 4)
    outs = []
    for pos in range(4):
        lg, caches = model.apply(params, tgt[:, pos], jnp.asarray(pos), memory,
                                 src_mask, caches, 4, method=T5.decode_step)
        outs.append(lg)
    got = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(got),
                               rtol=2e-4, atol=2e-4)


def test_gpt2_lyric_generator_end_to_end():
    tok = CharTokenizer()
    gen = LyricGeneratorGPT2(
        GPT2Config(vocab_size=tok.vocab_size, n_layer=1, n_embd=32, n_head=2,
                   n_positions=128), tokenizer=tok)
    out = gen.generate("夏天")
    assert isinstance(out, str)


def test_t5_lyric_generator_end_to_end():
    tok = CharTokenizer()
    gen = LyricGeneratorT5(
        T5Config(vocab_size=tok.vocab_size, d_model=32, d_kv=8, d_ff=64,
                 num_layers=1, num_decoder_layers=1, num_heads=4),
        tokenizer=tok)
    out = gen.generate("夏天")
    assert isinstance(out, str)
    # sampling differs across calls (random-weight model, top-k 10)
    out2 = gen.generate("夏天")
    assert isinstance(out2, str)

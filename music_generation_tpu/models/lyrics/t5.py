"""T5 lyric generator (encoder-decoder, top-k sampled scan decoding).

Parity target: Lyric_generator_t5/generator.py — Mengzi-T5-base
(checkpoint/config.json: 12+12 layers, d_model 768, d_kv 64, gated-gelu,
relative attention 32 buckets, untied embeddings), prompt
"关键词：{kw} 长度：15", top_k=10 sampling, max_length 512.

TPU-first: decode is a jitted lax.scan with KV caches; the encoder runs once.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 768
    d_kv: int = 64
    d_ff: int = 2048
    num_layers: int = 12
    num_decoder_layers: int = 12
    num_heads: int = 12
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    decoder_start_token_id: int = 0
    eos_token_id: int = 1
    pad_token_id: int = 0


class RMSNorm(nn.Module):
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        return x * jax.lax.rsqrt(var + self.epsilon) * scale


def relative_position_bucket(relative_position, bidirectional: bool,
                             num_buckets: int, max_distance: int):
    ret = 0
    n = -relative_position
    if bidirectional:
        num_buckets //= 2
        ret += (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


class T5Attention(nn.Module):
    cfg: T5Config
    has_relative_bias: bool = False
    bidirectional: bool = True

    def setup(self):
        c = self.cfg
        inner = c.num_heads * c.d_kv
        self.q = nn.Dense(inner, use_bias=False)
        self.k = nn.Dense(inner, use_bias=False)
        self.v = nn.Dense(inner, use_bias=False)
        self.o = nn.Dense(c.d_model, use_bias=False)
        if self.has_relative_bias:
            self.rel_bias = nn.Embed(c.relative_attention_num_buckets,
                                     c.num_heads)

    def _heads(self, x):
        b, t, _ = x.shape
        return x.reshape(b, t, self.cfg.num_heads, self.cfg.d_kv).transpose(0, 2, 1, 3)

    def compute_bias(self, q_len, k_len, q_offset=0):
        ctx = jnp.arange(q_len)[:, None] + q_offset
        mem = jnp.arange(k_len)[None, :]
        buckets = relative_position_bucket(
            mem - ctx, self.bidirectional,
            self.cfg.relative_attention_num_buckets,
            self.cfg.relative_attention_max_distance)
        return self.rel_bias(buckets).transpose(2, 0, 1)[None]  # [1,H,Q,K]

    def __call__(self, x, kv, mask=None, bias=None):
        q, k, v = self._heads(self.q(x)), self._heads(self.k(kv)), self._heads(self.v(kv))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k)  # T5: no 1/sqrt(d) scale
        if bias is not None:
            scores = scores + bias
        if mask is not None:
            scores = jnp.where(mask == 0, NEG_INF, scores)
        p = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        b, h, t, d = out.shape
        return self.o(out.transpose(0, 2, 1, 3).reshape(b, t, h * d))

    def step(self, x, cache_k, cache_v, pos, bias_row=None):
        """Single-position self-attention with cache. x: [B, 1, C]."""
        c = self.cfg
        b = x.shape[0]
        q = self.q(x).reshape(b, c.num_heads, c.d_kv)
        k = self.k(x).reshape(b, 1, c.num_heads, c.d_kv)
        v = self.v(x).reshape(b, 1, c.num_heads, c.d_kv)
        cache_k = jax.lax.dynamic_update_slice_in_dim(cache_k, k, pos, axis=1)
        cache_v = jax.lax.dynamic_update_slice_in_dim(cache_v, v, pos, axis=1)
        scores = jnp.einsum("bhd,bthd->bht", q, cache_k)
        if bias_row is not None:
            scores = scores + bias_row
        valid = jnp.arange(cache_k.shape[1])[None, None, :] <= pos
        scores = jnp.where(valid, scores, NEG_INF)
        p = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bht,bthd->bhd", p, cache_v).reshape(b, 1, -1)
        return self.o(out), cache_k, cache_v


class T5FFN(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x):
        # gated-gelu (T5 v1.1 / Mengzi)
        wi0 = nn.Dense(self.cfg.d_ff, use_bias=False, name="wi_0")(x)
        wi1 = nn.Dense(self.cfg.d_ff, use_bias=False, name="wi_1")(x)
        return nn.Dense(self.cfg.d_model, use_bias=False, name="wo")(
            jax.nn.gelu(wi0, approximate=True) * wi1)


class T5EncoderLayer(nn.Module):
    cfg: T5Config
    has_relative_bias: bool = False

    def setup(self):
        self.attn = T5Attention(self.cfg, self.has_relative_bias, True)
        self.norm1 = RMSNorm(self.cfg.layer_norm_epsilon)
        self.ffn = T5FFN(self.cfg)
        self.norm2 = RMSNorm(self.cfg.layer_norm_epsilon)

    def __call__(self, x, mask, bias):
        x = x + self.attn(self.norm1(x), self.norm1(x), mask, bias)
        x = x + self.ffn(self.norm2(x))
        return x


class T5DecoderLayer(nn.Module):
    cfg: T5Config
    has_relative_bias: bool = False

    def setup(self):
        self.self_attn = T5Attention(self.cfg, self.has_relative_bias, False)
        self.norm1 = RMSNorm(self.cfg.layer_norm_epsilon)
        self.cross_attn = T5Attention(self.cfg, False, True)
        self.norm2 = RMSNorm(self.cfg.layer_norm_epsilon)
        self.ffn = T5FFN(self.cfg)
        self.norm3 = RMSNorm(self.cfg.layer_norm_epsilon)

    def step(self, x, memory, memory_mask, cache_k, cache_v, pos, bias_row):
        h, cache_k, cache_v = self.self_attn.step(
            self.norm1(x), cache_k, cache_v, pos, bias_row)
        x = x + h
        x = x + self.cross_attn(self.norm2(x), memory, memory_mask)
        x = x + self.ffn(self.norm3(x))
        return x, cache_k, cache_v

    def __call__(self, x, memory, memory_mask, causal, bias):
        h = self.norm1(x)
        x = x + self.self_attn(h, h, causal, bias)
        x = x + self.cross_attn(self.norm2(x), memory, memory_mask)
        x = x + self.ffn(self.norm3(x))
        return x


class T5(nn.Module):
    cfg: T5Config

    def setup(self):
        c = self.cfg
        self.shared = nn.Embed(c.vocab_size, c.d_model)
        self.enc_layers = [T5EncoderLayer(c, i == 0, name=f"enc_{i}")
                           for i in range(c.num_layers)]
        self.enc_norm = RMSNorm(c.layer_norm_epsilon)
        self.dec_layers = [T5DecoderLayer(c, i == 0, name=f"dec_{i}")
                           for i in range(c.num_decoder_layers)]
        self.dec_norm = RMSNorm(c.layer_norm_epsilon)
        self.lm_head = nn.Dense(c.vocab_size, use_bias=False)

    def encode(self, ids, mask):
        x = self.shared(ids)
        attn_mask = mask[:, None, None, :]
        bias = self.enc_layers[0].attn.compute_bias(ids.shape[1], ids.shape[1])
        for i, layer in enumerate(self.enc_layers):
            x = layer(x, attn_mask, bias if i == 0 else bias)
        return self.enc_norm(x)

    def __call__(self, src_ids, src_mask, tgt_ids):
        """Full (non-cached) training forward -> logits [B, T_tgt, V]."""
        memory = self.encode(src_ids, src_mask)
        t = tgt_ids.shape[1]
        x = self.shared(tgt_ids)
        causal = jnp.tril(jnp.ones((t, t), jnp.int32))[None, None]
        bias = self.dec_layers[0].self_attn.compute_bias(t, t)
        mem_mask = src_mask[:, None, None, :]
        for layer in self.dec_layers:
            x = layer(x, memory, mem_mask, causal, bias)
        return self.lm_head(self.dec_norm(x))

    def decoder_bias_row(self, pos, max_len):
        """Relative self-attn bias for one decode position: [1, H, K]."""
        return self.dec_layers[0].self_attn.compute_bias(
            1, max_len, q_offset=pos)[0, :, 0][None]

    def decode_step(self, token, pos, memory, memory_mask, caches, max_len: int):
        x = self.shared(token[:, None])
        bias_row = self.decoder_bias_row(pos, max_len)
        mem_mask = memory_mask[:, None, None, :]
        new_caches = []
        for layer, (ck, cv) in zip(self.dec_layers, caches):
            x, ck, cv = layer.step(x, memory, mem_mask, ck, cv, pos,
                                   bias_row)
            new_caches.append((ck, cv))
        x = self.dec_norm(x)
        # Mengzi: untied embeddings -> independent lm_head, no rescale
        return self.lm_head(x)[:, 0], tuple(new_caches)


def init_t5_cache(cfg: T5Config, batch: int, max_len: int):
    shape = (batch, max_len, cfg.num_heads, cfg.d_kv)
    return tuple((jnp.zeros(shape), jnp.zeros(shape))
                 for _ in range(cfg.num_decoder_layers))


@functools.partial(jax.jit, static_argnames=("model", "max_length", "top_k",
                                             "no_repeat_ngram"))
def topk_sample_generate(model: T5, params, rng, src_ids, src_mask,
                         max_length: int = 128, top_k: int = 10,
                         no_repeat_ngram: int = 2):
    """Encoder once + sampled decode. Returns token buffer [B, max_length].

    Decode-time degeneracy bound: like the reference's GPT-2 generator
    (Lyric_generator/generator.py no_repeat_ngram_size=2), repeated bigrams
    are banned — toy-corpus-trained samplers otherwise loop on a few
    high-probability characters and the downstream song collapses to one
    giant unpunctuated sentence."""
    from .gpt2 import _ban_repeated_bigrams
    cfg = model.cfg
    batch = src_ids.shape[0]
    memory = model.apply(params, src_ids, src_mask, method=T5.encode)
    caches = init_t5_cache(cfg, batch, max_length)
    tokens = jnp.full((batch, max_length + 1), cfg.pad_token_id, jnp.int32)
    tokens = tokens.at[:, 0].set(cfg.decoder_start_token_id)
    finished = jnp.zeros((batch,), bool)

    def step_fn(carry, pos):
        tokens, caches, finished, rng = carry
        logits, caches = model.apply(
            params, tokens[:, pos], jnp.asarray(pos), memory, src_mask,
            caches, max_length, method=T5.decode_step)
        if no_repeat_ngram == 2:
            logits = _ban_repeated_bigrams(logits, tokens, pos,
                                           cfg.vocab_size)
        vals, idx = jax.lax.top_k(logits, top_k)
        rng, sub = jax.random.split(rng)
        choice = jax.random.categorical(sub, vals)
        nxt = jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0]
        nxt = jnp.where(finished, cfg.pad_token_id, nxt)
        finished = finished | (nxt == cfg.eos_token_id)
        tokens = tokens.at[:, pos + 1].set(nxt)
        return (tokens, caches, finished, rng), None

    (tokens, _, _, _), _ = jax.lax.scan(
        step_fn, (tokens, caches, finished, rng), jnp.arange(max_length))
    return tokens[:, 1:]

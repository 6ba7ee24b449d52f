"""GPT-2 lyric generator (decoder-only LM, KV-cached scan decoding).

Parity target: Lyric_generator/generator.py — 10-layer / 768-d / 12-head GPT-2
(checkpoint/config.json), greedy decoding with no_repeat_ngram_size=2, style
control tokens, '[CLS] title [SEP] style [SEP]' prompt layout.

TPU-first: the autoregressive loop is a jitted lax.scan over a static
max_length with per-layer KV caches — one compiled program, no host round
trips per token (the reference re-runs HF generate's Python loop).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 21136     # 21128 wordpiece + 8 style/control specials
    n_layer: int = 10
    n_embd: int = 768
    n_head: int = 12
    n_positions: int = 1024
    layer_norm_epsilon: float = 1e-5
    dropout: float = 0.1


def gelu_new(x):
    return 0.5 * x * (1.0 + jnp.tanh(
        np.sqrt(2.0 / np.pi) * (x + 0.044715 * jnp.power(x, 3.0))))


class GPT2Block(nn.Module):
    cfg: GPT2Config

    def setup(self):
        c = self.cfg
        self.ln_1 = nn.LayerNorm(epsilon=c.layer_norm_epsilon)
        self.qkv = nn.Dense(3 * c.n_embd)
        self.attn_proj = nn.Dense(c.n_embd)
        self.ln_2 = nn.LayerNorm(epsilon=c.layer_norm_epsilon)
        self.mlp_fc = nn.Dense(4 * c.n_embd)
        self.mlp_proj = nn.Dense(c.n_embd)

    def _split_heads(self, x):
        b, t, _ = x.shape
        h = self.cfg.n_head
        return x.reshape(b, t, h, -1).transpose(0, 2, 1, 3)

    def __call__(self, x, causal_mask, deterministic: bool = True):
        h = self.ln_1(x)
        q, k, v = jnp.split(self.qkv(h), 3, axis=-1)
        q, k, v = map(self._split_heads, (q, k, v))
        d_k = q.shape[-1]
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(float(d_k))
        scores = jnp.where(causal_mask == 0, NEG_INF, scores)
        p = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        o = o.transpose(0, 2, 1, 3).reshape(x.shape)
        x = x + self.attn_proj(o)
        x = x + self.mlp_proj(gelu_new(self.mlp_fc(self.ln_2(x))))
        return x

    def step(self, x, cache_k, cache_v, pos):
        """One-token step. x: [B, 1, C]; caches [B, T_max, H, Dk]."""
        h = self.ln_1(x)
        q, k, v = jnp.split(self.qkv(h), 3, axis=-1)
        b = x.shape[0]
        nh = self.cfg.n_head
        q = q.reshape(b, nh, -1)
        k = k.reshape(b, nh, -1)
        v = v.reshape(b, nh, -1)
        cache_k = jax.lax.dynamic_update_slice_in_dim(
            cache_k, k[:, None], pos, axis=1)
        cache_v = jax.lax.dynamic_update_slice_in_dim(
            cache_v, v[:, None], pos, axis=1)
        d_k = q.shape[-1]
        scores = jnp.einsum("bhd,bthd->bht", q, cache_k) / jnp.sqrt(float(d_k))
        t_max = cache_k.shape[1]
        valid = jnp.arange(t_max)[None, None, :] <= pos
        scores = jnp.where(valid, scores, NEG_INF)
        p = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bht,bthd->bhd", p, cache_v).reshape(b, 1, -1)
        x = x + self.attn_proj(o)
        x = x + self.mlp_proj(gelu_new(self.mlp_fc(self.ln_2(x))))
        return x, cache_k, cache_v


class GPT2(nn.Module):
    cfg: GPT2Config

    def setup(self):
        c = self.cfg
        self.wte = nn.Embed(c.vocab_size, c.n_embd)
        self.wpe = nn.Embed(c.n_positions, c.n_embd)
        self.blocks = [GPT2Block(c, name=f"h_{i}") for i in range(c.n_layer)]
        self.ln_f = nn.LayerNorm(epsilon=c.layer_norm_epsilon)

    def _logits(self, x):
        # tied LM head (GPT2LMHeadModel convention)
        return x @ self.wte.embedding.T

    def __call__(self, ids, deterministic: bool = True):
        t = ids.shape[1]
        x = self.wte(ids) + self.wpe(jnp.arange(t)[None])
        mask = jnp.tril(jnp.ones((t, t), jnp.int32))[None, None]
        for blk in self.blocks:
            x = blk(x, mask, deterministic)
        return self._logits(self.ln_f(x))

    def decode_step(self, token, pos, caches):
        """token [B] -> (logits [B, V], new caches)."""
        x = self.wte(token[:, None]) + self.wpe(pos[None, None])
        new_caches = []
        for blk, (ck, cv) in zip(self.blocks, caches):
            x, ck, cv = blk.step(x, ck, cv, pos)
            new_caches.append((ck, cv))
        logits = self._logits(self.ln_f(x))[:, 0]
        return logits, tuple(new_caches)


def init_cache(cfg: GPT2Config, batch: int, max_len: int):
    d_k = cfg.n_embd // cfg.n_head
    shape = (batch, max_len, cfg.n_head, d_k)
    return tuple((jnp.zeros(shape), jnp.zeros(shape))
                 for _ in range(cfg.n_layer))


def _ban_repeated_bigrams(logits, tokens, step, vocab_size):
    """no_repeat_ngram_size=2: ban token v if (last, v) already occurred."""
    last = tokens[:, step]
    prev = tokens[:, :-1]                     # positions 0..T-1
    nxt = tokens[:, 1:]
    pos_valid = jnp.arange(prev.shape[1])[None, :] < step
    matches = (prev == last[:, None]) & pos_valid
    banned = jax.vmap(
        lambda m, n: jnp.zeros((vocab_size,), bool).at[n].max(m))(matches, nxt)
    return jnp.where(banned, NEG_INF, logits)


@functools.partial(jax.jit, static_argnames=("model", "max_length",
                                             "no_repeat_ngram"))
def greedy_generate(model: GPT2, params, input_ids: jnp.ndarray,
                    prompt_len: jnp.ndarray, max_length: int = 90,
                    no_repeat_ngram: int = 2):
    """Greedy decode. input_ids: [B, max_length] buffer with the prompt at the
    front (rest PAD); prompt_len: [B] actual prompt lengths. Returns the filled
    token buffer [B, max_length]."""
    cfg = model.cfg
    batch = input_ids.shape[0]
    caches = init_cache(cfg, batch, max_length)

    def step_fn(carry, pos):
        tokens, caches = carry
        logits, caches = model.apply(params, tokens[:, pos], jnp.asarray(pos),
                                     caches, method=GPT2.decode_step)
        if no_repeat_ngram == 2:
            logits = _ban_repeated_bigrams(logits, tokens, pos, cfg.vocab_size)
        nxt = jnp.argmax(logits, axis=-1)
        # Inside the prompt, keep the given token; else write the prediction.
        in_prompt = (pos + 1) < prompt_len
        write = jnp.where(in_prompt, tokens[:, pos + 1], nxt)
        tokens = tokens.at[:, pos + 1].set(write)
        return (tokens, caches), None

    (tokens, _), _ = jax.lax.scan(step_fn, (input_ids, caches),
                                  jnp.arange(max_length - 1))
    return tokens

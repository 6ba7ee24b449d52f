"""Seq2seq RNN melody models (the reference's "melody_v2" family).

Parity targets: Melody/seq2seq/model.py (GRU/LSTM encoder, attention decoder
with dot attention + tanh(linear1)->linear2->log_softmax) and
Melody/seq2seq/get_melody.py (three models: lyric2note, lyric2duration,
note2duration; beam-5 decoding; SP/AP breath insertion).

Vocab layout matches utils/profile.py Lang: _PAD_=0 _UNK_=1 _EOS_=2 _START_=3.
Hyperparameters are config-driven (the reference's pickled dicts are absent
from the snapshot).

TPU-first: decoding is a jitted lax.scan beam that carries the per-beam RNN
state and gathers it on beam reordering — no per-token host round trips.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

PAD_ID, UNK_ID, EOS_ID, START_ID = 0, 1, 2, 3
NEG_INF = -1e9


class Lang:
    """Token vocabulary (parity: utils/profile.py:7-25)."""

    def __init__(self, items=()):
        self.item2index = {"_PAD_": 0, "_UNK_": 1, "_EOS_": 2, "_START_": 3}
        self.index2item = {0: "_PAD_", 1: "_UNK_", 2: "_EOS_", 3: "_START_"}
        for it in items:
            self.add(str(it))

    def add(self, item: str):
        if item not in self.item2index:
            idx = len(self.item2index)
            self.item2index[item] = idx
            self.index2item[idx] = item

    @property
    def n_items(self):
        return len(self.item2index)

    def encode(self, tokens) -> list[int]:
        return [self.item2index.get(str(t), UNK_ID) for t in tokens]

    def decode(self, ids) -> list[str]:
        return [self.index2item.get(int(i), "_UNK_") for i in ids]


@dataclasses.dataclass(frozen=True)
class Seq2SeqConfig:
    en_vocab: int = 4000
    de_vocab: int = 40
    en_embedding_dim: int = 256
    de_embedding_dim: int = 256
    hidden_dim: int = 256
    num_layers: int = 1
    bidirectional: bool = True
    use_lstm: bool = False
    max_len: int = 64
    beam: int = 5


def _cell(cfg: Seq2SeqConfig, features: int, name: str):
    if cfg.use_lstm:
        return nn.OptimizedLSTMCell(features, name=name)
    return nn.GRUCell(features, name=name)


class Seq2SeqEncoder(nn.Module):
    cfg: Seq2SeqConfig

    def setup(self):
        c = self.cfg
        self.embed = nn.Embed(
            c.en_vocab, c.en_embedding_dim,
            embedding_init=nn.initializers.uniform(scale=0.1))
        self.fwd = [nn.RNN(_cell(c, c.hidden_dim, f"cell_f{i}"),
                           return_carry=True)
                    for i in range(c.num_layers)]
        if c.bidirectional:
            self.bwd = [nn.RNN(_cell(c, c.hidden_dim, f"cell_b{i}"),
                               return_carry=True, reverse=True,
                               keep_order=True)
                        for i in range(c.num_layers)]

    def __call__(self, ids, lengths=None):
        """ids: [B, T] -> (outputs [B, T, H*dirs], final hidden [B, H*dirs]).
        `lengths` masks right-padding (carries stop at the true length)."""
        x = self.embed(ids)
        carries = []
        for i in range(self.cfg.num_layers):
            cf, xf = self.fwd[i](x, seq_lengths=lengths)
            if self.cfg.bidirectional:
                cb, xb = self.bwd[i](x, seq_lengths=lengths)
                x = jnp.concatenate([xf, xb], axis=-1)
                h_f = cf[0] if self.cfg.use_lstm else cf
                h_b = cb[0] if self.cfg.use_lstm else cb
                carries.append(jnp.concatenate([h_f, h_b], axis=-1))
            else:
                x = xf
                carries.append(cf[0] if self.cfg.use_lstm else cf)
        return x, carries[-1]


class Seq2SeqDecoder(nn.Module):
    """Single-step attention decoder (driven by a scan outside the module)."""
    cfg: Seq2SeqConfig

    def setup(self):
        c = self.cfg
        h = c.hidden_dim * (2 if c.bidirectional else 1)
        self.h_total = h
        self.embed = nn.Embed(
            c.de_vocab, c.de_embedding_dim,
            embedding_init=nn.initializers.uniform(scale=0.1))
        self.cells = [_cell(c, h, f"cell_{i}") for i in range(c.num_layers)]
        self.linear1 = nn.Dense(h)
        self.linear2 = nn.Dense(c.de_vocab)

    def step(self, token, encoder_output, state, enc_mask=None):
        """token [B]; state: list of carries [B, H]. Returns (logprobs, state).
        enc_mask: [B, S] 1/0 over encoder positions (right-padding masked)."""
        x = self.embed(token)
        new_state = []
        for cell, carry in zip(self.cells, state):
            carry, x = cell(carry, x)
            new_state.append(carry)
        rnn_out = x[:, None, :]                              # [B, 1, H]
        scores = jnp.einsum("bth,bsh->bts", rnn_out, encoder_output)
        if enc_mask is not None:
            scores = jnp.where(enc_mask[:, None, :] > 0, scores, NEG_INF)
        attn = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bts,bsh->bth", attn, encoder_output)
        combine = jnp.tanh(self.linear1(
            jnp.concatenate([rnn_out, ctx], axis=-1)))[:, 0]
        return jax.nn.log_softmax(self.linear2(combine), axis=-1), new_state

    def init_state(self, encoder_hidden):
        """Initial decoder carries from the encoder's final hidden state."""
        c = self.cfg
        if c.use_lstm:
            return [(encoder_hidden, jnp.zeros_like(encoder_hidden))
                    for _ in range(c.num_layers)]
        return [encoder_hidden for _ in range(c.num_layers)]


class Seq2SeqModel(nn.Module):
    cfg: Seq2SeqConfig

    def setup(self):
        self.encoder = Seq2SeqEncoder(self.cfg, name="encoder")
        self.decoder = Seq2SeqDecoder(self.cfg, name="decoder")

    def encode(self, ids, lengths=None):
        return self.encoder(ids, lengths)

    def decode_step(self, token, encoder_output, state, enc_mask=None):
        return self.decoder.step(token, encoder_output, state, enc_mask)

    def init_decoder_state(self, encoder_hidden):
        return self.decoder.init_state(encoder_hidden)

    def __call__(self, src_ids, tgt_ids):
        """Teacher-forced training forward -> logprobs [B, T_tgt, V].

        Uses the SAME length-masked encode + enc_mask the jitted beam decode
        applies at serving time (beam_decode below) — the one shared
        teacher-forced forward, so training can't skew from inference."""
        lengths = jnp.maximum((src_ids != PAD_ID).sum(axis=1), 1)
        enc_out, enc_hidden = self.encoder(src_ids, lengths)
        enc_mask = (jnp.arange(src_ids.shape[1])[None, :]
                    < lengths[:, None]).astype(jnp.int32)
        state = self.decoder.init_state(enc_hidden)
        outs = []
        for t in range(tgt_ids.shape[1]):
            lp, state = self.decoder.step(tgt_ids[:, t], enc_out, state,
                                          enc_mask)
            outs.append(lp)
        return jnp.stack(outs, axis=1)


def beam_decode(model: Seq2SeqModel, params, src_ids: jnp.ndarray,
                max_len: int, beam: int = 5):
    """Beam search carrying RNN state per beam. src_ids: [1, T] (0 = PAD,
    right-padding masked via lengths). Returns (seq [max_len], score)."""
    lengths = jnp.maximum((src_ids != PAD_ID).sum(axis=1), 1)
    enc_out, enc_hidden = model.apply(params, src_ids, lengths,
                                      method=Seq2SeqModel.encode)
    enc_mask = (jnp.arange(src_ids.shape[1])[None, :]
                < lengths[:, None]).astype(jnp.int32)
    enc_out = jnp.repeat(enc_out, beam, axis=0)
    enc_mask = jnp.repeat(enc_mask, beam, axis=0)
    state0 = model.apply(params, jnp.repeat(enc_hidden, beam, axis=0),
                         method=Seq2SeqModel.init_decoder_state)

    seqs0 = jnp.full((beam, max_len + 1), PAD_ID, jnp.int32).at[:, 0].set(START_ID)
    scores0 = jnp.zeros((beam,))
    finished0 = jnp.zeros((beam,), bool)

    def step_fn(carry, step):
        seqs, scores, finished, state = carry
        logprobs, new_state = model.apply(
            params, seqs[:, step], enc_out, state, enc_mask,
            method=Seq2SeqModel.decode_step)
        vocab = logprobs.shape[-1]
        frozen = jnp.full((vocab,), NEG_INF).at[PAD_ID].set(0.0)
        logprobs = jnp.where(finished[:, None], frozen[None], logprobs)
        valid = jnp.where(step == 0, jnp.arange(beam) == 0,
                          jnp.ones(beam, bool))
        combined = jnp.where(valid[:, None], scores[:, None] + logprobs, NEG_INF)
        top_scores, top_idx = jax.lax.top_k(combined.reshape(-1), beam)
        src_beam = top_idx // vocab
        token = top_idx % vocab
        seqs = seqs[src_beam].at[:, step + 1].set(token)
        finished = finished[src_beam] | (token == EOS_ID)
        state = jax.tree_util.tree_map(lambda s: s[src_beam], new_state)
        return (seqs, scores * 0 + top_scores, finished, state), None

    (seqs, scores, _, _), _ = jax.lax.scan(
        step_fn, (seqs0, scores0, finished0, state0), jnp.arange(max_len))
    best = jnp.argmax(scores)
    return seqs[best, 1:], scores[best]

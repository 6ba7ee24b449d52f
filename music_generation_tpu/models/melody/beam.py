"""Jittable beam search for the melody enc-dec (fixed shapes, lax.scan).

TPU-first replacement for the reference's Python-object beam
(transformer_melody/beam_decoder.py:16-243): instead of mutating per-step
Python lists and re-batching active instances, we keep a dense
[beam, max_len] token buffer, decode the full (causally-masked) prefix each
step, and advance all beams with a single top-k — the whole search is one
compiled XLA program. Finished beams are frozen by forcing their continuation
distribution to a zero-cost PAD.

Single-sentence (batch=1) search, beam semantics matching the reference:
scores are summed log-probs; the first step expands only beam 0.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def beam_search(
    decode_logits: Callable[[jnp.ndarray, int], jnp.ndarray],
    max_len: int,
    beam_size: int,
    bos_id: int,
    eos_id: int,
    pad_id: int = 0,
):
    """Run beam search.

    decode_logits(seqs [beam, max_len+1], step) -> log-probs [beam, V] for the
    token at position `step` (i.e. conditioned on seqs[:, :step+1] with causal
    masking; later positions in the buffer are PAD and must be masked by the
    caller's causal attention).

    Returns (best_seq [max_len] int32 including trailing PADs, best_score).
    """

    def step_fn(state, step):
        seqs, scores, finished = state
        logprobs = decode_logits(seqs, step)              # [beam, V]
        vocab = logprobs.shape[-1]

        # Frozen continuation for finished beams: PAD with zero added cost.
        frozen = jnp.full((vocab,), NEG_INF).at[pad_id].set(0.0)
        logprobs = jnp.where(finished[:, None], frozen[None, :], logprobs)

        # First step: only beam 0 may expand (all beams share the BOS state).
        first = step == 0
        beam_valid = jnp.where(
            first, jnp.arange(beam_size) == 0, jnp.ones(beam_size, bool))
        combined = scores[:, None] + logprobs
        combined = jnp.where(beam_valid[:, None], combined, NEG_INF)

        flat = combined.reshape(-1)
        top_scores, top_idx = jax.lax.top_k(flat, beam_size)
        src_beam = top_idx // vocab
        token = top_idx % vocab

        new_seqs = seqs[src_beam].at[:, step + 1].set(token)
        new_finished = finished[src_beam] | (token == eos_id)
        return (new_seqs, top_scores, new_finished), None

    seqs0 = jnp.full((beam_size, max_len + 1), pad_id, jnp.int32)
    seqs0 = seqs0.at[:, 0].set(bos_id)
    scores0 = jnp.zeros((beam_size,))
    finished0 = jnp.zeros((beam_size,), bool)

    (seqs, scores, finished), _ = jax.lax.scan(
        step_fn, (seqs0, scores0, finished0), jnp.arange(max_len))

    best = jnp.argmax(scores)
    return seqs[best, 1:], scores[best]


def sample_decode(
    decode_logits: Callable[[jnp.ndarray, int], jnp.ndarray],
    rng: jax.Array,
    max_len: int,
    bos_id: int,
    eos_id: int,
    pad_id: int = 0,
    top_k: int = 10,
    temperature: float = 1.0,
    min_len: int = 0,
):
    """Top-k temperature sampling (the fairseq-style decode used by the
    TeleMelody models: sampling=True, sampling_topk=K, temperature=T,
    min_len). Single sequence; decode_logits contract as in beam_search but
    with a [1, max_len+1] buffer. Returns tokens [max_len] (PAD after EOS)."""

    def step_fn(carry, step):
        tokens, finished, rng = carry
        logprobs = decode_logits(tokens, step)[0] / temperature
        # forbid EOS before min_len
        logprobs = jnp.where(
            (step < min_len) & (jnp.arange(logprobs.shape[-1]) == eos_id),
            NEG_INF, logprobs)
        vals, idx = jax.lax.top_k(logprobs, top_k)
        rng, sub = jax.random.split(rng)
        choice = jax.random.categorical(sub, vals)
        nxt = idx[choice]
        nxt = jnp.where(finished, pad_id, nxt)
        finished = finished | (nxt == eos_id)
        tokens = tokens.at[0, step + 1].set(nxt)
        return (tokens, finished, rng), None

    tokens0 = jnp.full((1, max_len + 1), pad_id, jnp.int32).at[0, 0].set(bos_id)
    (tokens, _, _), _ = jax.lax.scan(
        step_fn, (tokens0, jnp.asarray(False), rng), jnp.arange(max_len))
    return tokens[0, 1:]

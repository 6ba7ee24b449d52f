"""Sequence-model training steps (melody transformer, lyric LMs).

The reference ships no training code for these either; these are the standard
objectives: label-smoothed CE for the lyric->note enc-dec, plain CE for the
LMs, MSE in log-duration space for the MSE duration head, SDP NLL for the
flow duration head.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def cross_entropy(logits, targets, pad_id: int = 0,
                  label_smoothing: float = 0.0):
    """logits [B,T,V] (log-probs or raw — softmax applied), targets [B,T]."""
    vocab = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(targets, vocab)
    if label_smoothing > 0:
        onehot = onehot * (1 - label_smoothing) + label_smoothing / vocab
    nll = -jnp.sum(onehot * logp, axis=-1)
    mask = (targets != pad_id).astype(nll.dtype)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def melody_note_loss(model, params, batch, dropout_rng):
    """Teacher-forced lyric->note loss. batch: src, tgt_in, tgt_out, masks."""
    from ..models.melody.transformer import causal_mask
    src, tgt_in, tgt_out = batch["src"], batch["tgt_in"], batch["tgt_out"]
    src_attn = (src != 0)[:, None, None, :].astype(jnp.int32)
    tmask = causal_mask(tgt_in.shape[1])
    logits = model.apply(params, src, tgt_in, src_attn, tmask,
                         deterministic=False, rngs={"dropout": dropout_rng})
    return cross_entropy(logits, tgt_out, label_smoothing=0.1)


def melody_note_prev_loss(model, params, batch, dropout_rng):
    """Teacher-forced loss THROUGH the previous-sentence dot-attention
    memory (api._beam_impl use_prev path; transformer_melody/model.py
    :349-362) — trains the cross-sentence conditioning the serving pipeline
    uses for every sentence after the first."""
    from ..models.melody.transformer import MelodyTransformer, causal_mask
    src, tgt_in, tgt_out = batch["src"], batch["tgt_in"], batch["tgt_out"]
    src_attn = (src != 0)[:, None, None, :].astype(jnp.int32)
    rngs = {"dropout": dropout_rng}
    memory, mem_mask = model.apply(params, src, src_attn, batch["prev"],
                                   deterministic=False, rngs=rngs,
                                   method=MelodyTransformer.prev_memory)
    out = model.apply(params, memory, mem_mask, tgt_in,
                      causal_mask(tgt_in.shape[1]), deterministic=False,
                      rngs=rngs, method=MelodyTransformer.decode)
    logits = model.apply(params, out, method=MelodyTransformer.logits)
    return cross_entropy(logits, tgt_out, label_smoothing=0.1)


def duration_mse_loss(model, params, batch, dropout_rng):
    """log-duration regression (MSE family): targets in centiseconds."""
    src = batch["src"]
    src_attn = (src != 0)[:, None, None, :].astype(jnp.int32)
    out = model.apply(params, src, src_attn, deterministic=False,
                      rngs={"dropout": dropout_rng})
    target = jnp.log1p(batch["durations_cs"].astype(jnp.float32))
    mask = (src != 0).astype(jnp.float32)
    return jnp.sum(((out - target) ** 2) * mask) / jnp.maximum(mask.sum(), 1.0)


def duration_sdp_loss(model, params, batch, dropout_rng):
    """Flow NLL of ground-truth durations under the stochastic duration
    predictor (the SDP family, transformer_melody/Lyric2Duration)."""
    nll = model.apply(params, batch["src"],
                      batch["durations_cs"].astype(jnp.float32),
                      rngs={"dropout": dropout_rng,
                            "noise": jax.random.fold_in(dropout_rng, 1)})
    return jnp.sum(nll)


def lm_loss(model, params, batch, dropout_rng=None):
    """Causal LM loss for GPT-2: predict ids[t+1] from ids[<=t]."""
    ids = batch["ids"]
    logits = model.apply(params, ids[:, :-1])
    return cross_entropy(logits, ids[:, 1:], pad_id=batch.get("pad_id", 0))


def t5_loss(model, params, batch, dropout_rng=None):
    """Seq2seq CE for the T5 lyric generator: (src, src_mask, tgt)."""
    src, tgt = batch["src"], batch["tgt"]
    src_mask = (src != 0).astype(jnp.int32)
    tgt_in = jnp.pad(tgt[:, :-1], ((0, 0), (1, 0)))  # shift right, BOS=pad=0
    logits = model.apply(params, src, src_mask, tgt_in)
    return cross_entropy(logits, tgt, pad_id=0)


def seq2seq_family_loss(models, params, batch, dropout_rng):
    """Joint CE over the three RNN models of the melody_v2 family
    (lyric2note, lyric2duration, note2duration — Melody/seq2seq).
    Seq2SeqModel.__call__ is the shared length-masked teacher-forced
    forward, identical in conventions to the serving beam decode."""
    wiring = (("lyric2note", "lyric_src", "note_in", "note_out"),
              ("lyric2duration", "lyric_src", "dur_in", "dur_out"),
              ("note2duration", "note_src", "dur_in", "dur_out"))
    total = 0.0
    for name, s, ti, to in wiring:
        lp = models[name].apply(params[name], batch[s], batch[ti])
        total = total + cross_entropy(lp, batch[to])
    return total


def telemelody_family_loss(models, params, batch, dropout_rng):
    """Joint CE over TeleMelody's twin transformers (lyric2rhythm +
    trend2melody, Melody/telemelody). Sources carry the trailing EOS the
    sampler feeds (telemelody.py _sample: src_ids + [EOS])."""
    from ..models.melody.transformer import causal_mask
    total = 0.0
    r1, r2 = jax.random.split(dropout_rng)
    for name, rng in (("lyric2rhythm", r1), ("trend2melody", r2)):
        src = batch[f"{name}_src"]
        tgt_in = batch[f"{name}_in"]
        src_attn = (src != 0)[:, None, None, :].astype(jnp.int32)
        logits = models[name].apply(
            params[name], src, tgt_in, src_attn,
            causal_mask(tgt_in.shape[1]), deterministic=False,
            rngs={"dropout": rng})
        total = total + cross_entropy(logits, batch[f"{name}_out"],
                                      label_smoothing=0.1)
    return total


def make_seq_train_step(loss_fn, model, optimizer):
    """Generic optax train step factory for the sequence models."""

    def step(params, opt_state, batch, rng):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(model, p, batch, rng))(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step

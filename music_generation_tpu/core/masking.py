"""Shape/mask utilities shared by all models (jit-safe, static shapes).

Parity notes: sequence_mask / generate_path / rand_slice_segments mirror
VISinger/commons.py:48-160, re-expressed for [B, T, C] channels-last layout
and XLA (gather/cumsum instead of Python loops).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sequence_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """[B] lengths -> [B, T] bool mask."""
    pos = jnp.arange(max_length, dtype=lengths.dtype)
    return pos[None, :] < lengths[:, None]


def feature_mask(lengths: jnp.ndarray, max_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """[B] lengths -> [B, T, 1] float mask (broadcasts over channels)."""
    return sequence_mask(lengths, max_length)[..., None].astype(dtype)


def generate_path(durations: jnp.ndarray, t_y: int) -> jnp.ndarray:
    """Monotonic alignment path from integer durations.

    durations: [B, T_x] ints. Returns [B, T_y, T_x] one-hot-per-frame path
    (frame f attends to the token whose cumulative span contains f).
    """
    cum = jnp.cumsum(durations, axis=-1)                      # [B, Tx]
    frame = jnp.arange(t_y)[None, :, None]                    # [1, Ty, 1]
    path = (frame < cum[:, None, :]).astype(jnp.float32)
    path = path - jnp.pad(path, ((0, 0), (0, 0), (1, 0)))[:, :, :-1]
    return path


def expand_by_durations(x: jnp.ndarray, durations: jnp.ndarray, t_y: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Length-regulate token features to frames by integer durations (gather).

    x: [B, T_x, C]; durations: [B, T_x] int32. Returns ([B, t_y, C] expanded,
    [B] frame lengths). Frames past the total duration repeat the final valid
    index; mask with `feature_mask(lengths, t_y)` downstream.

    TPU-first replacement for the reference's per-token Python expand loop
    (VISinger/models.py:705-739): one cumsum + one searchsorted + one gather,
    all batched.
    """
    cum = jnp.cumsum(durations, axis=-1)                      # [B, Tx]
    lengths = cum[:, -1]
    frames = jnp.arange(t_y, dtype=cum.dtype)
    # token index owning each frame: first token whose cumsum exceeds frame
    idx = jax.vmap(lambda c: jnp.searchsorted(c, frames, side="right"))(cum)
    idx = jnp.minimum(idx, x.shape[1] - 1)
    out = jnp.take_along_axis(x, idx[..., None], axis=1)
    return out, lengths


def slice_segments(x: jnp.ndarray, starts: jnp.ndarray, segment_size: int) -> jnp.ndarray:
    """Gather fixed-size time slices: x [B, T, C], starts [B] -> [B, S, C]."""
    def one(xb, s):
        return jax.lax.dynamic_slice_in_dim(xb, s, segment_size, axis=0)
    return jax.vmap(one)(x, starts)


def rand_slice_segments(rng, x: jnp.ndarray, lengths: jnp.ndarray, segment_size: int):
    """Random training slice per batch item. Returns (slices [B,S,C], starts [B])."""
    b = x.shape[0]
    max_start = jnp.maximum(lengths - segment_size + 1, 1)
    u = jax.random.uniform(rng, (b,))
    starts = (u * max_start).astype(jnp.int32)
    return slice_segments(x, starts, segment_size), starts

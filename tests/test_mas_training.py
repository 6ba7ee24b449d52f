"""MAS duration targets: valid monotonic alignment from model statistics."""

import jax
import jax.numpy as jnp
import numpy as np

from music_generation_tpu.train.losses import mas_duration_targets


def test_mas_duration_targets_partition_frames():
    rng = np.random.RandomState(0)
    B, F, T, C = 2, 24, 6, 4
    z_p = jnp.asarray(rng.randn(B, F, C), jnp.float32)
    m_p = jnp.asarray(rng.randn(B, T, C), jnp.float32)
    logs_p = jnp.asarray(rng.randn(B, T, C) * 0.1, jnp.float32)
    y_len = np.array([24, 18])
    x_len = np.array([6, 4])
    y_mask = (np.arange(F)[None, :] < y_len[:, None])[..., None].astype(np.float32)
    x_mask = (np.arange(T)[None, :] < x_len[:, None])[..., None].astype(np.float32)

    d = np.asarray(mas_duration_targets(z_p, m_p, logs_p,
                                        jnp.asarray(x_mask),
                                        jnp.asarray(y_mask)))
    assert d.shape == (B, T)
    # durations partition the valid frames exactly
    np.testing.assert_array_equal(d.sum(1), y_len)
    # each valid phone gets at least one frame, padding gets none
    for i in range(B):
        assert (d[i, : x_len[i]] >= 1).all()
        assert (d[i, x_len[i]:] == 0).all()


def test_mas_targets_prefer_matching_tokens():
    """A frame sequence that walks through token prototypes should align
    each frame block to its matching token."""
    T, per = 4, 5
    C = 8
    protos = np.eye(T, C).astype(np.float32) * 3
    z_p = jnp.asarray(np.repeat(protos, per, axis=0)[None])     # [1, 20, C]
    m_p = jnp.asarray(protos[None])                             # [1, 4, C]
    logs_p = jnp.zeros((1, T, C), jnp.float32)
    y_mask = jnp.ones((1, T * per, 1))
    x_mask = jnp.ones((1, T, 1))
    d = np.asarray(mas_duration_targets(z_p, m_p, logs_p, x_mask, y_mask))
    np.testing.assert_array_equal(d[0], [per] * T)

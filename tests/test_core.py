"""Unit tests for core blocks: shapes, masking, flow invertibility."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music_generation_tpu.core import (
    ConvFlow, ElementwiseAffine, LogFlow, ResidualCouplingBlock, Conv1d,
    ConvTranspose1d, TransformerEncoder, WaveNet, expand_by_durations,
    feature_mask, generate_path, rand_slice_segments, sequence_mask,
)


def test_sequence_mask():
    m = sequence_mask(jnp.array([2, 4]), 5)
    np.testing.assert_array_equal(
        np.asarray(m), [[1, 1, 0, 0, 0], [1, 1, 1, 1, 0]])


def test_generate_path():
    d = jnp.array([[2, 1, 3]])
    p = generate_path(d, 6)
    want = np.zeros((1, 6, 3))
    want[0, 0:2, 0] = 1
    want[0, 2, 1] = 1
    want[0, 3:6, 2] = 1
    np.testing.assert_array_equal(np.asarray(p), want)


def test_expand_by_durations_matches_repeat():
    x = jnp.arange(12, dtype=jnp.float32).reshape(1, 4, 3)
    d = jnp.array([[1, 3, 0, 2]])
    out, lengths = expand_by_durations(x, d, 8)
    assert int(lengths[0]) == 6
    got = np.asarray(out[0, :6])
    want = np.concatenate([
        np.repeat(np.asarray(x[0, i:i+1]), int(d[0, i]), axis=0)
        for i in range(4)])
    np.testing.assert_array_equal(got, want)


def test_conv1d_shape_and_dilation():
    x = jnp.ones((2, 16, 8))
    y = Conv1d(12, kernel_size=3, dilation=2).init_with_output(
        jax.random.PRNGKey(0), x)[0]
    assert y.shape == (2, 16, 12)


def test_conv_transpose_upsamples_exactly():
    x = jnp.ones((1, 10, 4))
    for k, u in [(16, 8), (4, 2)]:
        y = ConvTranspose1d(4, k, u).init_with_output(
            jax.random.PRNGKey(0), x)[0]
        assert y.shape == (1, 10 * u, 4), (k, u, y.shape)


def test_transformer_encoder_mask_invariance():
    """Padding positions must not affect valid outputs."""
    enc = TransformerEncoder(hidden_channels=32, filter_channels=64,
                             n_heads=2, n_layers=2, kernel_size=3)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 10, 32))
    mask = feature_mask(jnp.array([6]), 10)
    params = enc.init(rng, x, mask)
    y1 = enc.apply(params, x, mask)
    x_noise = x.at[:, 6:].set(999.0)  # corrupt padding
    y2 = enc.apply(params, x_noise, mask)
    np.testing.assert_allclose(np.asarray(y1[:, :6]), np.asarray(y2[:, :6]),
                               rtol=1e-4, atol=1e-4)


def test_wavenet_shapes():
    wn = WaveNet(hidden_channels=16, kernel_size=5, dilation_rate=1, n_layers=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 20, 16))
    mask = feature_mask(jnp.array([20, 15]), 20)
    y, _ = wn.init_with_output(jax.random.PRNGKey(1), x, mask)
    assert y.shape == x.shape
    assert float(jnp.abs(y[1, 15:]).max()) == 0.0  # masked out


@pytest.mark.parametrize("flow_cls,kwargs", [
    (ElementwiseAffine, dict(channels=2)),
    (ConvFlow, dict(in_channels=2, filter_channels=16, kernel_size=3, n_layers=2)),
])
def test_flow_invertibility(flow_cls, kwargs):
    flow = flow_cls(**kwargs)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 12, 2))
    mask = feature_mask(jnp.array([12, 12]), 12)
    params = flow.init(rng, x, mask)
    y, logdet = flow.apply(params, x, mask, reverse=False)
    x_rec = flow.apply(params, y, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_rec),
                               rtol=1e-4, atol=1e-4)
    assert logdet.shape == (2,)


def test_residual_coupling_block_invertible():
    block = ResidualCouplingBlock(channels=8, hidden_channels=16,
                                  kernel_size=5, dilation_rate=1, n_layers=2)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 12, 8))
    mask = feature_mask(jnp.array([12, 10]), 12)
    params = block.init(rng, x, mask)
    z = block.apply(params, x, mask, reverse=False)
    x_rec = block.apply(params, z, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(x * mask), np.asarray(x_rec),
                               rtol=1e-4, atol=1e-4)


def test_log_flow_roundtrip():
    flow = LogFlow()
    x = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (1, 5, 1))) + 0.1
    mask = jnp.ones((1, 5, 1))
    params = flow.init(jax.random.PRNGKey(1), x, mask)
    y, _ = flow.apply(params, x, mask)
    x_rec = flow.apply(params, y, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_rec),
                               rtol=1e-4, atol=1e-5)


def test_rand_slice_segments():
    x = jnp.arange(40, dtype=jnp.float32).reshape(1, 20, 2)
    seg, starts = rand_slice_segments(jax.random.PRNGKey(0), x,
                                      jnp.array([20]), 8)
    assert seg.shape == (1, 8, 2)
    s = int(starts[0])
    np.testing.assert_array_equal(np.asarray(seg[0]), np.asarray(x[0, s:s+8]))

"""Monotonic alignment search: jax/lax implementation vs numpy oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from music_generation_tpu.ops import maximum_path_jax, maximum_path_numpy


def _random_case(b=3, t_y=17, t_x=9, seed=0, ragged=True):
    rng = np.random.RandomState(seed)
    neg_cent = rng.randn(b, t_y, t_x).astype(np.float32)
    mask = np.ones((b, t_y, t_x), np.float32)
    if ragged:
        for i in range(b):
            ty = rng.randint(t_x, t_y + 1)
            tx = rng.randint(2, min(t_x, ty) + 1)
            mask[i, ty:, :] = 0
            mask[i, :, tx:] = 0
    return neg_cent, mask


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_jax_matches_numpy_oracle(seed):
    neg_cent, mask = _random_case(seed=seed)
    want = maximum_path_numpy(neg_cent, mask)
    got = np.asarray(maximum_path_jax(jnp.asarray(neg_cent), jnp.asarray(mask)))
    np.testing.assert_array_equal(got, want)


def test_pallas_matches_oracle_on_tpu():
    """Opt-in (RUN_TPU_TESTS=1): the remote Mosaic compile takes minutes over
    the tunnel, so this is excluded from the default suite. Verified green on
    TPU v5e."""
    import os
    if not os.environ.get("RUN_TPU_TESTS"):
        pytest.skip("set RUN_TPU_TESTS=1 to run the TPU pallas check")
    import jax
    from music_generation_tpu.ops import maximum_path_pallas
    tpu_like = [d for d in jax.devices() if d.platform != "cpu"]
    if not tpu_like:
        pytest.skip("no TPU device")
    neg_cent, mask = _random_case(b=2, t_y=64, t_x=16, seed=5)
    want = maximum_path_numpy(neg_cent, mask)
    got = np.asarray(maximum_path_pallas(
        jax.device_put(jnp.asarray(neg_cent), tpu_like[0]),
        jax.device_put(jnp.asarray(mask), tpu_like[0])))
    np.testing.assert_array_equal(got, want)


def test_path_properties():
    neg_cent, mask = _random_case(b=2, seed=3, ragged=False)
    path = np.asarray(maximum_path_jax(jnp.asarray(neg_cent),
                                       jnp.asarray(mask)))
    # exactly one token per frame
    np.testing.assert_array_equal(path.sum(-1), np.ones(path.shape[:2]))
    # monotonic non-decreasing token index
    idx = path.argmax(-1)
    assert (np.diff(idx, axis=1) >= 0).all()
    # starts at token 0, ends at last token
    assert (idx[:, 0] == 0).all()
    assert (idx[:, -1] == path.shape[2] - 1).all()

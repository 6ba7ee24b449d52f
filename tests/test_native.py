"""Native C++ runtime tests."""

import numpy as np
import pytest

from music_generation_tpu.ops import maximum_path_numpy
from music_generation_tpu.runtime import maximum_path_native, native_available


@pytest.mark.skipif(not native_available(), reason="g++/make unavailable")
def test_native_matches_oracle():
    rng = np.random.RandomState(7)
    neg = rng.randn(8, 33, 15).astype(np.float32)
    mask = np.ones_like(neg)
    for i in range(8):
        ty = rng.randint(15, 34)
        tx = rng.randint(2, min(15, ty) + 1)
        mask[i, ty:, :] = 0
        mask[i, :, tx:] = 0
    want = maximum_path_numpy(neg.copy(), mask)
    got = maximum_path_native(neg.copy(), mask)
    np.testing.assert_array_equal(want, got)

"""Indexed binary dataset (runtime/indexed_dataset.py + native C++ reader)
and the prefetching loader.

Reference surface: VISinger/utils/indexed_datasets.py (pickled IndexedDataset
/ IndexedDatasetBuilder) and utils/multiprocess_utils.py (parallel
preprocessing); rebuilt pickle-free with an mmap/OpenMP native path.
"""

import struct

import numpy as np
import pytest

from music_generation_tpu.runtime import (IndexedDataset,
                                          IndexedDatasetBuilder, Prefetcher)
from music_generation_tpu.runtime.indexed_dataset import (decode_item,
                                                          encode_item)
from music_generation_tpu.runtime.native_loader import _load


def _items(n=7, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for i in range(n):
        out.append({
            "a": rng.normal(size=(i + 1, 3)).astype(np.float32),
            "b": rng.randint(0, 100, size=(i + 2,)).astype(np.int32),
            "name": np.frombuffer(f"utt{i:03d}".encode(), np.uint8),
        })
    return out


def _assert_item_equal(x, y):
    assert sorted(x) == sorted(y)
    for k in x:
        assert x[k].dtype == y[k].dtype, k
        np.testing.assert_array_equal(x[k], y[k])


def test_encode_decode_roundtrip():
    for item in _items():
        _assert_item_equal(decode_item(encode_item(item)), item)


def test_encode_rejects_unsupported_dtype():
    with pytest.raises(TypeError):
        encode_item({"s": np.array(["x"], dtype=object)})


def test_builder_reader_roundtrip(tmp_path):
    items = _items()
    path = str(tmp_path / "ds")
    b = IndexedDatasetBuilder(path)
    for k, item in enumerate(items):
        assert b.add_item(item) == k
    b.finalize()
    with IndexedDataset(path) as ds:
        assert len(ds) == len(items)
        for k, item in enumerate(items):
            _assert_item_equal(ds[k], item)
        # batched gather, repeated + out-of-order ids
        got = ds.read_batch([3, 0, 3, 6])
        for g, k in zip(got, [3, 0, 3, 6]):
            _assert_item_equal(g, items[k])
        with pytest.raises(IndexError):
            ds[len(items)]
        with pytest.raises(IndexError):
            ds.read_batch([0, -1])


class _PyOnly:
    """Context manager forcing the pure-Python file path."""

    def __enter__(self):
        import music_generation_tpu.runtime.indexed_dataset as mod
        self.mod = mod
        self.orig = mod._load
        mod._load = lambda: None
        return self

    def __exit__(self, *exc):
        self.mod._load = self.orig


def test_python_and_native_paths_are_byte_identical(tmp_path):
    if _load() is None or not hasattr(_load(), "idx_reader_open"):
        pytest.skip("native library unavailable")
    items = _items(seed=1)
    with _PyOnly():
        b = IndexedDatasetBuilder(str(tmp_path / "py"))
        for item in items:
            b.add_item(item)
        b.finalize()
    b = IndexedDatasetBuilder(str(tmp_path / "nat"))
    for item in items:
        b.add_item(item)
    b.finalize()
    for ext in (".data", ".idx"):
        py = (tmp_path / f"py{ext}").read_bytes()
        nat = (tmp_path / f"nat{ext}").read_bytes()
        assert py == nat, ext
    # native-written files readable by the python reader and vice versa
    with _PyOnly():
        ds = IndexedDataset(str(tmp_path / "nat"))
        _assert_item_equal(ds[2], items[2])
        ds.close()
    with IndexedDataset(str(tmp_path / "py")) as ds:
        _assert_item_equal(ds[2], items[2])


def test_index_magic_checked(tmp_path):
    (tmp_path / "bad.data").write_bytes(b"")
    (tmp_path / "bad.idx").write_bytes(b"NOTMAGIC" + struct.pack("<Q", 0))
    with pytest.raises(OSError):
        IndexedDataset(str(tmp_path / "bad"))


def test_prefetcher_order_and_values():
    seen = []

    def make(step):
        seen.append(step)
        return {"x": np.full((2,), step, np.int32)}

    pf = Prefetcher(make, n_steps=5, depth=2)
    got = [(s, int(b["x"][0])) for s, b in pf]
    assert got == [(i, i) for i in range(5)]
    assert sorted(seen) == list(range(5))


def test_prefetcher_propagates_producer_error():
    def make(step):
        if step == 2:
            raise ValueError("boom")
        return {"x": np.zeros(1)}

    pf = Prefetcher(make, n_steps=5, depth=1)
    it = iter(pf)
    next(it)
    next(it)
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_prefetcher_transfer_runs_on_producer():
    pf = Prefetcher(lambda s: {"x": np.full(3, s)}, n_steps=3, depth=2,
                    transfer=lambda b: {k: v + 1 for k, v in b.items()})
    vals = [int(b["x"][0]) for _, b in pf]
    assert vals == [1, 2, 3]


def test_prefetcher_close_unblocks_producer():
    pf = Prefetcher(lambda s: {"x": np.zeros(1)}, n_steps=100, depth=1)
    it = iter(pf)
    next(it)
    pf.close()  # must not hang

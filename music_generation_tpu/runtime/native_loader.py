"""ctypes loader for the native C++ runtime library (auto-builds with g++)."""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "native")
_SO = os.path.join(_DIR, "libmga_native.so")


@functools.lru_cache(maxsize=1)
def _load():
    try:
        # no-op when up to date; rebuilds when a source file is newer
        subprocess.run(["make", "-C", _DIR], check=True, capture_output=True)
    except Exception:
        if not os.path.exists(_SO):
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.maximum_path_c.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.maximum_path_c.restype = None
    c = ctypes
    try:
        lib.idx_builder_open.argtypes = [c.c_char_p]
        lib.idx_builder_open.restype = c.c_void_p
        lib.idx_builder_add.argtypes = [c.c_void_p, c.c_char_p, c.c_int64]
        lib.idx_builder_add.restype = c.c_int64
        lib.idx_builder_finalize.argtypes = [c.c_void_p, c.c_char_p]
        lib.idx_builder_finalize.restype = c.c_int
        lib.idx_reader_open.argtypes = [c.c_char_p]
        lib.idx_reader_open.restype = c.c_void_p
        lib.idx_reader_len.argtypes = [c.c_void_p]
        lib.idx_reader_len.restype = c.c_int64
        lib.idx_reader_size.argtypes = [c.c_void_p, c.c_int64]
        lib.idx_reader_size.restype = c.c_int64
        lib.idx_reader_ptr.argtypes = [c.c_void_p, c.c_int64]
        lib.idx_reader_ptr.restype = c.c_void_p
        lib.idx_reader_gather.argtypes = [
            c.c_void_p, c.POINTER(c.c_int64), c.c_int, c.c_char_p,
            c.POINTER(c.c_int64)]
        lib.idx_reader_gather.restype = None
        lib.idx_reader_close.argtypes = [c.c_void_p]
        lib.idx_reader_close.restype = None
        lib.yin_f0_c.argtypes = [
            c.POINTER(c.c_float), c.c_int64, c.c_int, c.c_int, c.c_int,
            c.c_float, c.c_float, c.c_float, c.POINTER(c.c_float), c.c_int64]
        lib.yin_f0_c.restype = None
    except AttributeError:
        pass  # stale .so without the newer symbols; callers fall back
    return lib


def native_available() -> bool:
    return _load() is not None


def yin_f0_native(wav: np.ndarray, sample_rate: int = 22050, hop: int = 256,
                  frame_length: int = 2048, fmin: float = 60.0,
                  fmax: float = 1000.0, threshold: float = 0.15,
                  lp_hz: float = 4000.0) -> np.ndarray:
    """Same contract as audio.f0.yin_f0, but C++/OpenMP (native/yin.cc).
    The anti-imaging prefilter (audio.f0._yin_prefilter) runs here in numpy
    so both twins see byte-identical input."""
    lib = _load()
    if lib is None or not hasattr(lib, "yin_f0_c"):
        raise RuntimeError("native library unavailable or stale")
    from ..audio.f0 import _yin_prefilter
    wav = _yin_prefilter(wav, sample_rate, lp_hz)
    wav = np.ascontiguousarray(np.asarray(wav).reshape(-1), dtype=np.float32)
    n_frames = 1 + len(wav) // hop
    out = np.zeros(n_frames, dtype=np.float32)
    lib.yin_f0_c(
        wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(len(wav)), sample_rate, hop, frame_length,
        ctypes.c_float(fmin), ctypes.c_float(fmax), ctypes.c_float(threshold),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n_frames))
    return out


def maximum_path_native(neg_cent: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Same contract as ops.monotonic_align.maximum_path_numpy, but C++/OpenMP."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable (g++/make failed?)")
    b, t_y, t_x = neg_cent.shape
    values = np.ascontiguousarray(neg_cent * mask, dtype=np.float32)
    paths = np.zeros((b, t_y, t_x), dtype=np.int32)
    t_ys = np.ascontiguousarray(mask[:, :, 0].sum(1), dtype=np.int32)
    t_xs = np.ascontiguousarray(mask[:, 0, :].sum(1), dtype=np.int32)
    lib.maximum_path_c(
        paths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t_ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t_xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b, t_y, t_x)
    return paths.astype(np.float32) * mask

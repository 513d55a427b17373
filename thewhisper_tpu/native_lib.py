"""ctypes bindings for the C++ host runtime (native/whisper_host.cpp).

The library is built on demand (g++ is in the image) and cached; every
consumer has a pure-python fallback, so the package works without a
compiler. ``WHISPER_NATIVE=0`` disables native paths entirely.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO_ROOT, "native", "whisper_host.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libwhisper_host.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", _LIB, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if os.environ.get("WHISPER_NATIVE", "1") == "0":
        return None
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
            if not os.path.exists(_SRC) or not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None

        lib.whisper_dtw_path.restype = ctypes.c_int
        lib.whisper_dtw_path.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.whisper_edit_stats.restype = None
        lib.whisper_edit_stats.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32)]
        lib.whisper_ring_new.restype = ctypes.c_void_p
        lib.whisper_ring_new.argtypes = [ctypes.c_size_t]
        lib.whisper_ring_free.argtypes = [ctypes.c_void_p]
        lib.whisper_ring_write.restype = ctypes.c_size_t
        lib.whisper_ring_write.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_size_t]
        lib.whisper_ring_peek.restype = ctypes.c_size_t
        lib.whisper_ring_peek.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_size_t, ctypes.c_size_t]
        lib.whisper_ring_discard.restype = ctypes.c_size_t
        lib.whisper_ring_discard.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
        lib.whisper_ring_size.restype = ctypes.c_size_t
        lib.whisper_ring_size.argtypes = [ctypes.c_void_p]
        lib.whisper_ring_clear.argtypes = [ctypes.c_void_p]
        lib.whisper_resample_linear.restype = ctypes.c_size_t
        lib.whisper_resample_linear.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_size_t, ctypes.c_double,
            ctypes.POINTER(ctypes.c_float), ctypes.c_size_t]
        _lib = lib
        return _lib


def dtw_path_native(cost: np.ndarray):
    """Native DTW; returns (text_idx, time_idx) or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    cost = np.ascontiguousarray(cost, dtype=np.float64)
    s, t = cost.shape
    text = np.empty(s + t, dtype=np.int32)
    time_ = np.empty(s + t, dtype=np.int32)
    n = lib.whisper_dtw_path(
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), s, t,
        text.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        time_.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return text[:n].astype(np.int64), time_[:n].astype(np.int64)


def edit_stats_native(ref_ids: np.ndarray, hyp_ids: np.ndarray):
    """Native Levenshtein stats dict or None."""
    lib = get_lib()
    if lib is None:
        return None
    ref_ids = np.ascontiguousarray(ref_ids, dtype=np.int32)
    hyp_ids = np.ascontiguousarray(hyp_ids, dtype=np.int32)
    out = np.zeros(5, dtype=np.int32)
    lib.whisper_edit_stats(
        ref_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(ref_ids),
        hyp_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(hyp_ids),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return {"subs": int(out[0]), "dels": int(out[1]), "ins": int(out[2]),
            "hits": int(out[3]), "errors": int(out[4]),
            "ref_len": len(ref_ids), "hyp_len": len(hyp_ids)}


def resample_linear_native(audio: np.ndarray, ratio: float):
    """Native linear resampler; None when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    out_cap = int(len(audio) * ratio + 2)
    out = np.empty(out_cap, dtype=np.float32)
    n = lib.whisper_resample_linear(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(audio),
        ctypes.c_double(ratio),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out_cap)
    return out[:n]


class RingBuffer:
    """Growable float32 audio ring buffer over the native core.

    Falls back to a numpy deque-of-chunks when the library is missing.
    """

    def __init__(self, capacity: int = 1 << 18):
        self._lib = get_lib()
        if self._lib is not None:
            self._h = self._lib.whisper_ring_new(capacity)
        else:
            self._chunks = []
            self._n = 0

    def write(self, samples: np.ndarray) -> None:
        samples = np.ascontiguousarray(samples, dtype=np.float32)
        if self._lib is not None:
            self._lib.whisper_ring_write(
                self._h,
                samples.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                len(samples))
        else:
            self._chunks.append(samples.copy())
            self._n += len(samples)

    def __len__(self) -> int:
        if self._lib is not None:
            return int(self._lib.whisper_ring_size(self._h))
        return self._n

    def peek(self, n: Optional[int] = None, offset: int = 0) -> np.ndarray:
        total = len(self)
        n = total - offset if n is None else min(n, total - offset)
        n = max(n, 0)
        out = np.empty(n, dtype=np.float32)
        if n == 0:
            return out
        if self._lib is not None:
            got = self._lib.whisper_ring_peek(
                self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                offset, n)
            return out[:got]
        flat = np.concatenate(self._chunks) if self._chunks else np.empty(0, np.float32)
        return flat[offset:offset + n]

    def discard(self, n: int) -> None:
        if self._lib is not None:
            self._lib.whisper_ring_discard(self._h, n)
            return
        flat = np.concatenate(self._chunks) if self._chunks else np.empty(0, np.float32)
        flat = flat[n:]
        self._chunks = [flat] if len(flat) else []
        self._n = len(flat)

    def clear(self) -> None:
        if self._lib is not None:
            self._lib.whisper_ring_clear(self._h)
        else:
            self._chunks = []
            self._n = 0

    def __del__(self):
        if getattr(self, "_lib", None) is not None:
            try:
                self._lib.whisper_ring_free(self._h)
            except Exception:
                pass

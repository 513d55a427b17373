"""Identity-keyed host->device transfer cache.

Why this exists: the axon PJRT tunnel (the remote-TPU backend this image
runs on) LEAKS ~payload-sized host RSS on EVERY ``jax.device_put`` of a
host buffer — including re-uploads of the same numpy array — and its
transfer latency collapses superlinearly as leaked buffers accumulate
(measured: a 42 MB upload costs ~0.25 s in a fresh process, ~5 s after
~10 uploads, ~19 s after ~500 MB cumulative; the CPU PJRT backend shows
neither the leak nor the slowdown, so this is plugin-local, not JAX).
Repeatedly transcribing host-resident audio/mel therefore degrades the
whole process.  The mitigation is to never upload the same bytes twice:
this cache maps a host array's *object identity* to its device copy.

Correctness guard: object identity alone is unsafe under in-place
mutation, so each entry stores a CRC fingerprint of every 16th element
of the buffer.  Any contiguous in-place write of >= 16 elements (for
16 kHz audio: >= 1 ms of samples) covers a fully-sampled element and
invalidates the entry when its value changes; scattered sub-16-element
pokes are the only escape, and no audio path writes those.  Entries hold
a strong reference to the host array, so ``id()`` cannot be recycled
while cached; a small LRU bounds both host and device memory.
"""

from __future__ import annotations

import threading
import zlib
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

__all__ = ["DevicePutCache"]


def _fingerprint(a: np.ndarray) -> int:
    """CRC32 over every 16th ELEMENT of the buffer (~2 ms at 50 MB).

    Element-wise (not byte-wise) sampling so all bytes of a sampled
    element enter the CRC: a byte stride sees only the mantissa LSB of
    most float32 elements, which is identical for round values like
    0.0 -> 1.0. Any contiguous in-place write of >= 16 elements covers
    at least one fully-sampled element."""
    flat = a.reshape(-1)
    return zlib.crc32(np.ascontiguousarray(flat[::16]).tobytes())


class DevicePutCache:
    """LRU of device copies keyed by host-array identity + fingerprint.

    ``put(x, transfer)`` returns ``transfer(x)``, cached.  ``transfer``
    is the actual placement function (``jax.device_put`` or a sharded
    variant) — it is part of the cache key domain only through the
    caller using one cache per placement policy.
    """

    def __init__(self, max_entries: int = 4, min_bytes: int = 1 << 22):
        self.max_entries = max_entries
        self.min_bytes = min_bytes
        self._lock = threading.Lock()
        # key -> (host_ref, fingerprint, device_array); dict preserves
        # insertion order = LRU order (re-inserted on hit).
        self._entries: Dict[Tuple[int, Tuple[int, ...], str], Tuple[Any, int, Any]] = {}
        self.hits = 0
        self.misses = 0

    def put(self, x: np.ndarray, transfer: Callable[[np.ndarray], Any]) -> Any:
        if not isinstance(x, np.ndarray) or x.nbytes < self.min_bytes:
            return transfer(x)
        key = (id(x), x.shape, x.dtype.str)
        fp = _fingerprint(x)
        with self._lock:
            hit = self._entries.get(key)
            if hit is not None and hit[0] is x and hit[1] == fp:
                self._entries[key] = self._entries.pop(key)  # refresh LRU
                self.hits += 1
                return hit[2]
        dev = transfer(x)
        with self._lock:
            self.misses += 1
            self._entries[key] = (x, fp, dev)
            while len(self._entries) > self.max_entries:
                self._entries.pop(next(iter(self._entries)))
        return dev

    def clear(self) -> None:
        with self._lock:
            self._entries.clear()

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

__all__ = ["DevicePutCache", "DeltaDevicePutCache"]


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


class DeltaDevicePutCache:
    """Changed-span delta transfer cache for streaming tick audio.

    A streaming tick re-uploads a rolling buffer that is byte-identical
    to the previous tick except for the freshly appended ~0.5 s (the
    window slides by appending inside a zero-padded bucket; trims
    rewrite the prefix). Uploading the full (1, 160000) f32 buffer
    costs ~12 ms/tick over the axon tunnel (tools/stream_stage_probe.py:
    host-audio 60.8 vs device-audio 49.0 ms p50); the changed span is
    ~32 KB.

    ``put(x, transfer)`` keeps ONE host copy + device copy per array
    shape. On the next call it finds the smallest block-aligned span
    outside which the arrays are EXACTLY equal (no fingerprints —
    correctness is equality, ~40 us memcmp for 640 KB), uploads a
    power-of-two bucket covering that span (few splice programs
    compile; the offset is a dynamic argument), and splices it into the
    cached device array with ``dynamic_update_slice``. Falls back to a
    full transfer when more than half the buffer changed.
    """

    #: upload buckets (elements; 16-512 KB for f32 audio)
    _BUCKETS = (4096, 8192, 16384, 32768, 65536, 131072)

    def __init__(self, min_bytes: int = 1 << 16):
        self.min_bytes = min_bytes
        self._lock = threading.Lock()
        self._entries: Dict[Tuple[Tuple[int, ...], str],
                            Tuple[np.ndarray, Any]] = {}
        self._splice_fns: Dict[Tuple[Tuple[int, ...], str, int], Any] = {}
        self.full = 0
        self.delta = 0

    @staticmethod
    def _diff_span(a: np.ndarray, b: np.ndarray) -> Tuple[int, int]:
        """Smallest 4096-element-block-aligned span ``[lo, hi)`` outside
        which the two same-shape arrays are exactly equal. ``(0, 0)``
        when identical. The memcmp over equal blocks dominates
        (~40 us for 640 KB)."""
        fa, fb = a.reshape(-1), b.reshape(-1)
        n = fa.size
        blk = 4096
        nb = (n + blk - 1) // blk
        lo = 0
        while lo < nb:
            s = lo * blk
            if not np.array_equal(fa[s: s + blk], fb[s: s + blk]):
                break
            lo += 1
        if lo == nb:
            return 0, 0
        hi = nb
        while hi > lo + 1:
            s = (hi - 1) * blk
            if not np.array_equal(fa[s: s + blk], fb[s: s + blk]):
                break
            hi -= 1
        return lo * blk, min(hi * blk, n)

    def _splice(self, dev, suffix: np.ndarray, offset: int, transfer):
        import jax
        import jax.numpy as jnp

        key = (tuple(dev.shape), str(suffix.dtype), suffix.shape[-1])
        fn = self._splice_fns.get(key)
        if fn is None:
            def splice(d, s, off):
                idx = (0,) * (d.ndim - 1) + (off,)
                return jax.lax.dynamic_update_slice(d, s, idx)

            fn = jax.jit(splice)
            self._splice_fns[key] = fn
        return fn(dev, transfer(suffix), jnp.int32(offset))

    def put(self, x: np.ndarray, transfer: Callable[[np.ndarray], Any]) -> Any:
        # 2-D (1, N) only: _diff_span works on the FLAT buffer while
        # _splice updates a LAST-DIM slice, and the two coincide only
        # when every leading dim is 1 and there is exactly one data
        # axis. A (1, T, 128) feature-major buffer whose tail frames
        # changed would otherwise be spliced at a flat offset clamped
        # into the last axis — silent corruption.
        if (not isinstance(x, np.ndarray) or x.nbytes < self.min_bytes
                or x.ndim != 2 or x.shape[0] != 1):
            return transfer(x)
        key = (x.shape, x.dtype.str)
        with self._lock:
            ent = self._entries.get(key)
        n = x.size
        if ent is not None:
            prev, dev_prev = ent
            lo, hi = self._diff_span(prev, x)
            if hi == lo:
                return dev_prev
            want = hi - lo
            if want <= n // 2:
                bucket = next((b for b in self._BUCKETS if b >= want),
                              None)
                if bucket is not None and bucket <= n:
                    # Bucket-sized window covering [lo, hi); the splice
                    # offset is a dynamic argument so one program serves
                    # every position.
                    off = min(lo, n - bucket)
                    window = np.ascontiguousarray(
                        x.reshape(-1)[off: off + bucket]).reshape(
                            (1,) * (x.ndim - 1) + (bucket,))
                    dev = self._splice(dev_prev, window, off, transfer)
                    with self._lock:
                        self.delta += 1
                        self._entries[key] = (x.copy(), dev)
                    return dev
        dev = transfer(x)
        with self._lock:
            self.full += 1
            self._entries[key] = (x.copy(), dev)
        return dev

    def clear(self) -> None:
        with self._lock:
            self._entries.clear()

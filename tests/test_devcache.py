"""Identity-keyed device transfer cache (utils/devcache.py).

Exists because the axon PJRT tunnel leaks host RSS per device_put and
its transfer latency degrades as leaks accumulate; the cache guarantees
the same host buffer is never uploaded twice while still detecting
in-place mutation (any contiguous write >= 256 bytes).
"""

import numpy as np
import pytest

from thewhisper_tpu.utils.devcache import (
    DeltaDevicePutCache,
    DevicePutCache,
)


def _transfer_counter():
    calls = []

    def transfer(x):
        calls.append(x)
        return np.array(x, copy=True)   # stands in for the device copy

    return transfer, calls


def test_hit_returns_same_object_without_second_transfer():
    cache = DevicePutCache(min_bytes=0)
    transfer, calls = _transfer_counter()
    a = np.arange(1024, dtype=np.float32)
    d1 = cache.put(a, transfer)
    d2 = cache.put(a, transfer)
    assert d1 is d2
    assert len(calls) == 1
    assert cache.hits == 1 and cache.misses == 1


def test_small_arrays_bypass_the_cache():
    cache = DevicePutCache(min_bytes=1 << 20)
    transfer, calls = _transfer_counter()
    a = np.zeros(16, np.float32)
    cache.put(a, transfer)
    cache.put(a, transfer)
    assert len(calls) == 2 and not cache._entries


def test_contiguous_mutation_invalidates():
    cache = DevicePutCache(min_bytes=0)
    transfer, calls = _transfer_counter()
    a = np.zeros(100_000, np.float32)
    d1 = cache.put(a, transfer)
    # A contiguous in-place write of >= 64 elements (256 bytes) must hit
    # a sampled byte of the 1/64-stride CRC.
    a[5_000:5_064] = 1.0
    d2 = cache.put(a, transfer)
    assert len(calls) == 2
    assert d2[5_000] == 1.0 and d1[5_000] == 0.0


def test_distinct_arrays_with_same_contents_are_distinct_entries():
    cache = DevicePutCache(min_bytes=0)
    transfer, calls = _transfer_counter()
    a = np.zeros(4096, np.float32)
    b = np.zeros(4096, np.float32)
    cache.put(a, transfer)
    cache.put(b, transfer)
    assert len(calls) == 2 and len(cache._entries) == 2


def test_lru_bound_and_strong_ref_pins_id():
    cache = DevicePutCache(max_entries=2, min_bytes=0)
    transfer, calls = _transfer_counter()
    arrays = [np.full(2048, i, np.float32) for i in range(3)]
    for a in arrays:
        cache.put(a, transfer)
    assert len(cache._entries) == 2
    # Oldest evicted -> re-put transfers again.
    cache.put(arrays[0], transfer)
    assert len(calls) == 4
    # Entries hold the host array strongly (id() cannot be recycled).
    assert all(entry[0] is arr
               for entry, arr in zip(cache._entries.values(),
                                     [arrays[2], arrays[0]]))


def test_non_ndarray_passthrough():
    cache = DevicePutCache(min_bytes=0)
    transfer, calls = _transfer_counter()
    out = cache.put([1.0, 2.0], transfer)
    assert len(calls) == 1 and list(out) == [1.0, 2.0]
    assert not cache._entries


def _jnp_transfer_counter():
    """Transfer stub returning real jax arrays (the splice path jits)."""
    import jax.numpy as jnp

    calls = []

    def transfer(x):
        calls.append(np.asarray(x))
        return jnp.asarray(x)

    return transfer, calls


def test_delta_cache_streaming_tick_uploads_only_the_changed_span():
    """The rolling streaming buffer: appended audio inside a zero-padded
    bucket must ship as a small bucket splice, not a full re-upload."""
    cache = DeltaDevicePutCache(min_bytes=0)
    transfer, calls = _jnp_transfer_counter()
    n = 160_000
    buf = np.zeros((1, n), np.float32)
    rng = np.random.default_rng(0)
    frontier = 64_000
    buf[0, :frontier] = rng.standard_normal(frontier)

    d1 = cache.put(buf, transfer)
    assert cache.full == 1 and len(calls) == 1
    np.testing.assert_array_equal(np.asarray(d1), buf)

    # Tick: append 0.5 s (8000 samples) at the frontier.
    buf2 = buf.copy()
    buf2[0, frontier: frontier + 8000] = rng.standard_normal(8000)
    d2 = cache.put(buf2, transfer)
    assert cache.delta == 1 and cache.full == 1
    # The uploaded window is a bucket covering the changed span, far
    # smaller than the buffer (8000 changed -> 16384-element bucket).
    assert calls[-1].size <= 16384
    np.testing.assert_array_equal(np.asarray(d2), buf2)

    # Unchanged re-put: zero transfers.
    n_calls = len(calls)
    d3 = cache.put(buf2.copy(), transfer)
    assert len(calls) == n_calls and d3 is d2


def test_delta_cache_trim_falls_back_to_full_transfer():
    """A buffer trim rewrites the prefix — more than half the elements
    change, so correctness demands a full upload."""
    cache = DeltaDevicePutCache(min_bytes=0)
    transfer, calls = _jnp_transfer_counter()
    rng = np.random.default_rng(1)
    a = rng.standard_normal((1, 100_000)).astype(np.float32)
    cache.put(a, transfer)
    b = np.roll(a, -40_000, axis=1)           # trim: everything shifts
    d = cache.put(b, transfer)
    assert cache.full == 2 and cache.delta == 0
    np.testing.assert_array_equal(np.asarray(d), b)


def test_delta_cache_change_at_the_very_end_is_a_delta():
    cache = DeltaDevicePutCache(min_bytes=0)
    transfer, calls = _jnp_transfer_counter()
    a = np.zeros((1, 65_536), np.float32)
    cache.put(a, transfer)
    b = a.copy()
    b[0, -100:] = 1.0
    d = cache.put(b, transfer)
    assert cache.delta == 1
    np.testing.assert_array_equal(np.asarray(d), b)


def test_delta_cache_bypasses_small_and_batched_arrays():
    cache = DeltaDevicePutCache(min_bytes=1 << 16)
    transfer, calls = _jnp_transfer_counter()
    small = np.zeros((1, 128), np.float32)
    batched = np.zeros((4, 100_000), np.float32)
    cache.put(small, transfer)
    cache.put(batched, transfer)
    assert len(calls) == 2 and not cache._entries


def test_delta_cache_bypasses_3d_arrays():
    """(1, T, C) feature buffers must NOT take the delta path: the diff
    span is computed over the flat buffer but the splice indexes the
    last dim, and the two only coincide for 2-D (1, N). A tail-frame
    change in a feature-major buffer would otherwise be spliced at a
    flat offset clamped into the channel axis — silent corruption."""
    cache = DeltaDevicePutCache(min_bytes=1 << 10)
    transfer, calls = _jnp_transfer_counter()
    a = np.zeros((1, 400, 128), np.float32)
    b = a.copy()
    b[0, -4:, :] = 1.0   # flat span = the tail -> would pass the n//2 gate
    d1 = cache.put(a, transfer)
    d2 = cache.put(b, transfer)
    assert len(calls) == 2 and not cache._entries and cache.delta == 0
    np.testing.assert_array_equal(np.asarray(d2), b)
    np.testing.assert_array_equal(np.asarray(d1), a)


def test_pipeline_longform_reuses_device_file(tiny_engine_factory=None):
    """The offset long-form path must upload the file once across calls
    (and across different call chunk lengths, since the padded length is
    keyed to the model window)."""
    jax = pytest.importorskip("jax")
    import thewhisper_tpu.pipeline as pl
    from thewhisper_tpu.config import ARCH_PRESETS, SpecialTokens
    from thewhisper_tpu.engine import WhisperEngine
    from thewhisper_tpu.models.whisper import init_params
    import dataclasses
    import jax.numpy as jnp

    arch = dataclasses.replace(
        ARCH_PRESETS["tiny"], max_source_positions=500,
        alignment_heads=((1, 0), (2, 3)))
    params = init_params(arch, seed=0, dtype=jnp.float32)
    eng = WhisperEngine(params, arch, compute_dtype=jnp.float32,
                        batch_buckets=(4,),
                        suppress_tokens=[SpecialTokens().eot])
    pipe = pl.ASRPipeline(eng, tokenizer=None, chunk_length_s=10,
                          batch_size=4)
    rng = np.random.default_rng(0)
    # > 4 MB so it clears the cache's min_bytes gate (real long-form
    # files are tens of MB).
    audio = (0.1 * rng.standard_normal(80 * 16000)).astype(np.float32)
    kw = {"max_new_tokens": 4, "language": "en"}
    out1 = pipe(audio, chunk_length_s=9, generate_kwargs=dict(kw))
    assert pipe._dev_file_cache.misses == 1
    out2 = pipe(audio, chunk_length_s=9, generate_kwargs=dict(kw))
    assert pipe._dev_file_cache.misses == 1      # no re-upload
    assert pipe._dev_file_cache.hits >= 1
    assert out1["text"] == out2["text"]
    # A different call window reuses the same padded device file.
    pipe(audio, chunk_length_s=8, generate_kwargs=dict(kw))
    assert pipe._dev_file_cache.misses == 1
    # Mutating the buffer in place invalidates the cached copy.
    audio[: 16000] = 0.0
    pipe(audio, chunk_length_s=9, generate_kwargs=dict(kw))
    assert pipe._dev_file_cache.misses == 2

"""Identity-keyed device transfer cache (utils/devcache.py).

Exists because the axon PJRT tunnel leaks host RSS per device_put and
its transfer latency degrades as leaks accumulate; the cache guarantees
the same host buffer is never uploaded twice while still detecting
in-place mutation (any contiguous write >= 256 bytes).
"""

import numpy as np
import pytest

from thewhisper_tpu.utils.devcache import DevicePutCache


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

"""Decode-megakernel parity vs the production XLA step.

ops/mega_step.py reimplements the whole bs=1 decoder step (all layers +
final LN + tied-embedding logits) as one Pallas kernel; these tests pin
it against models.whisper.decoder_step / engine.decode.greedy_decode on
the CPU Pallas interpreter (the kernel is numerics-identical modulo bf16
rounding order; compiled-mode numerics are additionally checked on the
real chip by tools/mega_step_probe.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thewhisper_tpu.config import WhisperArch
from thewhisper_tpu.models.quant import quantize_kv, quantize_params
from thewhisper_tpu.models.whisper import (
    DecodeCache,
    compute_cross_kv,
    decoder_prefill,
    decoder_step,
    fuse_self_qkv_params,
    init_params,
    make_cache,
)
from thewhisper_tpu.ops.mega_step import (
    MEGA_KEY,
    from_slot_major,
    mega_decoder_step,
    pack_mega_params,
    prepare_mega_cache,
)

ARCH = WhisperArch(
    d_model=384, encoder_layers=2, encoder_heads=6, decoder_layers=2,
    decoder_heads=6, d_ff=1536, n_mels=80, vocab_size=500,
    max_source_positions=96, max_target_positions=64,
    alignment_heads=((0, 1), (1, 3)))


@pytest.fixture(scope="module")
def setup():
    params = init_params(ARCH, seed=3, dtype=jnp.bfloat16)
    params = quantize_params(params, components=("decoder",))
    params = fuse_self_qkv_params(params)
    params = pack_mega_params(params, ARCH)
    assert MEGA_KEY in params["decoder"]
    rng = np.random.default_rng(0)
    enc_out = jnp.asarray(rng.standard_normal((1, 96, 384)), jnp.bfloat16)
    ck, cv = compute_cross_kv(params, enc_out, ARCH)
    cache = make_cache(ARCH, 1, 16, quantize_kv(ck), quantize_kv(cv),
                       dtype=jnp.bfloat16)
    prompt = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    _, cache, _ = decoder_prefill(params, prompt, cache, ARCH, jnp.bfloat16)
    return params, cache, prompt


def test_pack_refuses_unquantized():
    params = init_params(ARCH, dtype=jnp.bfloat16)
    assert MEGA_KEY not in pack_mega_params(params, ARCH).get("decoder", {})
    params = fuse_self_qkv_params(params)  # fused but not int8
    assert MEGA_KEY not in pack_mega_params(params, ARCH)["decoder"]


@pytest.mark.parametrize("pos", [4, 9, 15])
def test_step_parity(setup, pos):
    """Logits / alignment / cache writes match decoder_step at bf16 tol."""
    params, cache, _ = setup
    sk, sv, cross = prepare_mega_cache(cache)
    tok = jnp.asarray([[7 + pos]], jnp.int32)
    lg_r, cache_r, al_r = decoder_step(
        params, tok, jnp.int32(pos), cache, ARCH, jnp.bfloat16)
    lg_m, (sk1, sv1), al_m = mega_decoder_step(
        params, tok, jnp.int32(pos), sk, sv, cross, ARCH, True)

    lr, lm = np.asarray(lg_r, np.float32), np.asarray(lg_m, np.float32)
    assert lm.shape == lr.shape == (1, ARCH.vocab_size)
    rel = np.abs(lr - lm).max() / max(np.abs(lr).max(), 1e-6)
    assert rel < 2e-2, f"logits rel err {rel}"

    ar, am = np.asarray(al_r, np.float32), np.asarray(al_m, np.float32)
    assert am.shape == ar.shape            # (1, A, T_enc)
    assert np.abs(ar - am).max() < 2e-3

    for ref, got in ((cache_r.self_k, sk1), (cache_r.self_v, sv1)):
        r = np.asarray(ref, np.float32)
        g = np.asarray(from_slot_major(got, ARCH.decoder_heads), np.float32)
        assert np.abs(r - g).max() < 5e-2  # one bf16 rounding apart
        # every slot except `pos` is bit-identical to the input cache
        mask = np.ones(r.shape[-1], bool)
        mask[pos] = False
        np.testing.assert_array_equal(g[..., mask], r[..., mask])


@pytest.mark.parametrize("slots,pos", [(5, 4), (13, 9)])
def test_step_parity_unaligned_cache(slots, pos):
    """Cache lengths that aren't sublane (8) multiples — every production
    program (S = prompt + max_new: 5 for TTFT, 148 for a 144-token
    window) — must run through the kernel. prepare_mega_cache pads the
    slot axis to 8 (Mosaic rejects unaligned HBM slices; this padding is
    what round 5's bench failure was missing) and the pad rows stay
    masked: parity vs the unpadded XLA step pins that."""
    params = init_params(ARCH, seed=3, dtype=jnp.bfloat16)
    params = quantize_params(params, components=("decoder",))
    params = fuse_self_qkv_params(params)
    params = pack_mega_params(params, ARCH)
    rng = np.random.default_rng(0)
    enc_out = jnp.asarray(rng.standard_normal((1, 96, 384)), jnp.bfloat16)
    ck, cv = compute_cross_kv(params, enc_out, ARCH)
    cache = make_cache(ARCH, 1, slots, quantize_kv(ck), quantize_kv(cv),
                       dtype=jnp.bfloat16)
    prompt = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    _, cache, _ = decoder_prefill(params, prompt, cache, ARCH, jnp.bfloat16)

    sk, sv, cross = prepare_mega_cache(cache)
    assert sk.shape[1] % 8 == 0 and sk.shape[1] >= slots
    tok = jnp.asarray([[11]], jnp.int32)
    lg_r, cache_r, al_r = decoder_step(
        params, tok, jnp.int32(pos), cache, ARCH, jnp.bfloat16)
    lg_m, (sk1, sv1), al_m = mega_decoder_step(
        params, tok, jnp.int32(pos), sk, sv, cross, ARCH, True)

    lr, lm = np.asarray(lg_r, np.float32), np.asarray(lg_m, np.float32)
    rel = np.abs(lr - lm).max() / max(np.abs(lr).max(), 1e-6)
    assert rel < 2e-2, f"logits rel err {rel}"
    assert np.abs(np.asarray(al_r) - np.asarray(al_m)).max() < 2e-3
    for ref, got in ((cache_r.self_k, sk1), (cache_r.self_v, sv1)):
        r = np.asarray(ref, np.float32)
        g = np.asarray(from_slot_major(got[:, :slots], ARCH.decoder_heads),
                       np.float32)
        assert np.abs(r - g).max() < 5e-2
        # Pad rows stay zero: nothing writes past the real cache.
        pad = np.asarray(got[:, slots:], np.float32)
        np.testing.assert_array_equal(pad, np.zeros_like(pad))


def test_greedy_token_parity(setup, monkeypatch):
    """greedy_decode through the megakernel = same tokens as the XLA path."""
    from thewhisper_tpu.engine.decode import greedy_decode

    params, cache, prompt = setup
    kw = dict(max_new_tokens=6, eot=2, capture_alignment=True,
              compute_dtype=jnp.bfloat16)

    monkeypatch.setenv("WHISPER_MEGAKERNEL", "0")
    ref = greedy_decode(params, ARCH, prompt, cache, **kw)
    monkeypatch.setenv("WHISPER_MEGAKERNEL", "interpret")
    got = greedy_decode(params, ARCH, prompt, cache, **kw)

    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(got.tokens))
    np.testing.assert_array_equal(np.asarray(ref.num_generated),
                                  np.asarray(got.num_generated))
    # Alignment rows for generated positions exist and are close.
    a_r = np.asarray(ref.align, np.float32)
    a_g = np.asarray(got.align, np.float32)
    assert a_r.shape == a_g.shape
    assert np.abs(a_r - a_g).max() < 5e-3
    # Logprob accounting follows the same (slightly reordered bf16) math.
    assert np.allclose(np.asarray(ref.sum_logprob),
                       np.asarray(got.sum_logprob), atol=0.3)


@pytest.mark.parametrize("pos,w", [(4, 5), (9, 5), (6, 3)])
def test_verify_parity(setup, pos, w):
    """mega_decoder_verify matches decoder_verify: per-row logits and the
    window cache write (slots [pos, pos+W))."""
    from thewhisper_tpu.models.whisper import decoder_verify
    from thewhisper_tpu.ops.mega_step import mega_decoder_verify

    params, cache, _ = setup
    sk, sv, cross = prepare_mega_cache(cache)
    window = jnp.asarray([[5 + (i * 7 + pos) % 90 for i in range(w)]],
                         jnp.int32)
    lg_r, cache_r, _ = decoder_verify(
        params, window, jnp.asarray([pos], jnp.int32), cache, ARCH,
        jnp.bfloat16)
    lg_m, (sk1, sv1), al_m = mega_decoder_verify(
        params, window, jnp.int32(pos), sk, sv, cross, ARCH)

    lr, lm = np.asarray(lg_r, np.float32), np.asarray(lg_m, np.float32)
    assert lm.shape == lr.shape == (1, w, ARCH.vocab_size)
    rel = np.abs(lr - lm).max() / max(np.abs(lr).max(), 1e-6)
    assert rel < 2e-2, f"logits rel err {rel}"
    # Alignment is intentionally zeros on this path (flash cross pass).
    assert np.all(np.asarray(al_m) == 0.0)

    for ref, got in ((cache_r.self_k, sk1), (cache_r.self_v, sv1)):
        r = np.asarray(ref, np.float32)
        g = np.asarray(from_slot_major(got, ARCH.decoder_heads), np.float32)
        assert np.abs(r - g).max() < 5e-2
        mask = np.ones(r.shape[-1], bool)
        mask[pos:pos + w] = False
        np.testing.assert_array_equal(g[..., mask], r[..., mask])


@pytest.mark.parametrize("mode", ["ngram", "model"])
def test_speculative_token_parity(setup, monkeypatch, mode):
    """speculative_decode through the verify megakernel = same tokens
    as the XLA verify (both == greedy by construction)."""
    from thewhisper_tpu.engine.speculative import (
        make_layer_skip_draft,
        speculative_decode,
    )

    params, cache, prompt = setup
    if mode == "model":
        draft_params, draft_arch = make_layer_skip_draft(params, ARCH, 1)
        # Draft cross-KV from the same encoder states as the fixture.
        rng = np.random.default_rng(0)
        enc_out = jnp.asarray(rng.standard_normal((1, 96, 384)),
                              jnp.bfloat16)
        dk, dv = compute_cross_kv(draft_params, enc_out, draft_arch)
        draft_cache = make_cache(draft_arch, 1, 16, quantize_kv(dk),
                                 quantize_kv(dv), dtype=jnp.bfloat16)
    else:
        draft_params = draft_arch = draft_cache = None

    kw = dict(
        params=params, arch=ARCH, draft_params=draft_params,
        draft_arch=draft_arch, prompt=prompt, draft_cache=draft_cache,
        max_new_tokens=6, eot=2, spec_window=4,
        compute_dtype=jnp.bfloat16, ngram_draft=(mode == "ngram"))

    monkeypatch.setenv("WHISPER_MEGAKERNEL", "0")
    ref = speculative_decode(cache=cache, **kw)
    monkeypatch.setenv("WHISPER_MEGAKERNEL", "interpret")
    got = speculative_decode(cache=cache, **kw)

    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(got.tokens))
    np.testing.assert_array_equal(np.asarray(ref.num_generated),
                                  np.asarray(got.num_generated))
    assert np.allclose(np.asarray(ref.sum_logprob),
                       np.asarray(got.sum_logprob), atol=0.3)


def test_speculative_wide_window(setup, monkeypatch):
    """spec_window=8 (W+1=9 -> WP=16) through the verify megakernel:
    the kernel's scale rows must tile to the padded window width
    (ADVICE r4: the 8-row-fixed kernel crashed at trace for w+1 > 8)."""
    from thewhisper_tpu.engine.speculative import speculative_decode
    from thewhisper_tpu.models.whisper import make_cache as mk

    params, _, prompt = setup
    rng = np.random.default_rng(0)
    enc_out = jnp.asarray(rng.standard_normal((1, 96, 384)), jnp.bfloat16)
    ck, cv = compute_cross_kv(params, enc_out, ARCH)
    cache = mk(ARCH, 1, 32, quantize_kv(ck), quantize_kv(cv),
               dtype=jnp.bfloat16)
    _, cache, _ = decoder_prefill(params, prompt, cache, ARCH, jnp.bfloat16)

    kw = dict(params=params, arch=ARCH, draft_params=None, draft_arch=None,
              prompt=prompt, draft_cache=None, max_new_tokens=8, eot=2,
              spec_window=8, compute_dtype=jnp.bfloat16, ngram_draft=True)
    monkeypatch.setenv("WHISPER_MEGAKERNEL", "0")
    ref = speculative_decode(cache=cache, **kw)
    monkeypatch.setenv("WHISPER_MEGAKERNEL", "interpret")
    got = speculative_decode(cache=cache, **kw)
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(got.tokens))
    np.testing.assert_array_equal(np.asarray(ref.num_generated),
                                  np.asarray(got.num_generated))


def test_engine_e2e_token_parity(monkeypatch):
    """WhisperEngine end-to-end: the packed megakernel program produces
    the same tokens as the XLA step program (cross_kv_int8 engine,
    bs=1 bucket — the exact config bench.py's bs=1 long-form arms use)."""
    from thewhisper_tpu.config import GenerationOptions, SpecialTokens
    from thewhisper_tpu.engine.engine import WhisperEngine

    params = init_params(ARCH, seed=5, dtype=jnp.bfloat16)
    params = quantize_params(params, components=("decoder",))
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((ARCH.n_mels, 192)).astype(np.float32)
    opts = GenerationOptions(max_new_tokens=8, language=None,
                             return_timestamps=False)
    special = SpecialTokens.for_vocab(ARCH.vocab_size)

    def run(env):
        monkeypatch.setenv("WHISPER_MEGAKERNEL", env)
        eng = WhisperEngine(params, ARCH, special=special,
                            compute_dtype=jnp.bfloat16, batch_buckets=(1,),
                            cross_kv_int8=True)
        if env != "0":
            assert MEGA_KEY in eng.params["decoder"]
        return eng.transcribe_features(mel, opts)

    ref = run("0")
    got = run("interpret")
    np.testing.assert_array_equal(ref.tokens, got.tokens)
    np.testing.assert_array_equal(ref.num_generated, got.num_generated)

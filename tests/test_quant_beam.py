"""int8 "S" mode, beam search, and language detection tests."""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from thewhisper_tpu.config import ARCH_PRESETS, GenerationOptions, SpecialTokens
from thewhisper_tpu.engine import WhisperEngine
from thewhisper_tpu.models.quant import (
    dequantize_weight,
    quantize_params,
    quantize_weight,
    quantized_bytes,
)
from thewhisper_tpu.models.whisper import (
    decoder_train_forward,
    encoder_forward,
    init_params,
)


@pytest.fixture(scope="module")
def tiny():
    arch = dataclasses.replace(
        ARCH_PRESETS["tiny"],
        d_model=64, encoder_layers=2, encoder_heads=4, decoder_layers=2,
        decoder_heads=4, d_ff=128, vocab_size=200, n_mels=80,
        max_source_positions=50, max_target_positions=40,
        alignment_heads=((1, 0),),
    )
    return arch, init_params(arch, seed=7)


SP = SpecialTokens(eot=1, sot=2, first_language=10, n_languages=5,
                   translate=20, transcribe=21, no_speech=22,
                   no_timestamps=23, timestamp_begin=24)


def test_quantize_roundtrip_error():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((3, 64, 128)).astype(np.float32)
    q = quantize_weight(w)
    assert q["q"].dtype == jnp.int8 and q["q"].shape == w.shape
    assert q["s"].shape == (3, 128)
    deq = np.asarray(dequantize_weight(q))
    # Per-channel int8: max error bounded by scale/2 per channel.
    err = np.abs(deq - w)
    bound = np.asarray(q["s"])[:, None, :] * 0.5 + 1e-7
    assert (err <= bound).all()


def test_quantized_decoder_close_to_fp32(tiny):
    arch, params = tiny
    qparams = quantize_params(params, components=("decoder",))
    # Bytes shrink: decoder linear weights go from 4 to ~1 byte each.
    assert quantized_bytes(qparams) < quantized_bytes(params)

    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, 80, 100)).astype(np.float32)
    tokens = np.array([[2, 5, 9, 12]], dtype=np.int64)
    enc = encoder_forward(params, jnp.asarray(mel), arch)
    ref = np.asarray(decoder_train_forward(params, jnp.asarray(tokens), enc, arch))
    out = np.asarray(decoder_train_forward(qparams, jnp.asarray(tokens), enc, arch))
    # int8 logits track fp32 closely; argmax agrees on a random model.
    np.testing.assert_array_equal(out.argmax(-1), ref.argmax(-1))
    assert np.abs(out - ref).max() < 0.5


def test_quantized_engine_runs(tiny):
    arch, params = tiny
    qparams = quantize_params(params, components=("decoder",))
    eng = WhisperEngine(qparams, arch, special=SP, batch_buckets=(1,))
    mel = np.random.default_rng(2).standard_normal((1, 80, 100)).astype(np.float32)
    res = eng.transcribe_features(
        mel, GenerationOptions(max_new_tokens=6, language="en",
                               return_timestamps=True))
    assert res.tokens.shape[0] == 1
    assert res.align is not None


def test_beam_matches_greedy_for_peaky_model(tiny):
    """With beam=1-equivalent scoring the best beam equals greedy output."""
    arch, params = tiny
    eng = WhisperEngine(params, arch, special=SP, batch_buckets=(1, 2))
    mel = np.random.default_rng(3).standard_normal((2, 80, 100)).astype(np.float32)

    greedy = eng.transcribe_features(
        mel, GenerationOptions(max_new_tokens=6, language="en"))
    beam = eng.transcribe_features(
        mel, GenerationOptions(max_new_tokens=6, language="en", num_beams=4))

    # Beam's selected sequence must score >= the greedy sequence; on random
    # peaky models they typically coincide. Check score ordering at least.
    assert beam.tokens.shape == greedy.tokens.shape
    for b in range(2):
        n_g = int(greedy.num_generated[b])
        n_b = int(beam.num_generated[b])
        score_g = greedy.sum_logprob[b] / max(n_g, 1)
        score_b = beam.sum_logprob[b] / max(n_b, 1)
        assert score_b >= score_g - 1e-3


def test_beam_respects_suppress(tiny):
    arch, params = tiny
    base = WhisperEngine(params, arch, special=SP, batch_buckets=(1,))
    mel = np.random.default_rng(4).standard_normal((1, 80, 100)).astype(np.float32)
    res = base.transcribe_features(
        mel, GenerationOptions(max_new_tokens=6, language="en", num_beams=3))
    first = int(res.tokens[0, res.prompt_len])
    eng = WhisperEngine(params, arch, special=SP, batch_buckets=(1,),
                        suppress_tokens=[first])
    res2 = eng.transcribe_features(
        mel, GenerationOptions(max_new_tokens=6, language="en", num_beams=3))
    gen = res2.tokens[0, res2.prompt_len:res2.prompt_len + res2.num_generated[0]]
    assert first not in gen.tolist()


def test_detect_language(tiny):
    arch, params = tiny
    eng = WhisperEngine(params, arch, special=SP, batch_buckets=(1, 2))
    mel = np.random.default_rng(5).standard_normal((2, 80, 100)).astype(np.float32)
    codes, probs = eng.detect_language(mel)
    assert len(codes) == 2
    assert all(0.0 <= p <= 1.0 for p in probs)
    # Codes come from the first n_languages entries of the language list.
    from thewhisper_tpu.config import LANGUAGES

    assert all(c in LANGUAGES[:SP.n_languages] for c in codes)

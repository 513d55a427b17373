"""int8 "S" mode, beam search, and language detection tests."""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from thewhisper_tpu.config import ARCH_PRESETS, GenerationOptions, SpecialTokens
from thewhisper_tpu.engine import WhisperEngine
from thewhisper_tpu.models.quant import (
    dequantize_weight,
    quantize_embedding,
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


def test_quantize_int4_roundtrip_error():
    rng = np.random.default_rng(3)
    w = rng.standard_normal((3, 64, 128)).astype(np.float32)
    q = quantize_weight(w, bits=4)
    assert q["q"].dtype == jnp.int4 and q["q"].shape == w.shape
    deq = np.asarray(dequantize_weight(q))
    # Per-channel int4 (qmax=7): max error bounded by scale/2 per channel.
    err = np.abs(deq - w)
    bound = np.asarray(q["s"])[:, None, :] * 0.5 + 1e-6
    assert (err <= bound).all()
    # int4 error is ~16x int8's but still small relative to the weights.
    assert err.max() < np.abs(w).max() * 0.1


def test_int4_engine_runs(tiny):
    arch, params = tiny
    qparams = quantize_params(params, components=("decoder",), bits=4)
    # HBM accounting: jnp.int4 packs two values per byte.
    assert quantized_bytes(qparams) < quantized_bytes(
        quantize_params(params, components=("decoder",)))
    eng = WhisperEngine(qparams, arch, special=SP, batch_buckets=(1,))
    mel = np.random.default_rng(4).standard_normal((1, 80, 100)).astype(np.float32)
    res = eng.transcribe_features(
        mel, GenerationOptions(max_new_tokens=6, language="en"))
    toks = np.asarray(res.tokens)[0, : int(res.num_generated[0])]
    assert ((0 <= toks) & (toks < arch.vocab_size)).all()


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


def test_no_speech_prob_and_token_logprobs(tiny):
    arch, params = tiny
    eng = WhisperEngine(params, arch, special=SP, batch_buckets=(1,))
    mel = np.random.default_rng(6).standard_normal((1, 80, 100)).astype(np.float32)
    res = eng.transcribe_features(
        mel, GenerationOptions(max_new_tokens=6, language="en"))
    assert res.no_speech_prob is not None
    assert 0.0 <= float(res.no_speech_prob[0]) <= 1.0
    assert res.token_logprobs.shape == (1, 6)
    n = int(res.num_generated[0])
    # Generated-token logprobs are negative (log of a probability).
    assert (res.token_logprobs[0, :max(n, 1)] <= 1e-6).all()


def test_word_confidences(tiny):
    arch, params = tiny
    eng = WhisperEngine(params, arch, special=SP, batch_buckets=(1,),
                        suppress_tokens=list(range(90, 200)))

    from thewhisper_tpu.pipeline import ASRPipeline

    class Tok:
        def decode(self, ids, skip_special_tokens=True):
            return "".join(f" w{int(i)}" for i in ids if int(i) < 90)

    # arch.max_source_positions is 50 -> 1 s chunk (100 mel frames).
    pipe = ASRPipeline(eng, tokenizer=Tok(), chunk_length_s=1)
    out = pipe.transcribe_batch(
        [np.random.default_rng(7).standard_normal(12000).astype(np.float32)],
        generate_kwargs={"max_new_tokens": 6, "language": "en"})[0]
    for ch in out["chunks"]:
        assert 0.0 < ch["confidence"] <= 1.0


def test_int8_weights_only_mode(tiny_ckpt_path=None):
    import jax.numpy as jnp
    from thewhisper_tpu.models.quant import is_quantized, quantize_params
    from thewhisper_tpu.models.whisper import init_params as ip
    from thewhisper_tpu.config import ARCH_PRESETS
    import dataclasses as dc

    arch = dc.replace(ARCH_PRESETS["tiny"], d_model=64, encoder_layers=1,
                      encoder_heads=4, decoder_layers=1, decoder_heads=4,
                      d_ff=128, vocab_size=120, max_source_positions=20,
                      max_target_positions=16)
    params = ip(arch, seed=0)
    q_full = quantize_params(params, components=("decoder",))
    q_w = quantize_params(params, components=("decoder",),
                          quantize_embedding_table=False)
    assert is_quantized(q_full["decoder"]["token_emb"])
    assert not is_quantized(q_w["decoder"]["token_emb"])


def test_beam_word_timestamps(tiny):
    """Beam search with alignment capture: the best beam's attention rows
    follow its own parent chain (on-device beam_indices reindexing)."""
    arch, params = tiny
    eng = WhisperEngine(params, arch, special=SP, batch_buckets=(1,))
    mel = np.random.default_rng(8).standard_normal((1, 80, 100)).astype(np.float32)
    res = eng.transcribe_features(
        mel, GenerationOptions(max_new_tokens=6, language="en", num_beams=3,
                               return_timestamps=True))
    assert res.align is not None
    assert res.align.shape == (1, 1, 4 + 6, 50)
    # Rows for the prompt and generated positions are probability rows.
    n = int(res.num_generated[0])
    rows = res.align[0, 0, :4 + max(n - 1, 0)]
    sums = rows.sum(-1)
    assert np.all(np.abs(sums - 1.0) < 2e-2), sums

    # DTW path runs on it end to end.
    from thewhisper_tpu.align import token_timestamps_from_alignment

    rows_used = 4 + max(n - 1, 1)
    ts = token_timestamps_from_alignment(
        res.align, np.asarray([rows_used]), num_frames=100)
    assert (np.diff(ts[0][: rows_used + 1]) >= 0).all()


def test_beam_token_logprobs_and_no_speech(tiny):
    """Beam results carry per-token logprobs and no-speech prob like greedy
    (VERDICT weak #6): the selected beam's logprobs sum to its sum_logprob."""
    arch, params = tiny
    eng = WhisperEngine(params, arch, special=SP, batch_buckets=(1, 2))
    mel = np.random.default_rng(10).standard_normal((2, 80, 100)).astype(np.float32)
    res = eng.transcribe_features(
        mel, GenerationOptions(max_new_tokens=6, language="en", num_beams=3))
    assert res.token_logprobs is not None and res.no_speech_prob is not None
    assert res.token_logprobs.shape == (2, 6)
    for b in range(2):
        assert 0.0 <= float(res.no_speech_prob[b]) <= 1.0
        n = int(res.num_generated[b])
        # Sum over steps actually taken (+ the closing EOT if present)
        # reconstructs the beam's total score.
        total = float(res.token_logprobs[b].sum())
        assert total == pytest.approx(float(res.sum_logprob[b]), abs=1e-3)
        # Each recorded logprob is a log-probability.
        assert (res.token_logprobs[b] <= 1e-5).all()

    # Greedy no_speech agrees with beams (same prefill distribution).
    g = eng.transcribe_features(
        mel, GenerationOptions(max_new_tokens=6, language="en"))
    np.testing.assert_allclose(g.no_speech_prob, res.no_speech_prob, atol=1e-5)


def test_word_confidences_under_beams(tiny):
    """chunk['confidence'] must not disappear when num_beams > 1."""
    arch, params = tiny
    # Token layout with a high EOT so generated ids < 90 survive the
    # special-token filter and decode into words.
    sp = SpecialTokens(eot=101, sot=102, first_language=110, n_languages=5,
                       translate=120, transcribe=121, no_speech=122,
                       no_timestamps=123, timestamp_begin=124)
    eng = WhisperEngine(params, arch, special=sp, batch_buckets=(1,),
                        suppress_tokens=list(range(90, 200)))

    from thewhisper_tpu.pipeline import ASRPipeline

    class Tok:
        def decode(self, ids, skip_special_tokens=True):
            return "".join(f" w{int(i)}" for i in ids if int(i) < 90)

    pipe = ASRPipeline(eng, tokenizer=Tok(), chunk_length_s=1)
    out = pipe.transcribe_batch(
        [np.random.default_rng(11).standard_normal(12000).astype(np.float32)],
        generate_kwargs={"max_new_tokens": 6, "language": "en",
                         "num_beams": 3})[0]
    assert out["chunks"], "expected at least one word chunk"
    for ch in out["chunks"]:
        assert 0.0 < ch["confidence"] <= 1.0


def test_sampled_decode_and_fallback_ladder(tiny):
    arch, params = tiny
    eng = WhisperEngine(params, arch, special=SP, batch_buckets=(1, 2))
    mel = np.random.default_rng(12).standard_normal((1, 80, 100)).astype(np.float32)

    # Temperature sampling: deterministic per seed, varies across seeds.
    r1 = eng.transcribe_features(mel, GenerationOptions(
        max_new_tokens=8, language="en", temperature=1.5, seed=1))
    r1b = eng.transcribe_features(mel, GenerationOptions(
        max_new_tokens=8, language="en", temperature=1.5, seed=1))
    np.testing.assert_array_equal(r1.tokens, r1b.tokens)
    diff = [
        eng.transcribe_features(mel, GenerationOptions(
            max_new_tokens=8, language="en", temperature=1.5, seed=s)).tokens
        for s in range(2, 6)
    ]
    assert any(not np.array_equal(r1.tokens, d) for d in diff)

    # Fallback ladder: a random model's avg logprob (< -1.0) fails the gate,
    # so the pipeline re-decodes at rising temperature; output stays sane.
    from thewhisper_tpu.pipeline import ASRPipeline

    class Tok:
        def decode(self, ids, skip_special_tokens=True):
            return "".join(f" w{int(i)}" for i in ids if int(i) < 90)

    pipe = ASRPipeline(eng, tokenizer=Tok(), chunk_length_s=1)
    out = pipe.transcribe_batch(
        [np.random.default_rng(13).standard_normal(12000).astype(np.float32)],
        generate_kwargs={"max_new_tokens": 6, "language": "en",
                         "fallback_temperatures": True})[0]
    assert isinstance(out["text"], str)
    # Explicit ladders and disabled ladders also normalize correctly.
    from thewhisper_tpu.pipeline import _fallback_ladder
    assert _fallback_ladder(True) == (0.0, 0.2, 0.4, 0.6, 0.8, 1.0)
    assert _fallback_ladder([0.5]) == (0.5,)
    assert _fallback_ladder(None) is None and _fallback_ladder(False) is None


def test_int8_cross_kv_cache(tiny):
    """cross_kv_int8 engine matches the bf16-cache engine closely."""
    arch, params = tiny
    base = WhisperEngine(params, arch, special=SP, batch_buckets=(1,))
    q_eng = WhisperEngine(params, arch, special=SP, batch_buckets=(1,),
                          cross_kv_int8=True)
    mel = np.random.default_rng(9).standard_normal((1, 80, 100)).astype(np.float32)
    opts = GenerationOptions(max_new_tokens=6, language="en",
                             return_timestamps=True)
    r0 = base.transcribe_features(mel, opts)
    r1 = q_eng.transcribe_features(mel, opts)
    # Same greedy tokens on a random model; alignment close.
    np.testing.assert_array_equal(r0.tokens, r1.tokens)
    assert np.abs(r1.align - r0.align).max() < 0.05
    # Beam path also runs with the quantized cache.
    rb = q_eng.transcribe_features(
        mel, GenerationOptions(max_new_tokens=6, language="en", num_beams=3))
    assert rb.tokens.shape == r0.tokens.shape


def test_w8a8_encoder_close_to_fp32(tiny):
    """W8A8 (int8 activations + int8 weights, int8 MXU dots) tracks fp32."""
    arch, params = tiny
    qparams = quantize_params(
        params, components=("encoder",), activation_int8=True)
    leaf = qparams["encoder"]["layers"]["mlp"]["fc1_w"]
    assert set(leaf) == {"q8", "s8"} and leaf["q8"].dtype == jnp.int8

    rng = np.random.default_rng(8)
    mel = rng.standard_normal((2, 80, 100)).astype(np.float32)
    ref = np.asarray(encoder_forward(params, jnp.asarray(mel), arch))
    out = np.asarray(encoder_forward(qparams, jnp.asarray(mel), arch))
    # Per-row act scales + per-channel weight scales: relative error small.
    denom = np.abs(ref).max()
    assert np.abs(out - ref).max() / denom < 0.08, np.abs(out - ref).max()
    # Correlation across the whole feature map stays near 1.
    cc = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert cc > 0.999, cc


def test_w8a8_engine_end_to_end(tiny):
    """Engine runs with a W8A8 encoder + weight-only int8 decoder."""
    arch, params = tiny
    qparams = quantize_params(
        quantize_params(params, components=("encoder",), activation_int8=True),
        components=("decoder",))
    eng = WhisperEngine(qparams, arch, special=SP, batch_buckets=(1,))
    mel = np.random.default_rng(9).standard_normal((1, 80, 100)).astype(np.float32)
    res = eng.transcribe_features(
        mel, GenerationOptions(max_new_tokens=6, language="en",
                               return_timestamps=True))
    assert res.tokens.shape[0] == 1
    ref_eng = WhisperEngine(params, arch, special=SP, batch_buckets=(1,))
    ref = ref_eng.transcribe_features(
        mel, GenerationOptions(max_new_tokens=6, language="en"))
    # Same greedy argmax on a random model (weak but real signal, matching
    # the weight-only int8 test's bar).
    np.testing.assert_array_equal(res.tokens, ref.tokens)


def test_from_checkpoint_int8_all(tmp_path):
    """from_checkpoint(quantize='int8-all') builds the S+ engine."""
    import subprocess
    import sys

    ckpt = tmp_path / "tiny"
    subprocess.run(
        [sys.executable, "tools/make_tiny_checkpoint.py", str(ckpt)],
        check=True, capture_output=True)
    eng = WhisperEngine.from_checkpoint(
        str(ckpt), chunk_length_s=30.0, quantize="int8-all")
    enc_leaf = eng.params["encoder"]["layers"]["mlp"]["fc1_w"]
    dec_leaf = eng.params["decoder"]["layers"]["mlp"]["fc1_w"]
    assert set(enc_leaf) == {"q8", "s8"}          # W8A8 encoder
    assert set(dec_leaf) == {"q", "s"}            # weight-only decoder
    assert eng.cross_kv_int8
    mel = np.random.default_rng(10).standard_normal(
        (1, eng.arch.n_mels, 100)).astype(np.float32)
    res = eng.transcribe_features(
        mel, GenerationOptions(max_new_tokens=4, language="en"))
    assert res.tokens.shape[0] == 1


def test_detect_then_transcribe_composition(tiny):
    """detect_language's ndarray output feeds transcribe_* directly
    (regression: `if languages:` raised on numpy arrays for batch > 1)."""
    arch, params = tiny
    eng = WhisperEngine(params, arch, special=SP, batch_buckets=(2,))
    mel = np.random.default_rng(11).standard_normal((2, 80, 100)).astype(np.float32)
    codes, _ = eng.detect_language(mel)
    assert isinstance(codes, np.ndarray)
    res = eng.transcribe_features(
        mel, GenerationOptions(max_new_tokens=4), languages=codes)
    assert res.tokens.shape[0] == 2


def test_device_quantization_bit_parity_and_device_init_schema(tiny):
    """Device-path quantization (jax.Array leaves stay on device — no
    per-leaf tunnel download) is bit-identical to the host numpy path,
    and init_params_device mirrors init_params' tree schema exactly."""
    import jax

    from thewhisper_tpu.models.whisper import init_params_device

    arch, params = tiny
    host_leaves = jax.tree.map(np.asarray, params)
    q_dev = quantize_params(params, components=("decoder",))
    q_host = quantize_params(host_leaves, components=("decoder",))
    for a, b in zip(jax.tree.leaves(q_dev), jax.tree.leaves(q_host)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    dev = init_params_device(arch, seed=0, dtype=jnp.bfloat16)
    ref = init_params(arch, seed=0, dtype=jnp.bfloat16)
    assert jax.tree.structure(dev) == jax.tree.structure(ref)
    assert (jax.tree.map(lambda x: (x.shape, str(x.dtype)), dev)
            == jax.tree.map(lambda x: (x.shape, str(x.dtype)), ref))


def test_quantize_embedding_int4_roundtrip_and_device_parity():
    rng = np.random.default_rng(9)
    w = (0.02 * rng.standard_normal((50, 32))).astype(np.float32)
    q4 = quantize_embedding(w, bits=4)
    assert q4["q"].dtype == jnp.int4
    deq = np.asarray(q4["q"], np.float32) * np.asarray(q4["s"])[:, None]
    err = np.abs(deq - w)
    assert (err <= np.asarray(q4["s"])[:, None] * 0.5 + 1e-7).all()
    # Device path (jax.Array input) matches the host numpy math exactly.
    import jax

    q4_dev = quantize_embedding(jax.device_put(w), bits=4)
    np.testing.assert_array_equal(
        np.asarray(q4["q"], np.int8), np.asarray(q4_dev["q"], np.int8))
    np.testing.assert_allclose(np.asarray(q4["s"]), np.asarray(q4_dev["s"]),
                               rtol=1e-6)

"""Speculative decoding: exactness vs plain greedy, verify-pass parity.

The contract (engine/speculative.py): for ANY draft, the emitted tokens,
lengths, logprobs, and alignment equal plain ``greedy_decode``'s — the
draft controls only how many tokens each verify round advances.
"""

import dataclasses
import sys

import numpy as np
import pytest
import jax.numpy as jnp

sys.path.insert(0, "tools")

from thewhisper_tpu.config import ARCH_PRESETS, GenerationOptions, SpecialTokens
from thewhisper_tpu.engine import WhisperEngine
from thewhisper_tpu.engine.decode import greedy_decode, suppress_mask
from thewhisper_tpu.engine.speculative import (
    make_layer_skip_draft,
    speculative_decode,
)
from thewhisper_tpu.models.whisper import (
    compute_cross_kv,
    decoder_prefill,
    decoder_step,
    decoder_verify,
    encoder_forward,
    init_params,
    make_cache,
)


@pytest.fixture(scope="module")
def tiny():
    arch = dataclasses.replace(
        ARCH_PRESETS["tiny"],
        d_model=64, encoder_layers=2, encoder_heads=4, decoder_layers=4,
        decoder_heads=4, d_ff=128, vocab_size=200, n_mels=80,
        max_source_positions=50, max_target_positions=64,
        alignment_heads=((1, 0), (2, 1)),
    )
    return arch, init_params(arch, seed=11)


SP = SpecialTokens(eot=1, sot=2, first_language=10, n_languages=5,
                   translate=20, transcribe=21, no_speech=22,
                   no_timestamps=23, timestamp_begin=24)

MAX_NEW = 12
W = 3


def _setup(arch, params, batch, s_cap, rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    mel = jnp.asarray(
        rng.standard_normal((batch, arch.n_mels, 100)).astype(np.float32))
    enc = encoder_forward(params, mel, arch)
    ck, cv = compute_cross_kv(params, enc, arch)
    cache = make_cache(arch, batch, s_cap, ck, cv)
    prompt = jnp.asarray(
        np.tile(np.array([SP.sot, 10, 21, 23], np.int32), (batch, 1)))
    return enc, cache, prompt


def test_decoder_verify_matches_sequential_steps(tiny):
    """One verify window == the same tokens pushed through decoder_step."""
    arch, params = tiny
    b, p = 2, 4
    enc, cache, prompt = _setup(arch, params, b, p + 8)
    _, cache, _ = decoder_prefill(params, prompt, cache, arch)

    rng = np.random.default_rng(1)
    window = jnp.asarray(rng.integers(5, 100, (b, 4)).astype(np.int32))
    positions = jnp.asarray([p, p], jnp.int32)

    vlogits, vcache, valign = decoder_verify(
        params, window, positions, cache, arch)

    step_cache = cache
    for j in range(4):
        logits_j, step_cache, align_j = decoder_step(
            params, window[:, j:j + 1], jnp.int32(p + j), step_cache, arch)
        np.testing.assert_allclose(
            np.asarray(vlogits[:, j]), np.asarray(logits_j),
            rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(valign[:, j]), np.asarray(align_j),
            rtol=2e-4, atol=1e-5)
    # Cache contents agree where written.
    np.testing.assert_allclose(
        np.asarray(vcache.self_k[..., : p + 4]),
        np.asarray(step_cache.self_k[..., : p + 4]), rtol=2e-4, atol=2e-4)


def test_decoder_verify_per_sample_positions(tiny):
    """Different start slots per sample: each row behaves independently."""
    arch, params = tiny
    b, p = 2, 4
    enc, cache, prompt = _setup(arch, params, b, p + 10, rng_seed=2)
    _, cache, _ = decoder_prefill(params, prompt, cache, arch)
    # Advance row 0 by two extra tokens so its frontier differs.
    extra = jnp.asarray([[7, 9], [7, 9]], jnp.int32)
    _, cache, _ = decoder_verify(
        params, extra, jnp.asarray([p, p], jnp.int32), cache, arch)

    window = jnp.asarray([[11, 12], [11, 12]], jnp.int32)
    mixed = decoder_verify(
        params, window, jnp.asarray([p + 2, p], jnp.int32), cache, arch)[0]
    row0 = decoder_verify(
        params, window, jnp.asarray([p + 2, p + 2], jnp.int32), cache, arch)[0]
    row1_cache = cache  # row 1 at frontier p ignores slots >= p
    row1 = decoder_verify(
        params, window, jnp.asarray([p, p], jnp.int32), row1_cache, arch)[0]
    np.testing.assert_allclose(
        np.asarray(mixed[0]), np.asarray(row0[0]), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(mixed[1]), np.asarray(row1[1]), rtol=2e-4, atol=2e-4)


def _run_pair(arch, params, draft_params, draft_arch, batch=3,
              suppress_ids=(0, 3), capture=True, seed=5):
    s_cap = 4 + MAX_NEW + W + 1
    enc, cache, prompt = _setup(arch, params, batch, s_cap, rng_seed=seed)
    # Greedy reference needs only p + max_new slots, but the same cache
    # works (greedy ignores the slack).
    sup = jnp.asarray(suppress_mask(arch.vocab_size, suppress_ids))
    beg = jnp.asarray(suppress_mask(arch.vocab_size, (5,)))
    ref = greedy_decode(
        params, arch, prompt, cache, MAX_NEW, SP.eot,
        suppress=sup, begin_suppress=beg, capture_alignment=capture,
        no_speech_id=SP.no_speech)

    ck, cv = compute_cross_kv(draft_params, enc, draft_arch)
    d_cache = make_cache(draft_arch, batch, s_cap, ck, cv)
    got = speculative_decode(
        params, arch, draft_params, draft_arch, prompt, cache, d_cache,
        MAX_NEW, SP.eot, spec_window=W,
        suppress=sup, begin_suppress=beg, capture_alignment=capture,
        no_speech_id=SP.no_speech)
    return ref, got


def _assert_exact(ref, got, capture=True):
    n_ref = np.asarray(ref.num_generated)
    n_got = np.asarray(got.num_generated)
    np.testing.assert_array_equal(n_got, n_ref)
    rt, gt = np.asarray(ref.tokens), np.asarray(got.tokens)
    p = rt.shape[1] - MAX_NEW
    for i, n in enumerate(n_ref):
        # Generated chain (incl. the EOT slot if present) must be equal.
        upto = min(n + 1, MAX_NEW)
        np.testing.assert_array_equal(gt[i, : p + upto], rt[i, : p + upto])
        np.testing.assert_allclose(
            np.asarray(got.token_logprobs)[i, :upto],
            np.asarray(ref.token_logprobs)[i, :upto], rtol=1e-4, atol=1e-5)
        if capture:
            # Alignment rows exist for every FED position: prompt + the
            # generated chain up to (not incl.) the last emitted token.
            rows = p + max(int(n) - 1, 0)
            np.testing.assert_allclose(
                np.asarray(got.align)[i, :, :rows],
                np.asarray(ref.align)[i, :, :rows], rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.sum_logprob),
                               np.asarray(ref.sum_logprob),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.no_speech_prob),
                               np.asarray(ref.no_speech_prob),
                               rtol=1e-5, atol=1e-6)


def test_speculative_exact_with_perfect_draft(tiny):
    """Draft == target: every round accepts the whole window."""
    arch, params = tiny
    ref, got = _run_pair(arch, params, params, arch)
    _assert_exact(ref, got)


def test_speculative_exact_with_layer_skip_draft(tiny):
    arch, params = tiny
    draft_params, draft_arch = make_layer_skip_draft(params, arch, 2)
    assert draft_arch.decoder_layers == 2
    ref, got = _run_pair(arch, params, draft_params, draft_arch)
    _assert_exact(ref, got)


def test_speculative_exact_with_adversarial_draft(tiny):
    """A draft from different random weights disagrees almost always —
    output must STILL equal greedy (just slower)."""
    arch, params = tiny
    bad = init_params(arch, seed=99)
    ref, got = _run_pair(arch, params, bad, arch)
    _assert_exact(ref, got)


def test_speculative_no_alignment_path(tiny):
    arch, params = tiny
    draft_params, draft_arch = make_layer_skip_draft(params, arch, 2)
    ref, got = _run_pair(arch, params, draft_params, draft_arch,
                         capture=False)
    _assert_exact(ref, got, capture=False)


def test_speculative_exact_with_ngram_draft(tiny):
    """Prompt-lookup drafting (no model): still exactly greedy."""
    arch, params = tiny
    s_cap = 4 + MAX_NEW + W + 1
    enc, cache, prompt = _setup(arch, params, 3, s_cap, rng_seed=5)
    sup = jnp.asarray(suppress_mask(arch.vocab_size, (0, 3)))
    beg = jnp.asarray(suppress_mask(arch.vocab_size, (5,)))
    ref = greedy_decode(
        params, arch, prompt, cache, MAX_NEW, SP.eot,
        suppress=sup, begin_suppress=beg, capture_alignment=True,
        no_speech_id=SP.no_speech)
    got = speculative_decode(
        params, arch, None, None, prompt, cache, None,
        MAX_NEW, SP.eot, spec_window=W,
        suppress=sup, begin_suppress=beg, capture_alignment=True,
        no_speech_id=SP.no_speech, ngram_draft=True)
    _assert_exact(ref, got)


def test_engine_ngram_speculative_matches_plain(tiny):
    arch, params = tiny
    plain = WhisperEngine(params, arch, special=SP, batch_buckets=(2,))
    spec = WhisperEngine(params, arch, special=SP, batch_buckets=(2,),
                         spec_ngram=True, spec_window=W)
    mel = np.random.default_rng(12).standard_normal(
        (2, arch.n_mels, 100)).astype(np.float32)
    opts = GenerationOptions(max_new_tokens=10, language="en")
    a = plain.transcribe_features(mel, opts)
    b = spec.transcribe_features(mel, opts)
    np.testing.assert_array_equal(a.num_generated, b.num_generated)
    for i, n in enumerate(a.num_generated):
        upto = a.prompt_len + int(n)
        np.testing.assert_array_equal(b.tokens[i, :upto], a.tokens[i, :upto])


def test_unrolled_decoder_scans_match_rolled(tiny, monkeypatch):
    """WHISPER_DECODER_UNROLL=4 (the TPU small-batch default) is
    semantics-preserving for prefill/step/verify.

    The unroll default is backend-gated (TPU only — on XLA:CPU the 4x
    loop bodies multiply compile time across every bucketed program),
    so the CPU suite runs rolled; this test pins the unrolled trace
    explicitly via the env override.
    """
    arch, params = tiny
    mel = np.random.default_rng(21).standard_normal(
        (2, arch.n_mels, 100)).astype(np.float32)
    opts = GenerationOptions(max_new_tokens=12, language="en",
                             return_timestamps=True)

    def run():
        eng = WhisperEngine(params, arch, special=SP, batch_buckets=(2,),
                            spec_ngram=True, spec_window=W)
        return eng.transcribe_features(mel, opts)

    rolled = run()
    monkeypatch.setenv("WHISPER_DECODER_UNROLL", "4")
    unrolled = run()
    np.testing.assert_array_equal(rolled.tokens, unrolled.tokens)
    np.testing.assert_array_equal(rolled.num_generated,
                                  unrolled.num_generated)
    assert rolled.spec_rounds == unrolled.spec_rounds
    np.testing.assert_allclose(rolled.align, unrolled.align,
                               rtol=1e-5, atol=1e-6)


def test_ngram_device_rounds_match_exact_simulation(tiny):
    """The device-side round counter equals the host device-exact sim.

    Locks two invariants at once: (1) EngineResult.spec_rounds counts
    real while-loop iterations, and (2) simulate_device(two_tier=True)
    replicates ngram_propose bit-for-bit (frontier zeros, two-tier hit
    selection, fallback drafts). This is the measurement backbone of the
    speculative cost model (tools/spec_ab_probe.py) — the round-3
    "2.6x-a-step round cost" error came precisely from a host sim that
    diverged from the device rule.
    """
    from ngram_acceptance_sim import simulate_device

    arch, params = tiny
    eng = WhisperEngine(params, arch, special=SP, batch_buckets=(1,),
                        spec_ngram=True, spec_window=W,
                        suppress_tokens=[SP.eot])
    for seed in (3, 7, 11):
        mel = np.random.default_rng(seed).standard_normal(
            (1, arch.n_mels, 100)).astype(np.float32)
        res = eng.transcribe_features(
            mel, GenerationOptions(max_new_tokens=40, language="en"))
        assert res.spec_rounds is not None and res.spec_rounds > 0
        n = int(res.num_generated[0])
        full = np.asarray(res.tokens[0, : res.prompt_len + n]).tolist()
        sim_rounds, _, _ = simulate_device(
            full, res.prompt_len, W, two_tier=True)
        assert res.spec_rounds == sim_rounds, (
            f"seed {seed}: device {res.spec_rounds} != sim {sim_rounds}")

    # Plain greedy does not report rounds.
    plain = WhisperEngine(params, arch, special=SP, batch_buckets=(1,))
    mel = np.random.default_rng(3).standard_normal(
        (1, arch.n_mels, 100)).astype(np.float32)
    res = plain.transcribe_features(
        mel, GenerationOptions(max_new_tokens=8, language="en"))
    assert res.spec_rounds is None


def test_speculative_exact_with_proposal_tokens(tiny):
    """External proposal drafts (the streaming cross-tick case): exact
    greedy whether the guess is perfect, garbage, or half-right."""
    arch, params = tiny
    s_cap = 4 + MAX_NEW + W + 1
    enc, cache, prompt = _setup(arch, params, 2, s_cap, rng_seed=6)
    sup = jnp.asarray(suppress_mask(arch.vocab_size, (0, 3)))
    ref = greedy_decode(
        params, arch, prompt, cache, MAX_NEW, SP.eot, suppress=sup,
        capture_alignment=False, no_speech_id=SP.no_speech)
    perfect = jnp.asarray(np.asarray(ref.tokens)[:, 4:], jnp.int32)
    garbage = jnp.asarray(
        np.random.default_rng(0).integers(
            5, 100, (2, MAX_NEW)).astype(np.int32))
    half = np.asarray(perfect).copy()
    half[:, MAX_NEW // 2:] = 7
    for props in (perfect, garbage, jnp.asarray(half)):
        got = speculative_decode(
            params, arch, None, None, prompt, cache, None,
            MAX_NEW, SP.eot, spec_window=W, suppress=sup,
            capture_alignment=False, no_speech_id=SP.no_speech,
            proposal_tokens=props)
        _assert_exact(ref, got, capture=False)


def test_engine_draft_tokens_and_pipeline_reuse(tiny, tmp_path_factory):
    from make_tiny_checkpoint import make_checkpoint

    from thewhisper_tpu.pipeline import ASRPipeline

    arch, params = tiny
    eng = WhisperEngine(params, arch, special=SP, batch_buckets=(2,))
    mel = np.random.default_rng(14).standard_normal(
        (2, arch.n_mels, 100)).astype(np.float32)
    opts = GenerationOptions(max_new_tokens=10, language="en")
    a = eng.transcribe_features(mel, opts)
    # Feeding the previous output as the draft must reproduce it exactly.
    b = eng.transcribe_features(
        mel, opts, draft_tokens=a.tokens[:, a.prompt_len:])
    np.testing.assert_array_equal(a.num_generated, b.num_generated)
    for i, n in enumerate(a.num_generated):
        upto = a.prompt_len + int(n)
        np.testing.assert_array_equal(b.tokens[i, :upto], a.tokens[i, :upto])

    # Pipeline-level cross-call reuse: two calls on the same audio give
    # the same text; the second one speculates off the first's tokens.
    path = make_checkpoint(
        str(tmp_path_factory.mktemp("ckpt") / "tiny-reuse"), seed=5)
    pipe = ASRPipeline(path, chunk_length_s=10, reuse_previous_tokens=True)
    audio = (0.1 * np.random.default_rng(15)
             .standard_normal(2 * 16000)).astype(np.float32)
    r1 = pipe(audio)
    assert pipe._prev_gen_tokens is not None
    r2 = pipe(audio)
    assert r1["text"] == r2["text"]


def test_engine_speculative_matches_plain(tiny):
    arch, params = tiny
    draft_params, draft_arch = make_layer_skip_draft(params, arch, 2)
    plain = WhisperEngine(params, arch, special=SP, batch_buckets=(2,))
    spec = WhisperEngine(params, arch, special=SP, batch_buckets=(2,),
                         draft_params=draft_params, draft_arch=draft_arch,
                         spec_window=W)
    mel = np.random.default_rng(8).standard_normal(
        (2, arch.n_mels, 100)).astype(np.float32)
    opts = GenerationOptions(max_new_tokens=10, language="en",
                             return_timestamps=True)
    a = plain.transcribe_features(mel, opts)
    b = spec.transcribe_features(mel, opts)
    np.testing.assert_array_equal(a.num_generated, b.num_generated)
    for i, n in enumerate(a.num_generated):
        upto = a.prompt_len + int(n)
        np.testing.assert_array_equal(b.tokens[i, :upto], a.tokens[i, :upto])
    # Beam calls must bypass speculation untouched.
    beam_opts = GenerationOptions(max_new_tokens=6, language="en",
                                  num_beams=2)
    rb = spec.transcribe_features(mel, beam_opts)
    assert rb.tokens.shape[0] == 2


def test_engine_draft_int8_matches_plain(tiny):
    """draft_int8=True quantizes only the DRAFT — speculative output is
    greedy-equivalent for any draft, so tokens must be identical."""
    arch, params = tiny
    draft_params, draft_arch = make_layer_skip_draft(params, arch, 2)
    plain = WhisperEngine(params, arch, special=SP, batch_buckets=(2,))
    spec = WhisperEngine(params, arch, special=SP, batch_buckets=(2,),
                         draft_params=draft_params, draft_arch=draft_arch,
                         spec_window=W, draft_int8=True)
    # The engine's draft decoder really is int8 ({"q","s"} leaves).
    dw = spec.draft_params["decoder"]["layers"]["mlp"]["fc1_w"]
    assert isinstance(dw, dict) and set(dw) == {"q", "s"}
    mel = np.random.default_rng(8).standard_normal(
        (2, arch.n_mels, 100)).astype(np.float32)
    opts = GenerationOptions(max_new_tokens=10, language="en")
    a = plain.transcribe_features(mel, opts)
    b = spec.transcribe_features(mel, opts)
    np.testing.assert_array_equal(a.num_generated, b.num_generated)
    for i, n in enumerate(a.num_generated):
        upto = a.prompt_len + int(n)
        np.testing.assert_array_equal(b.tokens[i, :upto], a.tokens[i, :upto])


def test_speculative_with_int8_cross_kv(tiny):
    """Speculation composes with the int8 cross-KV cache ('S' default)."""
    arch, params = tiny
    plain = WhisperEngine(params, arch, special=SP, batch_buckets=(2,),
                          cross_kv_int8=True)
    spec = WhisperEngine(params, arch, special=SP, batch_buckets=(2,),
                         cross_kv_int8=True, spec_ngram=True, spec_window=W)
    mel = np.random.default_rng(21).standard_normal(
        (2, arch.n_mels, 100)).astype(np.float32)
    opts = GenerationOptions(max_new_tokens=10, language="en",
                             return_timestamps=True)
    a = plain.transcribe_features(mel, opts)
    b = spec.transcribe_features(mel, opts)
    np.testing.assert_array_equal(a.num_generated, b.num_generated)
    for i, n in enumerate(a.num_generated):
        upto = a.prompt_len + int(n)
        np.testing.assert_array_equal(b.tokens[i, :upto], a.tokens[i, :upto])


def test_from_checkpoint_layer_skip_draft(tmp_path_factory):
    from make_tiny_checkpoint import make_checkpoint

    from thewhisper_tpu.engine import WhisperEngine

    path = make_checkpoint(
        str(tmp_path_factory.mktemp("ckpt") / "tiny-spec"), seed=3)
    plain = WhisperEngine.from_checkpoint(
        path, chunk_length_s=10, compute_dtype=jnp.float32)
    spec = WhisperEngine.from_checkpoint(
        path, chunk_length_s=10, compute_dtype=jnp.float32,
        draft="layer-skip:1", spec_window=2)
    assert spec.draft_arch.decoder_layers == 1
    mel = np.random.default_rng(9).standard_normal(
        (1, plain.arch.n_mels, 60)).astype(np.float32)
    opts = GenerationOptions(max_new_tokens=8, language="en")
    a = plain.transcribe_features(mel, opts)
    b = spec.transcribe_features(mel, opts)
    np.testing.assert_array_equal(a.num_generated, b.num_generated)
    n = a.prompt_len + int(a.num_generated[0])
    np.testing.assert_array_equal(b.tokens[0, :n], a.tokens[0, :n])


def test_from_checkpoint_two_model_draft(tmp_path_factory):
    """A full HF checkpoint directory as the draft (the two-model
    speculation the XL economics call for: e.g. turbo drafting for
    large-v3 — same d_model, separate weights). Different random weights
    make an adversarial draft; output must still equal plain greedy.
    Ref: /root/reference has no speculative decoding — capability
    addition, exactness contract per engine/speculative.py."""
    from make_tiny_checkpoint import make_checkpoint

    from thewhisper_tpu.engine import WhisperEngine

    base = tmp_path_factory.mktemp("ckpt2")
    target = make_checkpoint(str(base / "target"), seed=3)
    draft = make_checkpoint(str(base / "draft"), seed=4)
    plain = WhisperEngine.from_checkpoint(
        target, chunk_length_s=10, compute_dtype=jnp.float32)
    spec = WhisperEngine.from_checkpoint(
        target, chunk_length_s=10, compute_dtype=jnp.float32,
        draft=draft, spec_window=2)
    assert spec.draft_arch is not None
    assert spec.draft_arch.d_model == plain.arch.d_model
    mel = np.random.default_rng(11).standard_normal(
        (1, plain.arch.n_mels, 60)).astype(np.float32)
    opts = GenerationOptions(max_new_tokens=8, language="en")
    a = plain.transcribe_features(mel, opts)
    b = spec.transcribe_features(mel, opts)
    np.testing.assert_array_equal(a.tokens, b.tokens)
    np.testing.assert_array_equal(a.num_generated, b.num_generated)
    assert b.spec_rounds is not None and b.spec_rounds >= 1

"""End-to-end checkpoint loading: safetensors -> engine -> pipeline w/ real tokenizer."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tools")


@pytest.fixture(scope="session")
def tiny_ckpt(tmp_path_factory):
    from make_tiny_checkpoint import make_checkpoint

    path = tmp_path_factory.mktemp("ckpt") / "tiny"
    return make_checkpoint(str(path), seed=0)


def test_from_checkpoint_loads(tiny_ckpt):
    import jax.numpy as jnp

    from thewhisper_tpu.engine import WhisperEngine

    eng = WhisperEngine.from_checkpoint(
        tiny_ckpt, chunk_length_s=30, compute_dtype=jnp.float32)
    assert eng.arch.vocab_size == 51866
    assert eng.arch.n_mels == 128
    assert eng.arch.alignment_heads == ((1, 0), (1, 2))
    assert eng.special.eot == 50257
    assert eng.build_prompt("en") == [50258, 50259, 50360, 50364]
    assert eng._begin_suppress is not None  # from generation_config


def test_flexible_chunk_position_modes(tiny_ckpt):
    import jax.numpy as jnp

    from thewhisper_tpu.models.load import load_checkpoint

    p_trunc, arch = load_checkpoint(
        tiny_ckpt, chunk_length_s=10, position_mode="truncate",
        dtype=jnp.float32)
    assert p_trunc["encoder"]["pos_emb"].shape[0] == 500
    p_interp, _ = load_checkpoint(
        tiny_ckpt, chunk_length_s=10, position_mode="interpolate",
        dtype=jnp.float32)
    assert p_interp["encoder"]["pos_emb"].shape[0] == 500
    # Truncation keeps original rows; interpolation changes them.
    full, _ = load_checkpoint(tiny_ckpt, chunk_length_s=30, dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(p_trunc["encoder"]["pos_emb"]),
        np.asarray(full["encoder"]["pos_emb"][:500]))
    assert not np.allclose(
        np.asarray(p_interp["encoder"]["pos_emb"]),
        np.asarray(full["encoder"]["pos_emb"][:500]))


def test_special_token_ids_match_tokenizer(tiny_ckpt):
    """Pin every SpecialTokens id to the real tokenizer's vocabulary.

    Regression for the no_speech off-by-one: 50362 is <|startofprev|>;
    <|nospeech|> is 50363 (= no_timestamps - 1, the HF convention)."""
    from transformers import WhisperTokenizerFast

    from thewhisper_tpu.config import SpecialTokens

    tok = WhisperTokenizerFast.from_pretrained(tiny_ckpt)
    sp = SpecialTokens.for_vocab(51866)
    ids = tok.convert_tokens_to_ids
    assert sp.eot == ids("<|endoftext|>")
    assert sp.sot == ids("<|startoftranscript|>")
    assert sp.first_language == ids("<|en|>")
    assert sp.translate == ids("<|translate|>")
    assert sp.transcribe == ids("<|transcribe|>")
    assert sp.no_speech == ids("<|nospeech|>")
    assert sp.no_timestamps == ids("<|notimestamps|>")
    assert sp.timestamp_begin == ids("<|0.00|>")
    assert sp.no_speech == sp.no_timestamps - 1
    # 51865-vocab family sits one lower in the same relative layout.
    sp_old = SpecialTokens.for_vocab(51865)
    assert sp_old.no_speech == sp_old.no_timestamps - 1 == 50362


def test_position_mode_autodetect(tiny_ckpt, tmp_path):
    """Default position_mode: flexible fine-tune -> truncate, stock HF ->
    interpolate (what the load_checkpoint docstring promises)."""
    import jax.numpy as jnp

    from thewhisper_tpu.config import ARCH_PRESETS
    from thewhisper_tpu.models.checkpoint import save_hf_checkpoint
    from thewhisper_tpu.models.load import load_checkpoint
    from thewhisper_tpu.models.whisper import init_params

    # Stock checkpoint (no marker): default must interpolate.
    p_default, _ = load_checkpoint(tiny_ckpt, chunk_length_s=10,
                                   dtype=jnp.float32)
    p_interp, _ = load_checkpoint(tiny_ckpt, chunk_length_s=10,
                                  position_mode="interpolate",
                                  dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(p_default["encoder"]["pos_emb"]),
        np.asarray(p_interp["encoder"]["pos_emb"]))

    # Flexible fine-tune export (chunk_length marker): default must truncate.
    import dataclasses
    arch = dataclasses.replace(
        ARCH_PRESETS["tiny"], vocab_size=51866, n_mels=128)
    params = init_params(arch, seed=0)
    flex = str(tmp_path / "flex")
    save_hf_checkpoint(params, arch, flex, chunk_length_s=10)
    p_flex, _ = load_checkpoint(flex, chunk_length_s=10, dtype=jnp.float32)
    full = np.asarray(params["encoder"]["pos_emb"])
    np.testing.assert_allclose(
        np.asarray(p_flex["encoder"]["pos_emb"]), full[:500], atol=1e-6)

    # Directory-scheme marker ({N}sec path component) also means flexible.
    sec_dir = tmp_path / "free" / "S" / "10sec"
    save_hf_checkpoint(params, arch, str(sec_dir))
    p_sec, _ = load_checkpoint(str(sec_dir), chunk_length_s=10,
                               dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(p_sec["encoder"]["pos_emb"]), full[:500], atol=1e-6)


def test_pipeline_with_real_checkpoint_and_tokenizer(tiny_ckpt):
    import jax.numpy as jnp

    from thewhisper_tpu.pipeline import ASRPipeline

    pipe = ASRPipeline(tiny_ckpt, chunk_length_s=10, compute_dtype=jnp.float32)
    assert pipe.tokenizer is not None
    audio = (0.1 * np.random.default_rng(0).standard_normal(32000)).astype(np.float32)
    out = pipe(audio, return_timestamps="word",
               generate_kwargs={"max_new_tokens": 8, "language": "en"})
    assert isinstance(out["text"], str)
    for ch in out["chunks"]:
        assert isinstance(ch["text"], str)
        assert len(ch["timestamp"]) == 2


def test_model_size_s_transcript_parity(tiny_ckpt):
    """The quality gate for shipping "S" = int8 end to end (W8A8
    encoder + weight-only int8 decoder + int8 cross-KV) as the default:
    pipeline transcripts must MATCH the unquantized bf16 pipeline on the
    synthetic checkpoint (VERDICT r4 weak #6). "S-legacy" (weight-only)
    must also still build."""
    import jax.numpy as jnp

    from thewhisper_tpu.pipeline import ASRPipeline

    audio = (0.1 * np.random.default_rng(7).standard_normal(48000)
             ).astype(np.float32)
    kw = {"max_new_tokens": 12, "language": "en"}

    base = ASRPipeline(tiny_ckpt, chunk_length_s=10,
                       compute_dtype=jnp.bfloat16)
    s = ASRPipeline(tiny_ckpt, model_size="S", chunk_length_s=10)
    enc_leaf = s.engine.params["encoder"]["layers"]["mlp"]["fc1_w"]
    dec_leaf = s.engine.params["decoder"]["layers"]["mlp"]["fc1_w"]
    assert set(enc_leaf) == {"q8", "s8"}        # W8A8 encoder
    assert "q" in dec_leaf                      # int8 decoder (maybe fused)
    assert s.engine.cross_kv_int8

    out_b = base(audio, return_timestamps="word", generate_kwargs=dict(kw))
    out_s = s(audio, return_timestamps="word", generate_kwargs=dict(kw))
    assert out_s["text"] == out_b["text"]
    # Word boundaries may move by at most one 20 ms alignment frame.
    for cb, cs in zip(out_b["chunks"], out_s["chunks"]):
        assert cb["text"] == cs["text"]
        for tb, ts in zip(cb["timestamp"], cs["timestamp"]):
            if tb is not None and ts is not None:
                assert abs(tb - ts) <= 0.021

    legacy = ASRPipeline(tiny_ckpt, model_size="S-legacy", chunk_length_s=10)
    enc_leaf_l = legacy.engine.params["encoder"]["layers"]["mlp"]["fc1_w"]
    assert not isinstance(enc_leaf_l, dict)     # encoder stays bf16
    out_l = legacy(audio, return_timestamps="word",
                   generate_kwargs=dict(kw))
    assert out_l["text"] == out_b["text"]


def test_parity_with_hf_on_checkpoint(tiny_ckpt):
    """Teacher-forced logits of the loaded checkpoint match HF torch."""
    import torch
    import jax.numpy as jnp
    from transformers import WhisperForConditionalGeneration

    from thewhisper_tpu.models.load import load_checkpoint
    from thewhisper_tpu.models.whisper import decoder_train_forward, encoder_forward

    model = WhisperForConditionalGeneration.from_pretrained(tiny_ckpt).eval()
    params, arch = load_checkpoint(tiny_ckpt, chunk_length_s=30, dtype=jnp.float32)

    rng = np.random.default_rng(5)
    mel = rng.standard_normal((1, 128, 3000)).astype(np.float32)
    tokens = np.array([[50258, 50259, 50360, 50364]], dtype=np.int64)
    with torch.no_grad():
        ref = model(input_features=torch.from_numpy(mel),
                    decoder_input_ids=torch.from_numpy(tokens)).logits.numpy()
    enc = encoder_forward(params, jnp.asarray(mel), arch)
    ours = np.asarray(decoder_train_forward(params, jnp.asarray(tokens), enc, arch))
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_end_to_end_greedy_parity_with_torch(tiny_ckpt):
    """Engine greedy tokens == torch greedy loop on the same checkpoint."""
    import torch
    import jax.numpy as jnp
    from transformers import WhisperForConditionalGeneration

    from thewhisper_tpu.config import GenerationOptions
    from thewhisper_tpu.engine import WhisperEngine
    from thewhisper_tpu.audio.features import LogMelFeaturizer

    model = WhisperForConditionalGeneration.from_pretrained(tiny_ckpt).eval()
    eng = WhisperEngine.from_checkpoint(
        tiny_ckpt, chunk_length_s=30, compute_dtype=jnp.float32)
    # Drop begin-suppress for exact comparability with the bare torch loop.
    eng._begin_suppress = None

    feat = LogMelFeaturizer(n_mels=128, chunk_length_s=30.0, use_pallas=False)
    audio = (0.2 * np.sin(2 * np.pi * 260 * np.arange(64000) / 16000)
             ).astype(np.float32)
    mel = np.asarray(feat(audio))

    prompt = np.asarray(eng.build_prompt("en"), dtype=np.int64)
    max_new = 10
    with torch.no_grad():
        tokens = torch.from_numpy(prompt[None, :])
        feats = torch.from_numpy(mel)
        for _ in range(max_new):
            logits = model(input_features=feats,
                           decoder_input_ids=tokens).logits
            nxt = logits[:, -1].argmax(-1)
            tokens = torch.cat([tokens, nxt[:, None]], dim=1)
            if int(nxt[0]) == eng.special.eot:
                break
    ref = tokens[0, len(prompt):].numpy()

    res = eng.transcribe_features(
        mel, GenerationOptions(max_new_tokens=max_new, language="en"))
    n = min(len(ref), int(res.num_generated[0]) + 1)
    ours = res.tokens[0, res.prompt_len: res.prompt_len + n]
    np.testing.assert_array_equal(ours, ref[:n])


def test_beam_search_parity_with_hf(tiny_ckpt):
    """Beam search (num_beams=3) selects the same sequence HF's
    BeamSearchScorer does — pins the length normalization to HF's
    (sum_logprobs / full-hypothesis-length ** penalty)."""
    import torch
    import jax.numpy as jnp
    from transformers import WhisperForConditionalGeneration

    from thewhisper_tpu.audio.features import LogMelFeaturizer
    from thewhisper_tpu.config import GenerationOptions
    from thewhisper_tpu.engine import WhisperEngine

    model = WhisperForConditionalGeneration.from_pretrained(tiny_ckpt).eval()
    eng = WhisperEngine.from_checkpoint(
        tiny_ckpt, chunk_length_s=30, compute_dtype=jnp.float32)

    feat = LogMelFeaturizer(n_mels=128, chunk_length_s=30.0, use_pallas=False)
    audio = (0.2 * np.sin(2 * np.pi * 260 * np.arange(64000) / 16000)
             ).astype(np.float32)
    mel = np.asarray(feat(audio))

    max_new = 8
    with torch.no_grad():
        ref = model.generate(
            input_features=torch.from_numpy(mel.copy()),
            num_beams=3, do_sample=False, max_new_tokens=max_new,
            language="en", task="transcribe", return_timestamps=False)
    ref_ids = [t for t in ref[0].numpy().tolist()
               if t < eng.special.eot][0:]

    res = eng.transcribe_features(
        mel, GenerationOptions(max_new_tokens=max_new, language="en",
                               num_beams=3))
    n = int(res.num_generated[0])
    ours = [t for t in res.tokens[0, res.prompt_len: res.prompt_len + n]
            .tolist() if t < eng.special.eot]
    assert ours == ref_ids


def test_full_hf_pipeline_transcript_parity(tiny_ckpt):
    """The strongest offline parity check: HF's own ASR pipeline (torch
    feature extractor + generate + decode) and our TPU pipeline produce the
    IDENTICAL transcript for the same checkpoint and audio."""
    import warnings

    import torch
    import jax.numpy as jnp
    from transformers import pipeline as hf_pipeline

    from thewhisper_tpu.pipeline import ASRPipeline

    hf = hf_pipeline("automatic-speech-recognition", model=tiny_ckpt,
                     device="cpu", dtype=torch.float32)
    audio = (0.2 * np.sin(2 * np.pi * 260 * np.arange(64000) / 16000)
             ).astype(np.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref = hf(audio.copy(), generate_kwargs={
            "language": "en", "task": "transcribe", "num_beams": 1,
            "do_sample": False, "max_new_tokens": 10})

    ours = ASRPipeline(tiny_ckpt, chunk_length_s=30, compute_dtype=jnp.float32)
    out = ours(audio, generate_kwargs={"max_new_tokens": 10, "language": "en"})
    assert out["text"] == ref["text"]


def test_ingest_checkpoint_runbook(tiny_ckpt, tmp_path):
    """Day-one runbook (round-2 review #9): HF dir -> quantize -> warm
    compile cache -> smoke transcription -> manifest eval, end to end on
    the synthetic HF-layout checkpoint."""
    import json
    import wave

    from ingest_checkpoint import main as ingest_main

    # Two-sample manifest with synthetic WAVs.
    sr = 16000
    manifest = tmp_path / "dev.jsonl"
    lines = []
    for i, freq in enumerate((260, 410)):
        t = np.arange(sr * 2) / sr
        pcm = (0.2 * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
        wav = tmp_path / f"s{i}.wav"
        with wave.open(str(wav), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(pcm.tobytes())
        lines.append(json.dumps({"audio": str(wav), "text": "a test"}))
    manifest.write_text("\n".join(lines) + "\n")

    report_path = tmp_path / "ingest.json"
    report = ingest_main([
        tiny_ckpt, "--mode", "S", "--chunk-length", "10",
        "--warm-batches", "1,2", "--max-new", "8", "--cpu",
        "--dtype", "float32",
        "--eval-manifest", str(manifest), "--eval-batch-size", "2",
        "--report", str(report_path),
    ])
    assert report["ok"] and report["mode"] == "S"
    assert set(report["warm_compile_s"]) == {"bs1", "bs2",
                                             "stream_fused_bs1"}
    assert report["smoke"]["n_words"] >= 0
    assert "wer" in report["eval"] and report["eval"]["n_samples"] == 2
    # The report round-trips from disk too.
    on_disk = json.loads(report_path.read_text())
    assert on_disk["ok"] is True

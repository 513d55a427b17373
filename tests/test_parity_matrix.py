"""End-to-end transcript-parity matrix vs HF torch (round-2 review #4).

The strongest WER proxy available in a no-egress image: on the
structurally-real tiny checkpoint, the engine's generated TOKENS must be
identical to HF ``WhisperForConditionalGeneration.generate`` across

  {10, 15, 20, 30} s buckets x {greedy, beam=3} x {timestamps on/off}
  x {fp32, int8-S weights} x {forced, detected language}

plus the long-form LCS-windowed pipeline vs HF's chunked ASR pipeline.

Bucket cells < 30 s patch the HF model the way the reference's NVIDIA
path does (``nvidia/asr_pipeline.py:15-27``: ``F.interpolate`` the encoder
positional embedding to ``1500 * chunk / 30`` and shrink
``max_source_positions``), matching our loader's default interpolate mode
for stock checkpoints. int8-S cells load the SAME dequantized weights into
the HF model (weight-only int8 means the effective weights are exactly
``q * s``; cross-KV int8 — an extra approximation with no HF analog — is
covered separately by tests/test_quant_beam.py).

Documented divergence: the word-timestamp LONG-FORM merge follows the
reference's timestamp-aware LCS patch (``__init__.py:75-94``), which stock
HF does not have — so the long-form cell runs return_timestamps=False
(token-LCS, identical algorithms); the timestamps dimension is exercised
on single-window cells where capture must not perturb tokens.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tools")

BUCKETS = (10, 15, 20, 30)
MAX_NEW = 8


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from make_tiny_checkpoint import make_checkpoint

    path = tmp_path_factory.mktemp("ckpt") / "tiny"
    return make_checkpoint(str(path), seed=0)


def _audio(bucket_s: int) -> np.ndarray:
    """Deterministic tonal audio filling the bucket (non-trivial tokens)."""
    t = np.arange(bucket_s * 16000) / 16000.0
    sig = (0.2 * np.sin(2 * np.pi * 260 * t)
           + 0.1 * np.sin(2 * np.pi * 410 * t + 0.5)
           + 0.05 * np.sin(2 * np.pi * 97 * t))
    return sig.astype(np.float32)


def _patched_hf_model(ckpt: str, bucket_s: int, params=None):
    """HF model with reference-style flexible-chunk patching and
    (optionally) our dequantized int8-S decoder weights swapped in."""
    import torch
    import torch.nn.functional as F
    from transformers import WhisperForConditionalGeneration

    model = WhisperForConditionalGeneration.from_pretrained(ckpt).eval()
    if params is not None:
        _load_dequantized_decoder(model, params)
    if bucket_s < 30:
        n = int(1500 * bucket_s / 30)
        emb = model.model.encoder.embed_positions.weight.data  # (1500, d)
        new = F.interpolate(emb.t()[None], size=n, mode="linear",
                            align_corners=False)[0].t().contiguous()
        model.model.encoder.embed_positions = torch.nn.Embedding.from_pretrained(
            new, freeze=True)
        model.config.max_source_positions = n
        model.model.encoder.config.max_source_positions = n
        if hasattr(model.generation_config, "max_source_positions"):
            model.generation_config.max_source_positions = n
    return model


def _load_dequantized_decoder(model, params) -> None:
    """Write our int8-S decoder's EFFECTIVE weights (q * s) into the HF
    torch model so both sides compute with identical values."""
    import torch

    from thewhisper_tpu.models.quant import dequantize_weight, is_quantized

    dec = params["decoder"]
    emb = dec["token_emb"]
    if is_quantized(emb):
        table = np.asarray(emb["q"], np.float32) * \
            np.asarray(emb["s"], np.float32)[:, None]
        with torch.no_grad():
            model.model.decoder.embed_tokens.weight.copy_(
                torch.from_numpy(table))
            model.proj_out.weight.copy_(torch.from_numpy(table))  # tied

    def put(linear, leaf, i):
        if not is_quantized(leaf):
            return
        w = np.asarray(dequantize_weight(leaf), np.float32)[i]  # (in, out)
        with torch.no_grad():
            linear.weight.copy_(torch.from_numpy(np.ascontiguousarray(w.T)))

    layers = dec["layers"]
    for i, layer in enumerate(model.model.decoder.layers):
        for ours, theirs in (("self", layer.self_attn),
                             ("cross", layer.encoder_attn)):
            put(theirs.q_proj, layers[ours]["q_w"], i)
            put(theirs.k_proj, layers[ours]["k_w"], i)
            put(theirs.v_proj, layers[ours]["v_w"], i)
            put(theirs.out_proj, layers[ours]["o_w"], i)
        put(layer.fc1, layers["mlp"]["fc1_w"], i)
        put(layer.fc2, layers["mlp"]["fc2_w"], i)


def _build_engine(ckpt: str, bucket_s: int, quant):
    import jax.numpy as jnp

    from thewhisper_tpu.config import SpecialTokens
    from thewhisper_tpu.engine import WhisperEngine
    from thewhisper_tpu.models.load import load_checkpoint
    from thewhisper_tpu.models.quant import quantize_params

    params, arch = load_checkpoint(ckpt, chunk_length_s=bucket_s,
                                   dtype=jnp.float32)
    if quant == "int8":
        params = quantize_params(params, components=("decoder",))
    import json
    import os

    with open(os.path.join(ckpt, "generation_config.json")) as f:
        gc = json.load(f)
    eng = WhisperEngine(
        params, arch, compute_dtype=jnp.float32,
        suppress_tokens=gc.get("suppress_tokens") or [],
        begin_suppress_tokens=gc.get("begin_suppress_tokens") or [],
        # cross-KV int8 is an extra approximation with no HF analog;
        # the weight path is what this matrix pins.
        cross_kv_int8=False,
    )
    return eng, params


def _hf_generate_ids(model, mel, *, num_beams, language, eot):
    import torch

    kwargs = dict(num_beams=num_beams, do_sample=False,
                  max_new_tokens=MAX_NEW, task="transcribe",
                  return_timestamps=False)
    if language is not None:
        kwargs["language"] = language
    with torch.no_grad():
        out = model.generate(
            input_features=torch.from_numpy(np.asarray(mel).copy()), **kwargs)
    return [t for t in out[0].numpy().tolist() if t < eot]


@pytest.mark.parametrize("quant", [None, "int8"],
                         ids=["fp32", "int8S"])
@pytest.mark.parametrize("bucket_s", BUCKETS)
def test_transcript_parity_matrix(ckpt, bucket_s, quant):
    """Token-identical generate across beams x timestamps x language for
    one (bucket, quantization) cell."""
    from thewhisper_tpu.audio.features import LogMelFeaturizer
    from thewhisper_tpu.config import GenerationOptions

    eng, params = _build_engine(ckpt, bucket_s, quant)
    hf = _patched_hf_model(ckpt, bucket_s,
                           params=params if quant == "int8" else None)
    feat = LogMelFeaturizer(n_mels=128, chunk_length_s=float(bucket_s),
                            use_pallas=False)
    mel = np.asarray(feat(_audio(bucket_s)))
    eot = eng.special.eot

    failures = []
    for num_beams in (1, 3):
        for language in ("en", None):
            ref = _hf_generate_ids(hf, mel, num_beams=num_beams,
                                   language=language, eot=eot)
            for timestamps in (False, True):
                opts = GenerationOptions(
                    max_new_tokens=MAX_NEW, language=language,
                    num_beams=num_beams, return_timestamps=timestamps)
                languages = None
                if language is None:
                    codes, _ = eng.detect_language(mel)
                    languages = [str(c) for c in codes]
                res = eng.transcribe_features(mel, opts, languages=languages)
                n = int(res.num_generated[0])
                ours = [t for t in res.tokens[
                    0, res.prompt_len: res.prompt_len + n].tolist()
                    if t < eot]
                if ours != ref:
                    failures.append(
                        (num_beams, language, timestamps, ours, ref))
    assert not failures, failures


def test_longform_lcs_transcript_parity(ckpt):
    """25 s of audio through our windowed pipeline (9 s windows, 1/6
    stride, token-LCS merge) == HF's chunked ASR pipeline with the same
    chunking — the long-form cell of the matrix."""
    import warnings

    import torch
    import jax.numpy as jnp
    from transformers import pipeline as hf_pipeline

    from thewhisper_tpu.pipeline import ASRPipeline

    audio = np.concatenate([_audio(10), _audio(10)[::-1], _audio(5)])
    hf = hf_pipeline("automatic-speech-recognition", model=ckpt,
                     device="cpu", dtype=torch.float32,
                     chunk_length_s=9)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref = hf(audio.copy(), generate_kwargs={
            "language": "en", "task": "transcribe", "num_beams": 1,
            "do_sample": False, "max_new_tokens": MAX_NEW})

    ours = ASRPipeline(ckpt, chunk_length_s=30, compute_dtype=jnp.float32)
    out = ours(audio, chunk_length_s=9, generate_kwargs={
        "max_new_tokens": MAX_NEW, "language": "en"})
    assert out["text"] == ref["text"]

    # return_timestamps=True cell (the HF segment surface the reference's
    # NVIDIA path inherits): segment chunks are derived from the word
    # alignment, so the generated tokens — and hence the transcript —
    # must STILL match the HF reference exactly, now with monotone
    # (start, end) segment spans attached. (HF itself re-decodes with
    # timestamp tokens in this mode, a documented divergence: our text is
    # pinned to the no-timestamps decode on every path.)
    seg = ours(audio, chunk_length_s=9, return_timestamps=True,
               generate_kwargs={"max_new_tokens": MAX_NEW,
                                "language": "en"})
    assert seg["text"] == ref["text"]
    assert seg["chunks"], "segment mode returned no chunks"
    assert "".join(c["text"] for c in seg["chunks"]) == seg["text"]
    dur = len(audio) / 16000.0
    prev = 0.0
    for ch in seg["chunks"]:
        s, e = ch["timestamp"]
        assert s is not None and 0.0 <= s <= dur + 1.0
        if e is not None:
            assert s <= e <= dur + 1.0
            prev = max(prev, e)

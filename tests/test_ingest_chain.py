"""Day-one runbook chain: ingest -> quantize -> warm -> eval-on-manifest.

One test drives ``tools/ingest_checkpoint.py`` end to end on the synthetic
HF checkpoint (round-3 review #9): the exact command path a user runs on
day one with real weights, pinned in CI so the runbook cannot rot. The
air-gapped eval leg (``benchmark/data_utils.load_manifest`` +
``eval_utils.evaluate_dataset``) is the offline counterpart of the OpenASR
harness (reference ``benchmark/run_evaluation.py``).
"""

import json
import sys
import wave

import numpy as np
import pytest

sys.path.insert(0, "tools")


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from make_tiny_checkpoint import make_checkpoint

    path = tmp_path_factory.mktemp("ckpt") / "tiny"
    return make_checkpoint(str(path), seed=0)


def _write_wav(path, seconds, freq, seed):
    t = np.arange(int(seconds * 16000)) / 16000.0
    rng = np.random.default_rng(seed)
    sig = (0.2 * np.sin(2 * np.pi * freq * t)
           + 0.02 * rng.standard_normal(t.size))
    pcm = (np.clip(sig, -1, 1) * 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    return str(path)


def test_ingest_chain_full(ckpt, tmp_path):
    from ingest_checkpoint import main as ingest_main

    manifest = tmp_path / "dev.jsonl"
    with open(manifest, "w") as f:
        for i, (secs, freq, text) in enumerate(
                [(2.0, 260, "hello there"), (3.0, 330, "general kenobi"),
                 (1.5, 200, "short one")]):
            wav = _write_wav(tmp_path / f"s{i}.wav", secs, freq, seed=i)
            f.write(json.dumps({"audio": wav, "text": text}) + "\n")

    report_path = tmp_path / "ingest.json"
    report = ingest_main([
        ckpt, "--mode", "S", "--chunk-length", "10",
        "--warm-batches", "1,2", "--max-new", "8",
        "--eval-manifest", str(manifest), "--eval-batch-size", "2",
        "--dtype", "float32", "--cpu", "--report", str(report_path),
    ])

    assert report["ok"] is True
    assert report["mode"] == "S"
    # Quantize leg: int8-S params are strictly smaller than bf16 would be.
    assert report["param_bytes"] > 0
    assert report["vocab_size"] == 51866
    # Warm leg: every requested bucket plus the streaming fused program.
    assert set(report["warm_compile_s"]) == {"bs1", "bs2",
                                             "stream_fused_bs1"}
    # Smoke leg ran a real windowed transcription with word timestamps.
    assert report["smoke"]["seconds"] > 0
    # Eval leg: WER/CER/RTFx computed over the manifest (random weights ->
    # WER ~1.0; the chain, not the quality, is under test).
    ev = report["eval"]
    assert ev["n_samples"] == 3
    assert ev["wer"] >= 0.0 and ev["cer"] >= 0.0
    assert ev["rtfx"] > 0
    # The report round-trips as the single JSON line the runbook prints.
    on_disk = json.loads(report_path.read_text())
    assert on_disk == json.loads(json.dumps(report))


def test_bench_checkpoint_flag(ckpt):
    """bench.py --checkpoint routes the headline model through the same
    loader the ingest runbook uses (VERDICT r4 #9: the day real weights
    land, every bench key is one command away). CI exercises the loading
    helper on the synthetic checkpoint; the full bench run needs the
    real chip."""
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    import bench

    import dataclasses

    from thewhisper_tpu.config import ARCH_PRESETS

    fallback = dataclasses.replace(
        ARCH_PRESETS["large-v3-turbo"],
        alignment_heads=((1, 0), (2, 3), (3, 7)))
    params, arch = bench.load_headline_params(
        ckpt, 10.0, jnp.bfloat16, fallback)
    assert arch.vocab_size == 51866
    assert arch.max_source_positions == 500          # 10 s bucket
    assert arch.alignment_heads                      # inherited if absent
    assert params["decoder"]["token_emb"].shape[0] == 51866
    # No checkpoint -> random init on the fallback arch (default path).
    params_r, arch_r = bench.load_headline_params(
        None, 10.0, jnp.bfloat16, fallback)
    assert arch_r is fallback
    assert params_r["decoder"]["token_emb"].shape[0] == fallback.vocab_size

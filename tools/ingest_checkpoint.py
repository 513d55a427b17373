"""Day-one real-weights runbook: HF checkpoint -> quantize -> warm -> eval.

One tested command path from a downloaded HF Whisper checkpoint directory
to a production-ready engine (round-2 review #9). On a networked host:

    huggingface-cli download TheStageAI/thewhisper-large-v3-turbo --local-dir ckpt
    python tools/ingest_checkpoint.py ckpt --mode S --chunk-length 30 \
        --warm-batches 1,8 --eval-manifest dev.jsonl --report ingest.json

Steps (each timed and reported in the JSON summary):

1. **Load + convert**: HF safetensors -> JAX pytree at the requested chunk
   length (flexible-chunk position handling autodetected,
   ``models/load.py``), quantized per ``--mode``:
   ``XL`` = bf16, ``S`` = int8 weight-only decoder + int8 cross-KV (the
   reference's quantized engines, ``benchmark/README.md:92-94``),
   ``S+`` = S plus W8A8 encoder.
2. **Warm**: pre-compile the generate executables for every
   (batch bucket, max_new) combination plus the streaming fused program —
   populating the persistent XLA compile cache so the serving process
   starts hot (``WHISPER_PERSISTENT_CACHE``, ``engine/engine.py``).
3. **Smoke transcription**: one synthetic window through the full
   pipeline proves tokens decode and word timestamps align.
4. **Eval** (optional): WER/CER/RTFx over a local jsonl manifest
   (``{"audio": wav, "text": ...}`` per line, ``benchmark/data_utils.py``)
   — air-gapped counterpart of the OpenASR harness.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODES = {"XL": None, "S": "int8-all", "S+": "int8-all",
         "S-legacy": "int8"}


def ingest(
    checkpoint: str,
    mode: str = "S",
    chunk_length_s: float = 30.0,
    warm_batches=(1, 8),
    max_new_tokens: int = 128,
    language: str = "en",
    eval_manifest: str | None = None,
    eval_batch_size: int = 8,
    compute_dtype: str = "bfloat16",
    use_cpu: bool = False,
) -> dict:
    if use_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from thewhisper_tpu.models.quant import quantized_bytes
    from thewhisper_tpu.pipeline import ASRPipeline

    if mode not in MODES:
        raise SystemExit(f"--mode must be one of {sorted(MODES)}")
    report: dict = {
        "checkpoint": os.path.abspath(checkpoint),
        "mode": mode,
        "chunk_length_s": chunk_length_s,
        "backend": jax.default_backend(),
    }

    t0 = time.perf_counter()
    dtype = jnp.float32 if compute_dtype == "float32" else jnp.bfloat16
    # "S" is int8 END TO END since round 5 (W8A8 encoder + int8 decoder
    # + int8 cross-KV — the reference's quantized-engine definition);
    # "S+" is kept as an alias, "S-legacy" is the weight-only decoder.
    pipe = ASRPipeline(
        checkpoint,
        model_size={"S": "S", "S+": "S", "S-legacy": "S-legacy",
                    "XL": None}[mode],
        chunk_length_s=chunk_length_s,
        language=language,
        compute_dtype=dtype,
        batch_size=eval_batch_size,
    )
    eng = pipe.engine
    report["load_s"] = round(time.perf_counter() - t0, 2)
    report["param_bytes"] = int(quantized_bytes(eng.params))
    report["vocab_size"] = eng.arch.vocab_size
    report["n_mels"] = eng.arch.n_mels

    # -- warm the compile cache ---------------------------------------------
    t_mel = int(chunk_length_s * 100)
    warm = {}
    for b in warm_batches:
        t1 = time.perf_counter()
        eng.warmup(t_mel, batches=(b,), max_new_tokens=max_new_tokens,
                   timestamps=True)
        warm[f"bs{b}"] = round(time.perf_counter() - t1, 2)
    # Streaming fused program (audio-input path, 32-token tick).
    from thewhisper_tpu.config import GenerationOptions

    t1 = time.perf_counter()
    stream_opts = GenerationOptions(max_new_tokens=32, language=language,
                                    return_timestamps=True)
    n_samples = int(chunk_length_s * 16000)
    eng.transcribe_audio(np.zeros((1, n_samples), np.float32), stream_opts)
    warm["stream_fused_bs1"] = round(time.perf_counter() - t1, 2)
    report["warm_compile_s"] = warm

    # -- smoke transcription -------------------------------------------------
    t1 = time.perf_counter()
    t = np.arange(min(5.0, chunk_length_s) * 16000) / 16000.0
    tone = (0.2 * np.sin(2 * np.pi * 260 * t)).astype(np.float32)
    out = pipe(tone, return_timestamps="word",
               generate_kwargs={"max_new_tokens": 16, "language": language})
    report["smoke"] = {
        "seconds": round(time.perf_counter() - t1, 2),
        "text_chars": len(out["text"]),
        "n_words": len(out.get("chunks", [])),
    }

    # -- optional manifest eval ---------------------------------------------
    if eval_manifest:
        bench_dir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "benchmark")
        if bench_dir not in sys.path:
            sys.path.insert(0, bench_dir)
        from data_utils import load_manifest
        from eval_utils import evaluate_dataset

        t1 = time.perf_counter()
        metrics = evaluate_dataset(
            pipe, load_manifest(eval_manifest), language=language,
            batch_size=eval_batch_size, max_new_tokens=max_new_tokens)
        metrics["eval_s"] = round(time.perf_counter() - t1, 2)
        report["eval"] = {k: (round(v, 4) if isinstance(v, float) else v)
                          for k, v in metrics.items()}

    report["ok"] = True
    return report


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("checkpoint", help="HF Whisper checkpoint directory")
    ap.add_argument("--mode", default="S", choices=sorted(MODES),
                    help="XL=bf16, S=int8 decoder, S+=S + W8A8 encoder")
    ap.add_argument("--chunk-length", type=float, default=30.0)
    ap.add_argument("--warm-batches", default="1,8",
                    help="comma-separated batch buckets to pre-compile")
    ap.add_argument("--max-new", type=int, default=128)
    ap.add_argument("--language", default="en")
    ap.add_argument("--eval-manifest", default=None,
                    help="local jsonl manifest: {'audio': wav, 'text': ...}")
    ap.add_argument("--eval-batch-size", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=("bfloat16", "float32"))
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (testing)")
    ap.add_argument("--report", default=None, help="write JSON report here")
    args = ap.parse_args(argv)

    report = ingest(
        args.checkpoint, mode=args.mode, chunk_length_s=args.chunk_length,
        warm_batches=tuple(int(b) for b in args.warm_batches.split(",")),
        max_new_tokens=args.max_new, language=args.language,
        eval_manifest=args.eval_manifest,
        eval_batch_size=args.eval_batch_size,
        compute_dtype=args.dtype, use_cpu=args.cpu)
    line = json.dumps(report)
    print(line)
    if args.report:
        with open(args.report, "w") as f:
            f.write(line + "\n")
    return report


if __name__ == "__main__":
    main()

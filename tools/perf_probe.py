"""Round-2 perf probe on the real TPU: streaming tick + bs=32 offline RTFx.

Measures (stderr progress, final JSON on stdout):
  1. Streaming tick (9 s buffer, 10 s bucket, 32 tok + align, int8 "S"):
     two-call path (featurize + transcribe_features) vs fused
     transcribe_audio — p50/p95 over 20 reps.
  2. bs=32 x 30 s offline: encoder-ish fixed cost and decode ms/step via
     differential timing (16 vs 144 new tokens), with cross-KV bf16 vs
     int8; composite RTFx for 600 s of audio at 112 decode steps
     (round-1 methodology).

Usage: python tools/perf_probe.py [--skip-offline] [--skip-stream]
"""

import argparse
import dataclasses
import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def pctl(xs, q):
    xs = sorted(xs)
    return xs[min(int(q * len(xs)), len(xs) - 1)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-offline", action="store_true")
    ap.add_argument("--skip-stream", action="store_true")
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from thewhisper_tpu.audio.features import LogMelFeaturizer
    from thewhisper_tpu.config import ARCH_PRESETS, GenerationOptions, SpecialTokens
    from thewhisper_tpu.engine import WhisperEngine
    from thewhisper_tpu.models.quant import quantize_params
    from thewhisper_tpu.models.whisper import init_params

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    out = {}
    rng = np.random.default_rng(0)

    # ---------------- streaming tick (10 s bucket, int8 S) ----------------
    if not args.skip_stream:
        arch10 = dataclasses.replace(
            ARCH_PRESETS["large-v3-turbo"], max_source_positions=500,
            alignment_heads=((1, 0), (2, 3), (3, 7)))
        log("init turbo int8-S params (10 s bucket)...")
        t0 = time.time()
        params = quantize_params(
            init_params(arch10, seed=0, dtype=jnp.bfloat16),
            components=("decoder",))
        eng = WhisperEngine(params, arch10, compute_dtype=jnp.bfloat16,
                            batch_buckets=(1,))
        log(f"  params ready in {time.time() - t0:.0f}s")

        feat = LogMelFeaturizer(n_mels=arch10.n_mels, chunk_length_s=10.0)
        buf = (0.1 * rng.standard_normal(9 * 16000)).astype(np.float32)
        audio_pad = np.zeros((1, 10 * 16000), np.float32)
        audio_pad[0, : len(buf)] = buf
        opts = GenerationOptions(max_new_tokens=32, language="en",
                                 return_timestamps=True)

        log("compiling two-call path...")
        mel9 = np.asarray(feat(buf), dtype=np.float32)
        eng.transcribe_features(mel9, opts)
        log("compiling fused audio path...")
        eng.transcribe_audio(audio_pad, opts)

        two, fused = [], []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            mel = np.asarray(feat(buf), dtype=np.float32)
            eng.transcribe_features(mel, opts)
            two.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            eng.transcribe_audio(audio_pad, opts)
            fused.append(time.perf_counter() - t0)
        out["stream_two_call_p50_ms"] = round(statistics.median(two) * 1e3, 1)
        out["stream_two_call_p95_ms"] = round(pctl(two, 0.95) * 1e3, 1)
        out["stream_fused_p50_ms"] = round(statistics.median(fused) * 1e3, 1)
        out["stream_fused_p95_ms"] = round(pctl(fused, 0.95) * 1e3, 1)
        log(f"two-call p50/p95: {out['stream_two_call_p50_ms']}/"
            f"{out['stream_two_call_p95_ms']} ms ; fused p50/p95: "
            f"{out['stream_fused_p50_ms']}/{out['stream_fused_p95_ms']} ms")
        del eng, params

    # ---------------- offline bs=32 x 30 s ----------------
    if not args.skip_offline:
        arch30 = dataclasses.replace(
            ARCH_PRESETS["large-v3-turbo"],
            alignment_heads=((1, 0), (2, 3), (3, 7)))
        log("init turbo int8-S params (30 s bucket)...")
        t0 = time.time()
        params = quantize_params(
            init_params(arch30, seed=0, dtype=jnp.bfloat16),
            components=("decoder",))
        log(f"  params ready in {time.time() - t0:.0f}s")
        # Device-resident input: the offline measure must not pay a 61 MB
        # host->device audio transfer per call over the tunnel.
        audio32 = jax.device_put(jnp.asarray(
            (0.1 * rng.standard_normal((32, 30 * 16000))).astype(np.float32)))

        # Tunnel RTT for context (tiny jitted op round trip).
        tiny = jax.jit(lambda x: x + 1)
        z = jnp.zeros(8)
        np.asarray(tiny(z))
        rtts = []
        for _ in range(10):
            t0 = time.perf_counter()
            np.asarray(tiny(z))
            rtts.append(time.perf_counter() - t0)
        out["tunnel_rtt_ms"] = round(statistics.median(rtts) * 1e3, 1)
        log(f"tunnel RTT (tiny op round trip): {out['tunnel_rtt_ms']} ms")

        for tag, ckv8 in (("bf16ckv", False), ("int8ckv", True)):
            eng = WhisperEngine(
                params, arch30, compute_dtype=jnp.bfloat16,
                batch_buckets=(32,), cross_kv_int8=ckv8,
                suppress_tokens=[SpecialTokens().eot])
            short = GenerationOptions(max_new_tokens=16, language="en")
            long_ = GenerationOptions(max_new_tokens=144, language="en")
            log(f"[{tag}] compiling bs=32 programs (16/144 tok)...")
            eng.transcribe_audio(audio32, short)
            eng.transcribe_audio(audio32, long_)

            def timed(o, n=4):
                ts = []
                for _ in range(n):
                    t0 = time.perf_counter()
                    eng.transcribe_audio(audio32, o)
                    ts.append(time.perf_counter() - t0)
                return statistics.median(ts)

            t_short = timed(short)
            t_long = timed(long_)
            ms_step = (t_long - t_short) / (144 - 16) * 1e3
            fixed = t_short - 16 * ms_step / 1e3   # featurize+encode+prefill
            rtfx112 = 600.0 / (fixed + 112 * ms_step / 1e3)
            rtfx224 = 600.0 / (fixed + 224 * ms_step / 1e3)
            out[f"offline_{tag}_ms_per_step"] = round(ms_step, 2)
            out[f"offline_{tag}_fixed_s"] = round(fixed, 3)
            out[f"offline_{tag}_rtfx112"] = round(rtfx112, 1)
            out[f"offline_{tag}_rtfx224"] = round(rtfx224, 1)
            log(f"[{tag}] 16tok {t_short*1e3:.0f} ms, 144tok "
                f"{t_long*1e3:.0f} ms -> {ms_step:.2f} ms/step, fixed "
                f"{fixed*1e3:.0f} ms, RTFx112 {rtfx112:.0f}, RTFx224 "
                f"{rtfx224:.0f}")
            del eng

    print(json.dumps(out))


if __name__ == "__main__":
    main()

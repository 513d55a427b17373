"""Streaming-tail soak: full StreamingPipeline, minutes long (r3 rev #5).

Round 3 reported the streaming tick p95 from 20 raw fused-program calls
and it ranged 68-121 ms across runs with no attribution. This probe
drives the REAL streaming stack — VAD gate, rolling buffer, commit/trim
state machine, LocalWhisperBackend with cross-tick proposal reuse — over
minutes of speech-like audio (``vad_holdout.holdout_speech``: the VAD
must actually open) fed in 0.05 s chunks, and reports:

- p50/p95/p99 and worst PROCESSING tick (ticks that ran a transcription),
- per-stage attribution from the pipeline's stats deltas
  (vad / transcribe / postprocess) plus the tunnel RTT measured in-run,
- spec-reuse ON vs OFF (sequential runs over the same audio).

"0 committed words" is EXPECTED with random weights: greedy decode
settles into repetition and the reference's zlib gibberish filter
(ratio > 2.2) correctly drops the whole transcription — the filter
fires AFTER the transcription ran, so every latency number is real;
only the commit bookkeeping goes unexercised (covered on CPU by the
fake-backend state-machine tests).

MEASURED (round 4, v5e, RTT 29.7 ms that run, warmed buckets):
reuse=ON p50/p95/p99/max 58.7 / 71.4 / 106.3 / 437 ms over 801 ticks;
reuse=OFF 64.8 / 78.9 / 103.7 / 185 ms — reuse wins ~6 ms at p50/p95.
Median attribution: vad 8.8 + transcribe 58.6 (incl. ~30 RTT; ~25
device per the bench burst measure) + postprocess ~0. The worst ticks
are tunnel weather on the transcribe slice, not host work. Before the
warmup fix the max tick was a 2.75 s mid-soak COMPILE (the 10 s bucket
first filling) — production must warm every bucket
(tools/ingest_checkpoint.py does).

Usage: python tools/stream_soak_probe.py [--seconds 600] [--no-reuse-ab]
"""

import argparse
import dataclasses
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


def run_soak(engine, audio, reuse: bool, chunk_s: float = 0.05):
    from thewhisper_tpu.pipeline import ASRPipeline
    from thewhisper_tpu.streaming.pipeline import (
        LocalWhisperBackend, StreamingPipeline,
    )

    class IdTokenizer:
        # id -> deterministic pseudo-word: the fallback "<id>" debug
        # rendering compresses too well and trips the gibberish filter
        # (len/zlib > 2.2), so no word ever reached the commit path.
        def decode(self, ids, skip_special_tokens=True):
            out = []
            for i in ids:
                n = int(i)
                s = ""
                for _ in range(4):
                    s += chr(97 + n % 26)
                    n //= 26
                out.append(" " + s)
            return "".join(out)

    pipe = ASRPipeline(engine, tokenizer=IdTokenizer(), chunk_length_s=10,
                       latency_buckets=[9.0],
                       reuse_previous_tokens=reuse)
    backend = LocalWhisperBackend(pipe, chunk_length_s=10,
                                  max_new_tokens=32)
    sp = StreamingPipeline(backend=backend, chunk_length_s=10)
    step = int(chunk_s * 16000)
    # Warm EVERY bucket the soak will hit (9 s + 10 s, plus the reuse
    # proposal twins) by streaming the first 30 s untimed, then reset:
    # cold compiles otherwise land as multi-second "ticks" mid-soak
    # (first run measured a 2.75 s tick at #401 — the 10 s bucket
    # compiling when the buffer first filled).
    for off in range(0, 30 * 16000, step):
        sp(audio[off: off + step])
    sp.clear()
    sp.stats.update(vad_s=0.0, transcribe_s=0.0, postprocess_s=0.0,
                    chunks_processed=0)
    ticks = []          # (latency_s, vad_d, tr_d, post_d)
    prev = dict(sp.stats)
    n_words = 0
    for off in range(0, len(audio) - step, step):
        committed, assumed = sp(audio[off: off + step])
        n_words += len(committed)
        if sp.stats["chunks_processed"] != prev["chunks_processed"]:
            ticks.append((
                sp.stats["last_latency_s"],
                sp.stats["vad_s"] - prev["vad_s"],
                sp.stats["transcribe_s"] - prev["transcribe_s"],
                sp.stats["postprocess_s"] - prev["postprocess_s"],
            ))
            prev = dict(sp.stats)
    return ticks, n_words


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=600.0)
    ap.add_argument("--no-reuse-ab", action="store_true",
                    help="skip the reuse-off arm")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from thewhisper_tpu.config import ARCH_PRESETS, SpecialTokens
    from thewhisper_tpu.engine import WhisperEngine
    from thewhisper_tpu.models.quant import quantize_params
    from thewhisper_tpu.models.whisper import init_params_device
    from thewhisper_tpu.streaming.vad_holdout import holdout_speech

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    arch = dataclasses.replace(
        ARCH_PRESETS["large-v3-turbo"], max_source_positions=500,
        alignment_heads=((1, 0), (2, 3), (3, 7)))
    log("initializing turbo int8-S on device...")
    params = quantize_params(
        init_params_device(arch, seed=0, dtype=jnp.bfloat16),
        components=("decoder",))
    # Suppress every id >= EOT: the random model otherwise greedily
    # emits special tokens the word pipeline filters out, so the
    # commit/trim path would never see a word.
    sp_tok = SpecialTokens()
    engine = WhisperEngine(
        params, arch, compute_dtype=jnp.bfloat16, batch_buckets=(1,),
        cross_kv_int8=True,
        suppress_tokens=list(range(sp_tok.eot, arch.vocab_size)))

    rng = np.random.default_rng(7)
    log(f"synthesizing {args.seconds:.0f} s of speech-like audio...")
    speech, _ = holdout_speech(rng, args.seconds)
    noise = (0.01 * rng.standard_normal(len(speech))).astype(np.float32)
    audio = (speech + noise).astype(np.float32)

    # Tunnel RTT for the attribution line.
    triv = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros(())
    np.asarray(triv(z))
    rtts = []
    for _ in range(12):
        t0 = time.perf_counter()
        np.asarray(triv(z))
        rtts.append(time.perf_counter() - t0)
    rtt_ms = statistics.median(rtts) * 1e3

    arms = [("reuse=ON", True)]
    if not args.no_reuse_ab:
        arms.append(("reuse=OFF", False))
    for name, reuse in arms:
        log(f"--- soak {name} ({args.seconds:.0f} s of audio) ---")
        t0 = time.perf_counter()
        ticks, n_words = run_soak(engine, audio, reuse)
        wall = time.perf_counter() - t0
        if not ticks:
            log("  no processing ticks (VAD never opened?)")
            continue
        lat = [t[0] * 1e3 for t in ticks]
        lat_sorted = sorted(lat)
        p50, p95, p99 = (statistics.median(lat), pctl(lat, 0.95),
                         pctl(lat, 0.99))
        worst_i = int(np.argmax(lat))
        v, tr, po = ticks[worst_i][1:]
        log(f"  {len(ticks)} processing ticks in {wall:.0f} s wall, "
            f"{n_words} committed words")
        log(f"  p50/p95/p99/max tick: {p50:.1f} / {p95:.1f} / {p99:.1f} / "
            f"{lat_sorted[-1]:.1f} ms (tunnel RTT {rtt_ms:.1f} ms)")
        med_v = statistics.median([t[1] for t in ticks]) * 1e3
        med_tr = statistics.median([t[2] for t in ticks]) * 1e3
        med_po = statistics.median([t[3] for t in ticks]) * 1e3
        log(f"  median attribution: vad {med_v:.1f} + transcribe "
            f"{med_tr:.1f} (incl. ~{rtt_ms:.0f} RTT) + postprocess "
            f"{med_po:.1f} ms")
        log(f"  worst tick #{worst_i}: vad {v*1e3:.1f} + transcribe "
            f"{tr*1e3:.1f} + post {po*1e3:.1f} ms")


if __name__ == "__main__":
    main()

"""Turbo bs=1 headline A/B: settle the 3800-4115 band (VERDICT r4 #8).

The recorded turbo headline has sat below CLAUDE.md's round-2 band for
two rounds (3534, 3723 vs 3800-4115). Two hypotheses, tested in ONE
interleaved window so tunnel drift cannot bias either:

  A) current default engine (fused self-QKV — round 4 applied
     fuse_self_qkv_params to every single-chip engine on the strength
     of a large-v3 probe; it was never A/B'd on the fully-unrolled
     turbo step, whose int8 GEMV tiles differ), vs
  B) an unfused engine (the round-2/3 parameter layout), vs
  C) A with batch_buckets=(1,) (bench uses (1, 8); bucketing should be
     free but pins it).

Methodology matches bench.py: 16-vs-144-token differential on the same
10 s mel, median of 6, all arms interleaved per iteration.

Run on an idle real TPU: python tools/turbo_ab_probe.py
"""

import dataclasses
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main() -> None:
    from thewhisper_tpu.audio.features import LogMelFeaturizer
    from thewhisper_tpu.config import (
        ARCH_PRESETS,
        GenerationOptions,
        SpecialTokens,
    )
    from thewhisper_tpu.engine.engine import WhisperEngine
    from thewhisper_tpu.models import whisper as W
    from thewhisper_tpu.models.quant import quantize_params
    from thewhisper_tpu.models.whisper import init_params

    print(f"backend: {jax.default_backend()}", flush=True)
    arch = dataclasses.replace(
        ARCH_PRESETS["large-v3-turbo"], max_source_positions=500,
        alignment_heads=((1, 0), (2, 3), (3, 7)))
    params = quantize_params(
        init_params(arch, seed=0, dtype=jnp.bfloat16),
        components=("decoder",))

    eng_a = WhisperEngine(params, arch, compute_dtype=jnp.bfloat16,
                          batch_buckets=(1, 8),
                          suppress_tokens=[SpecialTokens().eot])
    # B: round-2 layout — no qkv fusion. Patch the fuser to identity for
    # this construction only.
    orig = W.fuse_self_qkv_params
    W.fuse_self_qkv_params = lambda p: p
    try:
        eng_b = WhisperEngine(params, arch, compute_dtype=jnp.bfloat16,
                              batch_buckets=(1, 8),
                              suppress_tokens=[SpecialTokens().eot])
    finally:
        W.fuse_self_qkv_params = orig
    eng_c = WhisperEngine(params, arch, compute_dtype=jnp.bfloat16,
                          batch_buckets=(1,),
                          suppress_tokens=[SpecialTokens().eot])

    feat = LogMelFeaturizer(n_mels=arch.n_mels, chunk_length_s=10.0)
    audio = (0.1 * np.random.default_rng(0)
             .standard_normal(10 * 16000)).astype(np.float32)
    mel = np.asarray(feat(audio), np.float32)
    so = GenerationOptions(max_new_tokens=16, language="en")
    lo = GenerationOptions(max_new_tokens=144, language="en")

    print("compiling 6 programs...", flush=True)
    for e in (eng_a, eng_b, eng_c):
        e.transcribe_features(mel, so)
        e.transcribe_features(mel, lo)

    arms = {"A fused(1,8)": eng_a, "B unfused(1,8)": eng_b,
            "C fused(1,)": eng_c}
    t = {k: ([], []) for k in arms}
    emitted = {}
    for _ in range(8):
        for k, e in arms.items():
            t0 = time.perf_counter()
            rs = e.transcribe_features(mel, so)
            t[k][0].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            rl = e.transcribe_features(mel, lo)
            t[k][1].append(time.perf_counter() - t0)
            emitted[k] = int(rl.num_generated[0]) - int(rs.num_generated[0])
    med = statistics.median
    for k in arms:
        tok_s = emitted[k] / max(med(t[k][1]) - med(t[k][0]), 1e-9)
        print(f"{k}: {tok_s:.1f} tok/s "
              f"({med(t[k][0])*1e3:.1f} / {med(t[k][1])*1e3:.1f} ms)",
              flush=True)


if __name__ == "__main__":
    main()

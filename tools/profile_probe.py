"""Profile the bs=32 encoder + decode loop on the real TPU; print top ops.

Captures jax.profiler traces and aggregates device-op durations from the
trace.json.gz, attributing time to fusion/op names. This is how we find
where the encoder's non-matmul time goes and what the decode step spends
its 2.6 ms on.
"""

import dataclasses
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def analyze(trace_dir, top=30, min_ms=0.05):
    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not files:
        log(f"no trace under {trace_dir}")
        return
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # Find TPU device process ids (names look like "/device:TPU:0" or
    # "TPU:0 ..." depending on backend).
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    tpu_pids = {p for p, n in pid_names.items()
                if "TPU" in n.upper() or "device" in n.lower()}
    sums = defaultdict(float)
    counts = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "?")
        dur_ms = e.get("dur", 0) / 1e3
        sums[name] += dur_ms
        counts[name] += 1
        total += dur_ms
    log(f"--- {trace_dir}: {total:.1f} ms total device time "
        f"(procs: {sorted(pid_names.values())[:6]}) ---")
    for name, ms in sorted(sums.items(), key=lambda kv: -kv[1])[:top]:
        if ms < min_ms:
            break
        log(f"  {ms:9.2f} ms  x{counts[name]:<5d} {name[:110]}")


def main():
    import jax
    import jax.numpy as jnp

    from thewhisper_tpu.config import ARCH_PRESETS, GenerationOptions, SpecialTokens
    from thewhisper_tpu.engine import WhisperEngine
    from thewhisper_tpu.models.quant import quantize_params
    from thewhisper_tpu.models.whisper import encoder_forward, init_params

    log(f"backend={jax.default_backend()}")
    arch = dataclasses.replace(
        ARCH_PRESETS["large-v3-turbo"],
        alignment_heads=((1, 0), (2, 3), (3, 7)))
    log("init params...")
    t0 = time.time()
    params = quantize_params(
        init_params(arch, seed=0, dtype=jnp.bfloat16), components=("decoder",))
    eng = WhisperEngine(params, arch, compute_dtype=jnp.bfloat16,
                        batch_buckets=(32,), cross_kv_int8=True,
                        suppress_tokens=[SpecialTokens().eot])
    log(f"  ready in {time.time() - t0:.0f}s")
    audio32 = jax.device_put(jnp.asarray(
        (0.1 * np.random.default_rng(0).standard_normal((32, 30 * 16000))
         ).astype(np.float32)))
    mel32 = jax.device_put(jnp.asarray(
        (0.1 * np.random.default_rng(1).standard_normal((32, 128, 3000))
         ).astype(np.float32)))

    # Warm up both programs.
    opts = GenerationOptions(max_new_tokens=144, language="en")
    log("compiling...")
    eng.transcribe_audio(audio32, opts)
    float(jnp.mean(encoder_forward(
        eng.params, mel32, arch, jnp.bfloat16).astype(jnp.float32)))

    log("tracing encoder...")
    with jax.profiler.trace("/tmp/trace_encoder"):
        float(jnp.mean(encoder_forward(
            eng.params, mel32, arch, jnp.bfloat16).astype(jnp.float32)))
    analyze("/tmp/trace_encoder")

    log("tracing generate (144 tok)...")
    with jax.profiler.trace("/tmp/trace_generate"):
        eng.transcribe_audio(audio32, opts)
    analyze("/tmp/trace_generate")


if __name__ == "__main__":
    main()

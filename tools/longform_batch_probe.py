"""Large-batch long-form RTFx probe — the reference's bs=32 protocol.

The reference's "Batch Size: 32" rows batch the CHUNKS of one 10-minute
file through the HF chunked pipeline (``/root/reference/benchmark/README.md:113-120``;
L40S turbo-"S" 516.90, RTX 4090 917.57, RTX 5090 1500.83). This probe
runs 600 s through our windowed ASRPipeline at ``batch_size`` windows per
dispatched program (batched offset-window path: every slice runs inside
the executable) and A/B-interleaves, in ONE measurement window:

  - the full pipeline (host pad + device_put + LCS merge included), vs
  - the raw engine loop (transcribe_windows_async only, depth-2
    pipelined) on a pre-uploaded file,

so tunnel drift cannot masquerade as pipeline overhead (the round-3
speculative lesson: NEVER time two configs minutes apart on this
tunnel).

Also exercises ``utils.profiling.enable_compilation_cache`` so a second
run of this probe validates persistent-cache compile times on the axon
backend.

Usage: python tools/longform_batch_probe.py [--batch 32] [--minutes 10]
       [--max-new 32] [--reps 3] [--no-cache]
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--minutes", type=float, default=10.0)
    ap.add_argument("--max-new", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-cache", action="store_true",
                    help="skip the persistent XLA compile cache")
    ap.add_argument("--splus", action="store_true",
                    help="W8A8 encoder (the S+ engine): interleaves a "
                    "THIRD config in the A/B")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import thewhisper_tpu.pipeline as pl
    from thewhisper_tpu.config import ARCH_PRESETS, GenerationOptions, SpecialTokens
    from thewhisper_tpu.engine import WhisperEngine
    from thewhisper_tpu.models.quant import quantize_params
    from thewhisper_tpu.models.whisper import init_params_device
    from thewhisper_tpu.utils.profiling import enable_compilation_cache

    if not args.no_cache:
        log(f"compile cache: {enable_compilation_cache()}")
    log(f"backend={jax.default_backend()} devices={jax.devices()}")

    arch = dataclasses.replace(
        ARCH_PRESETS["large-v3-turbo"],
        max_source_positions=500,
        alignment_heads=((1, 0), (2, 3), (3, 7)),
    )
    log("initializing turbo int8-S params on device...")
    t0 = time.time()
    params = quantize_params(
        init_params_device(arch, seed=0, dtype=jnp.bfloat16),
        components=("decoder",))
    jax.tree.map(lambda x: x.block_until_ready(), params)
    log(f"  {time.time() - t0:.0f}s")

    SR = 16000
    total_s = args.minutes * 60.0
    rng = np.random.default_rng(0)
    audio = (0.1 * rng.standard_normal(int(total_s * SR))).astype(np.float32)
    win = 9 * SR
    step = win - 2 * (win // 6)
    offsets = [o for o in range(0, len(audio) - win + step, step)
               if o < len(audio)]
    rem = len(offsets) % args.batch
    buckets = (args.batch,) if rem == 0 else tuple(sorted({rem, args.batch}))
    log(f"{total_s:.0f} s -> {len(offsets)} windows, batch {args.batch} "
        f"(buckets {buckets})")

    eng = WhisperEngine(
        params, arch, compute_dtype=jnp.bfloat16, batch_buckets=buckets,
        cross_kv_int8=True, suppress_tokens=[SpecialTokens().eot])
    pipe = pl.ASRPipeline(eng, tokenizer=None, chunk_length_s=10,
                          batch_size=args.batch, latency_buckets=[9.0])
    kw = {"max_new_tokens": args.max_new, "language": "en"}
    opts = GenerationOptions(max_new_tokens=args.max_new, language="en")

    # Pre-uploaded file for the raw loop (the pipeline pads/uploads its
    # own copy per call — that delta is exactly what the A/B isolates).
    seg = 60 * SR
    total = (len(audio) + win + seg - 1) // seg * seg
    padded = np.zeros(total, np.float32)
    padded[: len(audio)] = audio
    dev = jax.device_put(padded)
    groups = [offsets[i: i + args.batch]
              for i in range(0, len(offsets), args.batch)]

    def run_raw():
        pend = []
        for g in groups:
            pend.append(eng.transcribe_windows_async(dev, g, win, win, opts))
            if len(pend) > 2:
                pend.pop(0).result()
        for h in pend:
            h.result()

    log("warming (compiles both programs)...")
    t0 = time.time()
    pipe(audio, chunk_length_s=9, generate_kwargs=dict(kw),
         batch_size=args.batch)
    log(f"  pipeline warm {time.time() - t0:.0f}s")
    t0 = time.time()
    run_raw()
    log(f"  raw warm {time.time() - t0:.1f}s (same executables expected)")

    configs = [("pipeline", lambda: pipe(
        audio, chunk_length_s=9, generate_kwargs=dict(kw),
        batch_size=args.batch)), ("raw", run_raw)]
    if args.splus:
        log("quantizing encoder W8A8 (S+) + warming its pipeline...")
        params_sp = quantize_params(
            params, components=("encoder",), activation_int8=True)
        eng_sp = WhisperEngine(
            params_sp, arch, compute_dtype=jnp.bfloat16,
            batch_buckets=buckets, cross_kv_int8=True,
            suppress_tokens=[SpecialTokens().eot])
        pipe_sp = pl.ASRPipeline(eng_sp, tokenizer=None, chunk_length_s=10,
                                 batch_size=args.batch,
                                 latency_buckets=[9.0])
        t0 = time.time()
        pipe_sp(audio, chunk_length_s=9, generate_kwargs=dict(kw),
                batch_size=args.batch)
        log(f"  S+ warm {time.time() - t0:.0f}s")
        configs.append(("pipeline-S+", lambda: pipe_sp(
            audio, chunk_length_s=9, generate_kwargs=dict(kw),
            batch_size=args.batch)))

    best = {name: float("inf") for name, _ in configs}
    for r in range(args.reps):
        for name, fn in configs:
            t0 = time.perf_counter()
            fn()
            wall = time.perf_counter() - t0
            best[name] = min(best[name], wall)
            log(f"  {name}: wall={wall:.2f} s RTFx={total_s / wall:.1f}")
    for name, b in best.items():
        log(f"{name}: BEST RTFx={total_s / b:.1f} ({b:.2f} s)")
    log(f"pipeline host overhead vs raw: "
        f"{(best['pipeline'] - best['raw']) * 1e3:.0f} ms "
        f"(ref L40S bs=32: 516.90)")


if __name__ == "__main__":
    main()

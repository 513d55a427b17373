"""bs=1 long-form RTFx probe — the reference's actual protocol.

Reference RTFx is measured on 10 minutes of audio through the full
chunked pipeline at batch size 1 (``/root/reference/benchmark/README.md:96-98``;
L40S turbo-"S" bs=1: 149.08). This probe runs 600 s through our windowed
ASRPipeline (9 s windows on the 10 s bucket, 1/6 stride, LCS merge,
int8-S engine, EOT suppressed so every window decodes exactly
``max_new`` tokens ~ 3.6 tok/s of audio) and reports RTFx = 600 / wall.

A/B: PIPELINE_DEPTH=0 (sequential dispatch+fetch per window) vs the
default pipelined dispatch, and timestamps off/on.

Usage: python tools/longform_probe.py [--minutes 10] [--max-new 32]
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=10.0)
    ap.add_argument("--chunk", type=int, default=10,
                    help="model chunk length s (call windows are chunk-1); "
                    "30 = the vanilla-whisper offline configuration: 3x "
                    "fewer windows amortize the per-window dispatch")
    ap.add_argument("--max-new", type=int, default=None,
                    help="tokens per window (default: ~3.56 tok/s of window)")
    ap.add_argument("--timestamps", action="store_true")
    ap.add_argument("--depths", default="0,2,3")
    ap.add_argument("--wpp", default=None,
                    help="comma list of windows_per_program values to "
                    "interleave at the first depth (bs=1 scan programs: "
                    "W windows per dispatch, device math unchanged)")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--splus", action="store_true",
                    help="W8A8 encoder (the opt-in S+ engine)")
    ap.add_argument("--bucket9", action="store_true",
                    help="exact-fit 9 s encoder bucket (450 positions) for "
                    "the 9 s windows instead of padding to the 10 s bucket")
    ap.add_argument("--ab-bucket", action="store_true",
                    help="interleave 10 s-bucket vs 9 s-bucket reps in ONE "
                    "process at the first depth (cancels tunnel drift)")
    ap.add_argument("--ab-splus", action="store_true",
                    help="interleave S vs S+ (W8A8 encoder) engines at the "
                    "first depth and first --wpp in ONE process")
    ap.add_argument("--ab-kv", action="store_true",
                    help="interleave int8 vs bf16 cross-KV engines in ONE "
                    "process at the first depth: only ~32 decode steps per "
                    "window amortize the per-window quantize pass")
    args = ap.parse_args()

    import jax

    import thewhisper_tpu.pipeline as pl
    from thewhisper_tpu.config import ARCH_PRESETS, SpecialTokens
    from thewhisper_tpu.engine import WhisperEngine
    from thewhisper_tpu.models.quant import quantize_params
    from thewhisper_tpu.models.whisper import init_params_device
    import jax.numpy as jnp

    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)
    mc = args.chunk                      # model chunk (bucket), s
    wc = mc - 1                          # call window, s (reference examples)
    if args.max_new is None:
        args.max_new = round(3.56 * wc)  # ~tokens per window of speech
    arch = dataclasses.replace(
        ARCH_PRESETS["large-v3-turbo"],
        max_source_positions=50 * mc,
        alignment_heads=((1, 0), (2, 3), (3, 7)),
    )
    print("initializing turbo int8-S params on device...", flush=True)
    params = quantize_params(
        init_params_device(arch, seed=0, dtype=jnp.bfloat16),
        components=("decoder",))
    if args.splus:
        print("quantizing encoder W8A8 (S+)...", flush=True)
        params = quantize_params(
            params, components=("encoder",), activation_int8=True)
    engine = WhisperEngine(
        params, arch, compute_dtype=jnp.bfloat16, batch_buckets=(1,),
        cross_kv_int8=True,
        suppress_tokens=[SpecialTokens().eot],   # fixed token count
    )
    pipe = pl.ASRPipeline(engine, tokenizer=None, chunk_length_s=mc,
                          batch_size=1,
                          latency_buckets=[float(wc)] if args.bucket9 else None)

    total_s = args.minutes * 60.0
    rng = np.random.default_rng(0)
    audio = (0.1 * rng.standard_normal(int(total_s * 16000))
             ).astype(np.float32)
    gk = {"max_new_tokens": args.max_new, "language": "en"}
    rt = "word" if args.timestamps else False

    # Initial short-file warmup (params transfer + shared executables;
    # the depth sweep below re-warms per depth at full length because
    # the offset-window program keys on the bucketed file length).
    warm_s = max(30, mc + 1)
    print(f"compiling ({warm_s} s warmup file)...", flush=True)
    t0 = time.perf_counter()
    pipe(audio[: warm_s * 16000], chunk_length_s=wc, return_timestamps=rt,
         generate_kwargs=dict(gk), batch_size=1)
    print(f"warmup+compile: {time.perf_counter() - t0:.1f} s", flush=True)

    n_windows = len(pl.ASRPipeline._window_offsets(
        len(audio), wc * 16000, wc * 16000 - 2 * (wc * 16000 // 6)))
    print(f"{total_s:.0f} s audio -> {n_windows} windows x "
          f"{args.max_new} tok", flush=True)

    if args.splus and args.ab_splus:
        # --splus already quantized `params` W8A8 above and
        # quantize_params skips is_quantized_w8a8 leaves, so the "S" arm
        # of the A/B would silently be S+ too (advisor finding r3).
        ap.error("--splus and --ab-splus are mutually exclusive: "
                 "--ab-splus builds its own S+ twin from the S params")

    if args.wpp and not args.ab_splus:
        # Full (depth x wpp) grid, interleaved across reps so tunnel
        # drift hits every combo equally. The scan program is shared
        # across depths (jit key has no depth), so warmup is per-wpp.
        # depth=0 is excluded: offset_mode (pipeline.py) requires
        # depth>0, so depth-0 combos would silently run the batched path
        # where windows_per_program has no effect — and a depths[0]==0
        # warmup would never compile the scan programs, letting depth>0
        # combos absorb compiles inside timed reps (advisor finding r3).
        depths = [int(d) for d in args.depths.split(",") if int(d) > 0]
        if not depths:
            ap.error("--wpp grid needs at least one depth > 0 "
                     "(depth 0 takes the batched path; wpp n/a there)")
        wpps = [int(w) for w in args.wpp.split(",")]
        print(f"compiling scan programs for wpp={wpps} "
              f"(depths {depths})...", flush=True)
        pl.PIPELINE_DEPTH = depths[0]
        for w in wpps:
            pipe.windows_per_program = w
            pipe(audio, chunk_length_s=wc, return_timestamps=rt,
                 generate_kwargs=dict(gk), batch_size=1)
        combos = [(d, w) for d in depths for w in wpps]
        best = {c: float("inf") for c in combos}
        for r in range(args.reps * 2):
            for d, w in combos:
                pl.PIPELINE_DEPTH = d
                pipe.windows_per_program = w
                t0 = time.perf_counter()
                pipe(audio, chunk_length_s=wc, return_timestamps=rt,
                     generate_kwargs=dict(gk), batch_size=1)
                wall = time.perf_counter() - t0
                best[(d, w)] = min(best[(d, w)], wall)
                print(f"  depth={d} wpp={w}: wall={wall:.2f} s "
                      f"RTFx={total_s / wall:.1f}", flush=True)
        for (d, w), b in best.items():
            print(f"depth={d} wpp={w}: BEST RTFx={total_s / b:.1f} "
                  f"({b * 1e3 / n_windows:.1f} ms/window)", flush=True)
        return

    if args.ab_splus:
        # Interleaved S vs S+ (W8A8 encoder) at the first depth and the
        # first --wpp (default 4). Historical note: S+ LOST at bs=1 in
        # the sequential-dispatch regime (98 vs 111 RTFx) because the
        # wall was dispatch, not device; with the wpp scan programs the
        # path is device-bound and the encoder slice is back on the
        # critical path.
        # Scan programs need depth>0 (depth 0 = batched path, wpp n/a).
        depth = next((int(d) for d in args.depths.split(",")
                      if int(d) > 0), 2)
        wpp = int(args.wpp.split(",")[0]) if args.wpp else 4
        pl.PIPELINE_DEPTH = depth
        pipe.windows_per_program = wpp
        params_sp = quantize_params(
            params, components=("encoder",), activation_int8=True)
        eng_sp = WhisperEngine(
            params_sp, arch, compute_dtype=jnp.bfloat16, batch_buckets=(1,),
            cross_kv_int8=True, suppress_tokens=[SpecialTokens().eot])
        pipe_sp = pl.ASRPipeline(
            eng_sp, tokenizer=None, chunk_length_s=mc, batch_size=1,
            latency_buckets=[float(wc)] if args.bucket9 else None,
            windows_per_program=wpp)
        print(f"compiling S and S+ scan programs (depth {depth}, "
              f"wpp {wpp})...", flush=True)
        for pp in (pipe, pipe_sp):
            pp(audio, chunk_length_s=wc, return_timestamps=rt,
               generate_kwargs=dict(gk), batch_size=1)
        best = {"S": float("inf"), "S+": float("inf")}
        for _ in range(args.reps * 2):
            for name, pp in (("S", pipe), ("S+", pipe_sp)):
                t0 = time.perf_counter()
                pp(audio, chunk_length_s=wc, return_timestamps=rt,
                   generate_kwargs=dict(gk), batch_size=1)
                wall = time.perf_counter() - t0
                best[name] = min(best[name], wall)
                print(f"  {name}: wall={wall:.2f} s "
                      f"RTFx={total_s / wall:.1f}", flush=True)
        for name, b in best.items():
            print(f"{name}: BEST RTFx={total_s / b:.1f} "
                  f"({b * 1e3 / n_windows:.1f} ms/window)", flush=True)
        return

    if args.ab_kv:
        depth = int(args.depths.split(",")[0])
        pl.PIPELINE_DEPTH = depth
        eng_bf = WhisperEngine(
            params, arch, compute_dtype=jnp.bfloat16, batch_buckets=(1,),
            cross_kv_int8=False, suppress_tokens=[SpecialTokens().eot])
        pipe_bf = pl.ASRPipeline(eng_bf, tokenizer=None, chunk_length_s=mc,
                                 batch_size=1,
                                 latency_buckets=[float(wc)] if args.bucket9
                                 else None)
        print("compiling bf16-KV window program...", flush=True)
        pipe_bf(audio[: warm_s * 16000], chunk_length_s=wc,
                return_timestamps=rt, generate_kwargs=dict(gk), batch_size=1)
        best = {"kv_int8": float("inf"), "kv_bf16": float("inf")}
        for _ in range(args.reps * 2):
            for name, pp in (("kv_int8", pipe), ("kv_bf16", pipe_bf)):
                t0 = time.perf_counter()
                pp(audio, chunk_length_s=wc, return_timestamps=rt,
                   generate_kwargs=dict(gk), batch_size=1)
                wall = time.perf_counter() - t0
                best[name] = min(best[name], wall)
                print(f"  {name}: wall={wall:.2f} s "
                      f"RTFx={total_s / wall:.1f}", flush=True)
        for name, bv in best.items():
            print(f"{name}: BEST RTFx={total_s / bv:.1f} "
                  f"({bv * 1e3 / n_windows:.1f} ms/window)", flush=True)
        return

    if args.ab_bucket:
        depth = int(args.depths.split(",")[0])
        pl.PIPELINE_DEPTH = depth
        pipe9 = pl.ASRPipeline(engine, tokenizer=None, chunk_length_s=mc,
                               batch_size=1, latency_buckets=[float(wc)])
        print(f"compiling {wc} s-bucket window program...", flush=True)
        pipe9(audio[: warm_s * 16000], chunk_length_s=wc, return_timestamps=rt,
              generate_kwargs=dict(gk), batch_size=1)
        best = {"b10": float("inf"), "b9": float("inf")}
        for r in range(args.reps * 2):
            for name, pp in (("b10", pipe), ("b9", pipe9)):
                t0 = time.perf_counter()
                pp(audio, chunk_length_s=wc, return_timestamps=rt,
                   generate_kwargs=dict(gk), batch_size=1)
                wall = time.perf_counter() - t0
                best[name] = min(best[name], wall)
                print(f"  {name}: wall={wall:.2f} s "
                      f"RTFx={total_s / wall:.1f}", flush=True)
        for name, b in best.items():
            print(f"{name}: BEST RTFx={total_s / b:.1f} "
                  f"({b * 1e3 / n_windows:.1f} ms/window)", flush=True)
        return

    for depth in (int(d) for d in args.depths.split(",")):
        pl.PIPELINE_DEPTH = depth
        # Untimed full-length warmup PER DEPTH: depth selects the code
        # path (offset-window program at depth>0, batched program at
        # depth 0) and the offset program's jit key includes the
        # bucketed file length — a short or different-depth warmup
        # compiles a different executable and the first timed rep would
        # absorb the compile.
        pipe(audio, chunk_length_s=wc, return_timestamps=rt,
             generate_kwargs=dict(gk), batch_size=1)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = pipe(audio, chunk_length_s=wc, return_timestamps=rt,
                       generate_kwargs=dict(gk), batch_size=1)
            wall = time.perf_counter() - t0
            best = min(best, wall)
            print(f"  depth={depth}: wall={wall:.2f} s "
                  f"RTFx={total_s / wall:.1f} "
                  f"(text tokens: {len(out['text'].split())})", flush=True)
        print(f"depth={depth}: BEST RTFx={total_s / best:.1f} "
              f"({best * 1e3 / n_windows:.1f} ms/window)", flush=True)


if __name__ == "__main__":
    main()

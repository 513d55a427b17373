"""Stage-level attribution of the streaming tick (VERDICT r4 weak #2).

Round 4 recorded stream_p50_ms 90.8 at a 25 ms tunnel RTT where round 3
had 61.6 at 29.8 — with ~45 ms of the median unexplained by the bench's
RTT + device + host-align subtraction. Hypothesis under test: the tick's
(1, 160000) f32 audio buffer (640 KB) sits BELOW the DevicePutCache
min_bytes gate (4 MB), so every tick re-uploads it through the axon
tunnel, whose transfer latency degrades superlinearly with cumulative
uploads (utils/devcache.py: measured 42 MB 0.25 s fresh -> ~19 s after
~500 MB cumulative). Round 3 measured p50 over 20 ticks (13 MB
cumulative); round 4 over 400 ticks (256 MB) after a much longer bench
preamble — if the hypothesis holds, the "regression" is leak-age, not a
framework change.

Design: interleave, tick for tick,
  A) host-resident audio, content unchanged (delta cache identical-hit)
  B) the same program with DEVICE-resident audio (no upload)
  C) a trivial-program round trip (pure RTT tracker)
  D) fresh-content host audio (full re-upload — the pre-delta baseline)
  E) rolling-buffer host audio (realistic append/trim ticks — the
     DeltaDevicePutCache splice path, VERDICT r4 #2 fix)
and report windowed medians (first/middle/last quarter) for each. If A
degrades across the run while B and C stay flat, the residual is the
per-tick upload on an aging tunnel session. Also times each stage of one
sync tick (place / dispatch / fetch) directly every 50 ticks.

Run on the real TPU (default shell): python tools/stream_stage_probe.py
"""

import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from thewhisper_tpu.config import (
    ARCH_PRESETS,
    GenerationOptions,
    SpecialTokens,
)
from thewhisper_tpu.engine.engine import WhisperEngine
from thewhisper_tpu.models.quant import quantize_params
from thewhisper_tpu.models.whisper import init_params


def med(xs):
    return statistics.median(xs) * 1e3


def main(n_ticks: int = 400) -> None:
    print(f"backend: {jax.default_backend()}", flush=True)
    import dataclasses

    arch = dataclasses.replace(
        ARCH_PRESETS["large-v3-turbo"],
        alignment_heads=((1, 0), (2, 3), (3, 7)))
    print("init turbo params + int8 S...", flush=True)
    params = quantize_params(init_params(arch, seed=0, dtype=jnp.bfloat16),
                             components=("decoder",))
    engine = WhisperEngine(
        params, arch, compute_dtype=jnp.bfloat16, batch_buckets=(1,),
        suppress_tokens=[SpecialTokens().eot])

    # One engine per host-audio arm: the delta transfer cache keys on
    # array shape, so arms sharing an engine would thrash each other's
    # cached buffer and measure fallback full transfers instead of the
    # per-arm steady state. Params are shared; XLA's persistent compile
    # cache dedupes the executables.
    eng_fresh = WhisperEngine(
        params, arch, compute_dtype=jnp.bfloat16, batch_buckets=(1,),
        suppress_tokens=[SpecialTokens().eot])
    eng_roll = WhisperEngine(
        params, arch, compute_dtype=jnp.bfloat16, batch_buckets=(1,),
        suppress_tokens=[SpecialTokens().eot])

    rng = np.random.default_rng(0)
    buf = (0.1 * rng.standard_normal(9 * 16000)).astype(np.float32)
    audio_pad = np.zeros((1, 10 * 16000), np.float32)
    audio_pad[0, : len(buf)] = buf
    audio_dev = jax.device_put(jnp.asarray(audio_pad))
    opts = GenerationOptions(max_new_tokens=32, language="en",
                             return_timestamps=True)

    # Rolling-buffer arm state: 2 s start, +0.5 s per tick, trim at 9 s
    # (the real tick's append/trim cycle -> delta splices + rare fulls).
    roll = np.zeros((1, 10 * 16000), np.float32)
    roll_frontier = 2 * 16000
    roll[0, :roll_frontier] = 0.1 * rng.standard_normal(roll_frontier)

    print("compiling the streaming tick program...", flush=True)
    engine.transcribe_audio(audio_pad, opts)
    engine.transcribe_audio(audio_dev, opts)
    eng_fresh.transcribe_audio(audio_pad.copy(), opts)
    eng_roll.transcribe_audio(roll, opts)

    triv = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros(())
    np.asarray(triv(z))

    host_l, dev_l, rtt_l, fresh_l, roll_l = [], [], [], [], []
    stage_rows = []
    for i in range(n_ticks):
        t0 = time.perf_counter()
        engine.transcribe_audio(audio_pad, opts)
        host_l.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        engine.transcribe_audio(audio_dev, opts)
        dev_l.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(triv(z))
        rtt_l.append(time.perf_counter() - t0)
        # Fresh-content arm: full re-upload every tick (the pre-delta
        # baseline; content differs from the first block on).
        fresh = audio_pad.copy()
        fresh[0, :4096] = 0.1 * rng.standard_normal(4096)
        fresh[0, -4096:] = 0.1 * rng.standard_normal(4096)
        t0 = time.perf_counter()
        eng_fresh.transcribe_audio(fresh, opts)
        fresh_l.append(time.perf_counter() - t0)
        # Rolling arm: append 0.5 s; trim back to 2 s at the 9 s mark.
        if roll_frontier + 8000 > 9 * 16000:
            keep = roll[0, roll_frontier - 2 * 16000: roll_frontier].copy()
            roll = np.zeros_like(roll)
            roll_frontier = 2 * 16000
            roll[0, :roll_frontier] = keep
        else:
            roll = roll.copy()
            roll[0, roll_frontier: roll_frontier + 8000] = (
                0.1 * rng.standard_normal(8000))
            roll_frontier += 8000
        t0 = time.perf_counter()
        eng_roll.transcribe_audio(roll, opts)
        roll_l.append(time.perf_counter() - t0)
        if i % 50 == 25:
            # Direct stage timing of one host tick: place / dispatch /
            # fetch. Mirrors _transcribe_audio's structure.
            t0 = time.perf_counter()
            placed = engine._place(audio_pad)
            t_place = time.perf_counter() - t0
            prompt_arr = engine._device_prompt(opts, 1, None)
            fn = engine._generate_from_audio_fn(
                1, audio_pad.shape[-1], prompt_arr.shape[1],
                opts.max_new_tokens, opts.return_timestamps,
                num_beams=1, temperature=0.0, use_pallas=None,
                proposals=False)
            t0 = time.perf_counter()
            result = fn(engine.params, placed, prompt_arr,
                        engine._device_seed(opts.seed), engine.draft_params)
            t_disp = time.perf_counter() - t0
            t0 = time.perf_counter()
            jax.device_get([result.tokens, result.num_generated,
                            result.sum_logprob, result.token_logprobs,
                            result.no_speech_prob, result.align])
            t_fetch = time.perf_counter() - t0
            stage_rows.append((i, t_place * 1e3, t_disp * 1e3,
                               t_fetch * 1e3))
            print(f"  tick {i}: place {t_place*1e3:.1f} dispatch "
                  f"{t_disp*1e3:.1f} fetch {t_fetch*1e3:.1f} ms", flush=True)

    q = n_ticks // 4
    dc = eng_roll._delta_devput_cache
    print(f"rolling-arm delta cache: {dc.delta} deltas / {dc.full} fulls",
          flush=True)
    for name, xs in (("host-audio", host_l), ("device-audio", dev_l),
                     ("trivial-rtt", rtt_l), ("fresh-audio", fresh_l),
                     ("rolling-audio", roll_l)):
        print(f"{name}: p50 {med(xs):.1f} ms | quarters "
              f"{med(xs[:q]):.1f} / {med(xs[q:2*q]):.1f} / "
              f"{med(xs[2*q:3*q]):.1f} / {med(xs[3*q:]):.1f} | "
              f"p95 {sorted(xs)[int(0.95*len(xs))]*1e3:.1f}", flush=True)
    if stage_rows:
        pl = statistics.median([r[1] for r in stage_rows])
        dp = statistics.median([r[2] for r in stage_rows])
        ft = statistics.median([r[3] for r in stage_rows])
        print(f"stages (median over probes): place {pl:.1f} + dispatch "
              f"{dp:.1f} + fetch {ft:.1f} ms", flush=True)

    # Aging phase: replicate the bench preamble's cumulative host->device
    # transfer volume (bs=32 audio uploads etc. — hundreds of MB through
    # the leaky tunnel), then re-measure the identical tick. If the tick
    # inflates with NO code change, the r4 p50 regression is tunnel
    # session age, not the framework.
    print("aging the tunnel session: 12 x 42 MB uploads...", flush=True)
    for i in range(12):
        big = rng.standard_normal((42 * 1024 * 1024 // 4,)
                                  ).astype(np.float32)
        t0 = time.perf_counter()
        jax.device_put(jnp.asarray(big)).block_until_ready()
        print(f"  upload {i}: {time.perf_counter()-t0:.2f} s", flush=True)
        del big
    host2, dev2, rtt2 = [], [], []
    for _ in range(100):
        t0 = time.perf_counter()
        engine.transcribe_audio(audio_pad, opts)
        host2.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        engine.transcribe_audio(audio_dev, opts)
        dev2.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(triv(z))
        rtt2.append(time.perf_counter() - t0)
    print(f"AFTER aging: host-audio p50 {med(host2):.1f} | device-audio "
          f"{med(dev2):.1f} | rtt {med(rtt2):.1f} ms", flush=True)


if __name__ == "__main__":
    import sys

    main(int(sys.argv[1]) if len(sys.argv) > 1 else 400)

"""TTFT decomposition on real TPU (round-2 Weak #2 / Next #8).

Round-2 bench reported TTFT 53.9 ms vs the reference L40S 11.9 ms
(``/root/reference/benchmark/README.md:104-111``). This probe separates
that number into its parts so the bench can report compute honestly:

- **tunnel RTT**: a trivial jitted program (x+1 on a scalar) timed
  host-to-host — pure dispatch + link latency, ~25 ms here, 0 on a
  directly-attached chip;
- **argument transfer**: the same trivial program with a host-resident
  10 s mel argument (0.5 MB over the link);
- **fixed generate cost** by mel bucket: max_new=1 call time at chunk
  lengths {2.5, 5, 10} s — encode dominates and scales with the bucket,
  so a short first window (the streaming pipeline's latency_buckets)
  buys its ratio;
- **encode vs prefill split**: encoder_forward alone vs the full
  max_new=1 program at each bucket.

The bench-reported ex-tunnel TTFT target is <= 20 ms; if the 10 s-bucket
encode alone exceeds it, that is the hardware floor and the writeup
stands in (VERDICT.md Next #8 wording).

Usage: python tools/ttft_probe.py [--iters 12]
"""

import argparse
import dataclasses
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def med(f, iters):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from thewhisper_tpu.audio.features import LogMelFeaturizer
    from thewhisper_tpu.config import (ARCH_PRESETS, GenerationOptions,
                                       SpecialTokens)
    from thewhisper_tpu.engine import WhisperEngine
    from thewhisper_tpu.models.quant import quantize_params
    from thewhisper_tpu.models.whisper import (compute_cross_kv,
                                               encoder_forward, init_params)

    print(f"backend={jax.default_backend()}", flush=True)

    # -- tunnel RTT + transfer ----------------------------------------------
    trivial = jax.jit(lambda x: x + 1.0)
    s = jnp.zeros(())
    np.asarray(trivial(s))
    rtt = med(lambda: np.asarray(trivial(s)), args.iters)
    big = np.zeros((1, 128, 1000), np.float32)
    moved = jax.jit(lambda x: jnp.sum(x))
    np.asarray(moved(big))
    xfer = med(lambda: np.asarray(moved(big)), args.iters) - rtt
    print(f"tunnel RTT (scalar round trip): {rtt:.1f} ms; "
          f"+0.5 MB host mel arg: {max(xfer, 0):.1f} ms", flush=True)

    sp = SpecialTokens()
    print("initializing turbo int8-S params...", flush=True)
    base = dataclasses.replace(
        ARCH_PRESETS["large-v3-turbo"],
        alignment_heads=((1, 0), (2, 3), (3, 7)))
    params = quantize_params(
        init_params(base, seed=0, dtype=jnp.bfloat16),
        components=("decoder",))

    o1 = GenerationOptions(max_new_tokens=1, language="en")
    rng = np.random.default_rng(0)

    for secs in (2.5, 5.0, 10.0):
        arch = dataclasses.replace(base, max_source_positions=int(secs * 50))
        eng = WhisperEngine(params, arch, compute_dtype=jnp.bfloat16,
                            batch_buckets=(1,), cross_kv_int8=True,
                            suppress_tokens=[sp.eot])
        featurizer = LogMelFeaturizer(n_mels=arch.n_mels,
                                      chunk_length_s=secs)
        audio = (0.1 * rng.standard_normal(int(secs * 16000))
                 ).astype(np.float32)
        mel_h = np.asarray(featurizer(audio), np.float32)
        mel_d = jax.device_put(jnp.asarray(mel_h))

        # encoder-only (device-resident mel, reduce on device: CLAUDE.md —
        # fetch a scalar so transfer back is nil).
        enc_fn = jax.jit(lambda p, m: jnp.sum(
            compute_cross_kv(p, encoder_forward(p, m, arch, jnp.bfloat16),
                             arch)[0]).astype(jnp.float32))
        np.asarray(enc_fn(eng.params, mel_d))
        t_enc = med(lambda: np.asarray(enc_fn(eng.params, mel_d)),
                    args.iters) - rtt

        eng.transcribe_features(mel_d, o1)        # compile
        t_fix_d = med(lambda: eng.transcribe_features(mel_d, o1),
                      args.iters)
        t_fix_h = med(lambda: eng.transcribe_features(mel_h, o1),
                      args.iters)
        print(f"bucket {secs:4.1f} s: encode+crossKV {t_enc:6.1f} ms | "
              f"TTFT dev-mel {t_fix_d:6.1f} ms "
              f"(ex-RTT {t_fix_d - rtt:6.1f}) | host-mel {t_fix_h:6.1f} ms",
              flush=True)
        del eng


if __name__ == "__main__":
    main()

"""Interleaved A/B: ngram vs proposal speculative rounds (drift control).

tools/spec_hlo_probe.py showed the compiled ngram and proposal programs
are op-for-op identical outside a handful of scalar int ops — so the
measured 0.63 vs 0.20 ms/round gap (spec_round_probe) must come from
either scheduling (critical-path stalls the HLO text can't show) or
from measurement bias: every prior probe measured the ngram block LAST,
and the axon tunnel's throughput drifts +-25% and occasionally 2-3x.

This probe compiles BOTH engines first, then interleaves the timed
calls A/B/A/B within one window, computing each program's round cost
from DEVICE round counts (EngineResult.spec_rounds). If the interleaved
costs converge, the "ngram structural overhead" was tunnel weather.

Usage: python tools/spec_ab_probe.py [--iters 10]
"""

import argparse
import dataclasses
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-new", type=int, default=144)
    ap.add_argument("--short", type=int, default=16)
    ap.add_argument("--window", type=int, default=4)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=1,
                    help="batch rows (DIFFERENT noise per row, so "
                    "per-row acceptance diverges and the shared round "
                    "count is driven by the slowest row — the honest "
                    "large-batch ngram question)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from thewhisper_tpu.audio.features import LogMelFeaturizer
    from thewhisper_tpu.config import (ARCH_PRESETS, GenerationOptions,
                                       SpecialTokens)
    from thewhisper_tpu.engine import WhisperEngine
    from thewhisper_tpu.models.quant import quantize_params
    from thewhisper_tpu.models.whisper import init_params

    print(f"backend={jax.default_backend()}", flush=True)
    arch = dataclasses.replace(
        ARCH_PRESETS["large-v3-turbo"],
        max_source_positions=500,
        alignment_heads=((1, 0), (2, 3), (3, 7)),
    )
    params = quantize_params(
        init_params(arch, seed=0, dtype=jnp.bfloat16),
        components=("decoder",))
    sp = SpecialTokens()
    b = args.batch
    kw = dict(compute_dtype=jnp.bfloat16, batch_buckets=(b,),
              suppress_tokens=[sp.eot], spec_window=args.window,
              cross_kv_int8=(b >= 32))

    featurizer = LogMelFeaturizer(n_mels=arch.n_mels, chunk_length_s=10.0)
    rng = np.random.default_rng(0)
    audio = (0.1 * rng.standard_normal((b, 10 * 16000))).astype(np.float32)
    mel = np.asarray(featurizer(audio), dtype=np.float32)

    o_s = GenerationOptions(max_new_tokens=args.short, language="en")
    o_l = GenerationOptions(max_new_tokens=args.max_new, language="en")

    eng_p = WhisperEngine(params, arch, **kw)
    eng_n = WhisperEngine(params, arch, spec_ngram=True, **kw)

    print("compiling all four programs...", flush=True)
    gen = np.asarray(eng_n.transcribe_features(mel, o_l).tokens)  # compiles n/l
    eng_n.transcribe_features(mel, o_s)
    bad = 300
    wrong = np.full((b, args.max_new + args.window), bad, np.int32)
    eng_p.transcribe_features(mel, o_s, draft_tokens=wrong)
    eng_p.transcribe_features(mel, o_l, draft_tokens=wrong)

    def one(eng, opts, drafts):
        t0 = time.perf_counter()
        r = eng.transcribe_features(mel, opts, draft_tokens=drafts)
        return time.perf_counter() - t0, r

    # Interleaved: (prop_s, prop_l, ngram_s, ngram_l) x iters
    P_s, P_l, N_s, N_l = [], [], [], []
    rounds = {}
    for i in range(args.iters):
        t, r = one(eng_p, o_s, wrong); P_s.append(t)
        rounds["p_s"] = r.spec_rounds
        t, r = one(eng_p, o_l, wrong); P_l.append(t)
        rounds["p_l"] = r.spec_rounds
        t, r = one(eng_n, o_s, None); N_s.append(t)
        rounds["n_s"] = r.spec_rounds
        t, r = one(eng_n, o_l, None); N_l.append(t)
        rounds["n_l"] = r.spec_rounds
    med = statistics.median
    emitted = args.max_new - args.short   # per row; EOT suppressed
    dp = rounds["p_l"] - rounds["p_s"]
    dn = rounds["n_l"] - rounds["n_s"]
    t_p = (med(P_l) - med(P_s)) / dp * 1e3
    t_n = (med(N_l) - med(N_s)) / dn * 1e3
    print(f"batch={b} device rounds: prop {rounds['p_s']}/{rounds['p_l']} "
          f"ngram {rounds['n_s']}/{rounds['n_l']}", flush=True)
    print(f"interleaved round cost: proposal {t_p:.3f} ms "
          f"({dp} rounds), ngram {t_n:.3f} ms ({dn} rounds) "
          f"-> ratio {t_n / t_p:.2f}", flush=True)
    print(f"ngram emitted {b}x{emitted} tok in {med(N_l) - med(N_s):.4f} s "
          f"-> {b * emitted / (med(N_l) - med(N_s)):.0f} tok/s aggregate; "
          f"{emitted / dn:.2f} tok/round (slowest-row gated)", flush=True)
    # Per-iteration raw walls, to see drift within the run
    print("raw prop_l walls:", " ".join(f"{t*1e3:.1f}" for t in P_l),
          flush=True)
    print("raw ngram_l walls:", " ".join(f"{t*1e3:.1f}" for t in N_l),
          flush=True)


if __name__ == "__main__":
    main()

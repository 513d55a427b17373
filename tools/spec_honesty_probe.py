"""Honest speculative-decoding numbers on real TPU (round-2 Weak #3).

SUPERSEDED by tools/spec_round_probe.py + tools/spec_ab_probe.py: this
probe's round-count denominator comes from a host simulation that
drafts from the FINISHED sequence, but the device buffer holds zeros
beyond the write frontier — on short-period repetitive output the sim
undercounts rounds up to 2.5x, which is exactly how this probe's
"ngram round costs ~2.6x a step" conclusion arose (the other half was
timing the ngram block minutes after the baseline on a drifting
tunnel). Kept for the controlled-acceptance proposal methodology; for
round costs use the device counter (EngineResult.spec_rounds) and
interleaved timing.

The round-2 headline (5184-6991 tok/s, 1.40-1.95x) was measured on
repetitive output — prompt-lookup drafting's best case. This probe
produces the defensible numbers:

1. plain greedy tok/s (16-vs-144 differential, cancels fixed cost + RTT);
2. the verify-ROUND cost, measured directly with controlled-acceptance
   proposals (``draft_tokens``):
   - all-wrong proposals -> every round advances exactly 1 token, so the
     differential time/token IS the round cost (spec's worst case);
   - all-right proposals (the plain run's own output) -> every round
     advances W+1 tokens (spec's ceiling);
3. ngram drafting on the model's actual output, plus the EXACT
   tokens/round of that run via the host-side acceptance simulation
   (tools/ngram_acceptance_sim.py implements the same lookup rule) —
   cross-checking measured net tok/s ~= tokens_per_round / t_round;
4. the prediction for NATURAL output: tokens/round on natural English
   prose (real tokenizer: 1.53; repetitive: 4.56) x the measured round
   rate. This is the number the README headline must quote.

Measured verdict (v5e, W=4): a proposal round costs 1.19x a step, but a
full ngram round costs ~2.6x — the crossover is t_round/t_step
tokens/round, natural English runs ~1.53, so draft="ngram" LOSES on
non-repetitive speech and stays opt-in. (The bigram lookup math itself
is ~1.5 us standalone — tools/ngram_cost_probe.py — the overhead is
structural to the compiled round, cause unprofiled.)

Usage: python tools/spec_honesty_probe.py [--max-new 144] [--window 4]
(the window is used for BOTH the engine and the host round
simulation — a mismatch silently skews the differential rounds)
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
    ap.add_argument("--window", type=int, default=4,
                    help="spec_window for BOTH the engine and the round simulation — they must match")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from thewhisper_tpu.audio.features import LogMelFeaturizer
    from thewhisper_tpu.config import (ARCH_PRESETS, GenerationOptions,
                                       SpecialTokens)
    from thewhisper_tpu.engine import WhisperEngine
    from thewhisper_tpu.models.quant import quantize_params
    from thewhisper_tpu.models.whisper import init_params
    from tools.ngram_acceptance_sim import simulate

    print(f"backend={jax.default_backend()}", flush=True)
    arch = dataclasses.replace(
        ARCH_PRESETS["large-v3-turbo"],
        max_source_positions=500,
        alignment_heads=((1, 0), (2, 3), (3, 7)),
    )
    print("initializing turbo int8-S params...", flush=True)
    params = quantize_params(
        init_params(arch, seed=0, dtype=jnp.bfloat16),
        components=("decoder",))
    sp = SpecialTokens()
    kw = dict(compute_dtype=jnp.bfloat16, batch_buckets=(1,),
              suppress_tokens=[sp.eot], spec_window=args.window)

    featurizer = LogMelFeaturizer(n_mels=arch.n_mels, chunk_length_s=10.0)
    rng = np.random.default_rng(0)
    audio = (0.1 * rng.standard_normal(10 * 16000)).astype(np.float32)
    mel = np.asarray(featurizer(audio), dtype=np.float32)

    o_short = GenerationOptions(max_new_tokens=args.short, language="en")
    o_long = GenerationOptions(max_new_tokens=args.max_new, language="en")

    def timed(eng, opts, drafts=None, iters=args.iters):
        ts, res = [], None
        for _ in range(iters):
            t0 = time.perf_counter()
            res = eng.transcribe_features(mel, opts, draft_tokens=drafts)
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts), res

    # -- 1. plain greedy ----------------------------------------------------
    eng = WhisperEngine(params, arch, **kw)
    print("compiling plain...", flush=True)
    eng.transcribe_features(mel, o_short)
    t_s, r_s = timed(eng, o_short)
    t_l, r_l = timed(eng, o_long)
    n_s, n_l = int(r_s.num_generated[0]), int(r_l.num_generated[0])
    plain = (n_l - n_s) / (t_l - t_s)
    t_step = 1e3 / plain
    print(f"plain: {plain:.0f} tok/s ({t_step:.3f} ms/step)", flush=True)
    gen = np.asarray(r_l.tokens[0, r_l.prompt_len:])
    del eng

    # -- 2. controlled acceptance via proposals -----------------------------
    eng_p = WhisperEngine(params, arch, **kw)
    # A token the plain output never emits -> acceptance exactly 0.
    bad = next(t for t in range(200, 400) if t not in set(gen.tolist()))
    wrong = np.full((1, args.max_new + args.window), bad, np.int32)
    right = np.zeros((1, args.max_new + args.window), np.int32)
    right[0, :len(gen)] = gen
    print("compiling proposal programs...", flush=True)
    eng_p.transcribe_features(mel, o_short, draft_tokens=wrong)
    tw_s, _ = timed(eng_p, o_short, wrong)
    tw_l, rw = timed(eng_p, o_long, wrong)
    assert np.array_equal(np.asarray(rw.tokens[0, rw.prompt_len:]), gen), \
        "spec output != greedy"
    t_round = (tw_l - tw_s) / (n_l - n_s) * 1e3     # 1 tok/round
    tr_s, _ = timed(eng_p, o_short, right)
    tr_l, rr = timed(eng_p, o_long, right)
    assert np.array_equal(np.asarray(rr.tokens[0, rr.prompt_len:]), gen)
    ceil = (n_l - n_s) / (tr_l - tr_s)
    print(f"round cost (all-wrong proposals): {t_round:.3f} ms = "
          f"{t_round / t_step:.2f}x a plain step -> worst case "
          f"{plain * t_step / t_round:.0f} tok/s "
          f"({t_step / t_round:.2f}x plain)", flush=True)
    print(f"ceiling (all-right proposals): {ceil:.0f} tok/s "
          f"({ceil / plain:.2f}x plain, ~(W+1)/round)", flush=True)
    del eng_p

    # -- 3. ngram drafting on the actual output -----------------------------
    eng_n = WhisperEngine(params, arch, spec_ngram=True, **kw)
    print("compiling ngram programs...", flush=True)
    eng_n.transcribe_features(mel, o_short)
    tn_s, rn_s = timed(eng_n, o_short)
    tn_l, rn = timed(eng_n, o_long)
    assert np.array_equal(np.asarray(rn.tokens[0, rn.prompt_len:]), gen)
    ngram = (n_l - n_s) / (tn_l - tn_s)
    # Exact rounds of THIS sequence under the lookup rule, AT BOTH
    # LENGTHS: acceptance is non-stationary (the first tokens have no
    # history to look up, later tokens repeat more), so tokens/round
    # over the whole run does NOT divide out of a differential timing —
    # the true per-round cost is (t_long - t_short) / (rounds_long -
    # rounds_short). The earlier tpr/meas estimate mixed regimes and
    # overstated the round cost ~4x.
    p_len = int(rn.prompt_len)
    full = np.asarray(rn.tokens[0]).tolist()
    # The short run must emit exactly the long run's prefix, or the
    # differential round count below is meaningless (review finding).
    assert np.array_equal(np.asarray(rn_s.tokens[0])[: p_len + n_s],
                          np.asarray(full[: p_len + n_s]))
    rounds_l, emitted_l, hist = simulate(full[: p_len + n_l], args.window)
    rounds_s, emitted_s, _ = simulate(full[: p_len + n_s], args.window)
    tpr_run = emitted_l / max(rounds_l, 1)
    d_rounds = max(rounds_l - rounds_s, 1)
    t_round_n = (tn_l - tn_s) / d_rounds * 1e3
    print(f"ngram on actual output: {ngram:.0f} tok/s measured "
          f"({ngram / plain:.2f}x plain) at {tpr_run:.2f} tok/round "
          f"overall; differential rounds {d_rounds} -> TRUE round cost "
          f"{t_round_n:.3f} ms = {t_round_n / t_step:.2f}x a step",
          flush=True)
    print(f"  accepted-draft histogram: "
          + " ".join(f"m={i}:{100 * c / max(sum(hist), 1):.0f}%"
                     for i, c in enumerate(hist)), flush=True)

    # -- 4. the honest headline: natural-prose prediction -------------------
    # Project with BOTH round-cost estimates (the proposal-path round and
    # the ngram differential round); the crossover is t_round/t_step
    # tokens/round.
    for rc_name, rc in (("proposal-round", t_round),
                        ("ngram-round", t_round_n)):
        print(f"[{rc_name} {rc:.3f} ms, crossover "
              f"{rc / t_step:.2f} tok/round]", flush=True)
        # tokens/round are window-dependent: 1.50/3.90 at W=4,
        # 1.53/4.56 at W=5 (tools/ngram_acceptance_sim.py --window N).
        nat, rep = (1.50, 3.90) if args.window == 4 else (1.53, 4.56)
        for name, tpr in (("natural English prose", nat),
                          ("repetitive refrain", rep)):
            print(f"  predicted {name} ({tpr:.2f} tok/round): "
                  f"{tpr * 1e3 / rc:.0f} tok/s "
                  f"= {tpr * t_step / rc:.2f}x plain", flush=True)


if __name__ == "__main__":
    main()

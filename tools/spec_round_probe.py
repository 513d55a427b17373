"""Settle the ngram "structural overhead" mystery with DEVICE round counts.

Round 3 measured an ngram round at ~2.6x a plain step while the bigram
lookup itself is ~1.5 us (tools/ngram_cost_probe.py) — "cause
unprofiled". The suspicion this probe tests: the round-count denominator
came from a host simulation (tools/ngram_acceptance_sim.py::simulate)
that drafts from the FINISHED sequence, but the device buffer beyond the
current frontier holds ZEROS — on short-period repetitive output (what a
random-weight model emits) the device accepts ~2 tokens/round where the
optimistic sim says ~5, inflating the inferred per-round cost ~2.5x.

Now speculative_decode counts its own while-loop iterations
(GreedyResult.rounds -> EngineResult.spec_rounds), so the TRUE round
cost is (t_long - t_short) / (device_rounds_long - device_rounds_short)
with no simulation in the denominator. The probe prints:

1. plain greedy t_step (16-vs-144 differential);
2. all-wrong proposal round cost with its device-round sanity check
   (rounds must equal tokens emitted);
3. ngram round cost from DEVICE rounds, plus both host sims
   (optimistic vs device-exact) against the device count;
4. the corrected natural-prose / repetitive projections under the
   device-exact rule.

Usage: python tools/spec_round_probe.py [--max-new 144] [--window 4]
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
    from tools.ngram_acceptance_sim import simulate, simulate_device

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
    print(f"plain: {plain:.0f} tok/s ({t_step:.3f} ms/step), "
          f"n_short={n_s} n_long={n_l}", flush=True)
    gen = np.asarray(r_l.tokens[0, r_l.prompt_len:])
    p_len = int(r_l.prompt_len)
    full_l = np.asarray(r_l.tokens[0, : p_len + n_l]).tolist()
    del eng

    # -- 2. all-wrong proposals: counter sanity + proposal round cost -------
    eng_p = WhisperEngine(params, arch, **kw)
    bad = next(t for t in range(200, 400) if t not in set(gen.tolist()))
    wrong = np.full((1, args.max_new + args.window), bad, np.int32)
    print("compiling proposal programs...", flush=True)
    eng_p.transcribe_features(mel, o_short, draft_tokens=wrong)
    tw_s, rw_s = timed(eng_p, o_short, wrong)
    tw_l, rw = timed(eng_p, o_long, wrong)
    assert np.array_equal(np.asarray(rw.tokens[0, rw.prompt_len:]), gen)
    dr_w = rw.spec_rounds - rw_s.spec_rounds
    print(f"all-wrong proposals: device rounds {rw_s.spec_rounds}/"
          f"{rw.spec_rounds} (sanity: differential {dr_w} == "
          f"{n_l - n_s} emitted? {'OK' if dr_w == n_l - n_s else 'MISMATCH'})",
          flush=True)
    t_round_p = (tw_l - tw_s) / dr_w * 1e3
    print(f"proposal round cost (device rounds): {t_round_p:.3f} ms "
          f"= {t_round_p / t_step:.2f}x a plain step", flush=True)
    del eng_p

    # -- 3. ngram: device rounds vs both sims -------------------------------
    eng_n = WhisperEngine(params, arch, spec_ngram=True, **kw)
    print("compiling ngram programs...", flush=True)
    eng_n.transcribe_features(mel, o_short)
    tn_s, rn_s = timed(eng_n, o_short)
    tn_l, rn = timed(eng_n, o_long)
    assert np.array_equal(np.asarray(rn.tokens[0, rn.prompt_len:]), gen)
    ngram = (n_l - n_s) / (tn_l - tn_s)
    dev_rounds = (rn_s.spec_rounds, rn.spec_rounds)
    opt_l, _, _ = simulate(full_l, args.window)
    opt_s, _, _ = simulate(full_l[: p_len + n_s], args.window)
    dx_l, _, h_l = simulate_device(full_l, p_len, args.window)
    dx_s, _, _ = simulate_device(full_l[: p_len + n_s], p_len, args.window)
    print(f"ngram: {ngram:.0f} tok/s measured ({ngram / plain:.2f}x plain)",
          flush=True)
    print(f"  device rounds short/long: {dev_rounds[0]}/{dev_rounds[1]}",
          flush=True)
    print(f"  optimistic sim:           {opt_s}/{opt_l}", flush=True)
    print(f"  device-exact sim:         {dx_s}/{dx_l} "
          f"({'MATCH' if (dx_s, dx_l) == dev_rounds else 'MISMATCH'})",
          flush=True)
    d_rounds = dev_rounds[1] - dev_rounds[0]
    t_round_n = (tn_l - tn_s) / max(d_rounds, 1) * 1e3
    tpr_dev = (n_l - n_s) / max(d_rounds, 1)
    print(f"  TRUE round cost (device rounds): {t_round_n:.3f} ms = "
          f"{t_round_n / t_step:.2f}x a step at {tpr_dev:.2f} tok/round",
          flush=True)
    print("  device-exact accepted-draft histogram (long): "
          + " ".join(f"m={i}:{100 * c / max(sum(h_l), 1):.0f}%"
                     for i, c in enumerate(h_l)), flush=True)

    # -- 4. corrected projections (device-exact rule on reference text) -----
    from tools.ngram_acceptance_sim import words_to_tokens
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    texts = []
    for f in ("README.md", "PARITY.md", "SURVEY.md"):
        p = os.path.join(root, f)
        if os.path.exists(p):
            raw = open(p, encoding="utf-8").read()
            raw = re.sub(r"```.*?```", " ", raw, flags=re.S)
            raw = re.sub(r"[|`#*_\[\]()>-]", " ", raw)
            texts.append(raw)
    natural = words_to_tokens(" ".join(texts))[:12000]
    repetitive = words_to_tokens(
        ("the quick brown fox jumps over the lazy dog and then ") * 60)
    for name, toks in (("natural", natural), ("repetitive", repetitive)):
        seq = [90001, 90002, 90003, 90004] + [t + 1 for t in toks]
        for rule, tt in (("legacy", False), ("two-tier", True)):
            r, e, _ = simulate_device(seq, 4, args.window, two_tier=tt)
            tpr = e / max(r, 1)
            for rc_name, rc in (("proposal-round", t_round_p),
                                ("ngram-round", t_round_n)):
                print(f"  {name:10s} {rule:8s} {tpr:.2f} tok/round x "
                      f"{rc_name} {rc:.3f} ms -> "
                      f"{tpr * t_step / rc:.2f}x plain", flush=True)


if __name__ == "__main__":
    main()

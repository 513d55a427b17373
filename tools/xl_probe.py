"""large-v3 (the reference's 220 tok/s headline model) on the real v5e.

Every number in benchmark/README.md is large-v3-turbo; the reference's
README.md:19 headline — "220 tok/s on an L40S" — is for whisper-large-v3
(32 decoder layers, ~8x turbo's decoder weights). This probe measures
the XL decode economics on hardware, same methodology as
tools/spec_probe.py (differential fori_loop microbenches with in-loop
output reduction; differential short/long e2e so the tunnel RTT and
fixed encode cost cancel; device round counts for speculative paths):

1. single decoder step, int8 weights (the "S" bs=1 baseline)
2. decoder_verify for W+1 positions (one weight read)
3. a 4-layer layer-skip draft step (turbo-geometry draft: large-v3's
   first 4 decoder layers — the distil-whisper shape)
4. modeled speculative speedup vs draft acceptance from (1)-(3)
   (random weights give ~zero real acceptance, so the end-to-end
   two-model win needs real distilled weights; the COST side is fully
   measurable here)
5. e2e plain greedy tok/s + proposal-drafting ceiling (all-right
   drafts) and floor (all-wrong drafts)

Usage: python tools/xl_probe.py [--bf16] [--window 4]
"""

import argparse
import dataclasses
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

N_LOOP = 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(fn, *args, iters=6):
    import jax

    r = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), r)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.tree.map(lambda x: x.block_until_ready(), r)
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def bench_diff(make_fn, args, iters=6):
    import jax

    f1 = jax.jit(make_fn(N_LOOP))
    f3 = jax.jit(make_fn(3 * N_LOOP))
    t1 = bench(f1, *args, iters=iters)
    t3 = bench(f3, *args, iters=iters)
    return (t3 - t1) / (2 * N_LOOP)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16", action="store_true",
                    help="also measure the bf16 ('XL'-engine analog) step")
    ap.add_argument("--e2e-only", action="store_true",
                    help="skip the micro section (step/verify/draft)")
    ap.add_argument("--window", type=int, default=4)
    args = ap.parse_args()
    w = args.window

    import jax
    import jax.numpy as jnp

    from thewhisper_tpu.config import (ARCH_PRESETS, GenerationOptions,
                                       SpecialTokens)
    from thewhisper_tpu.engine import WhisperEngine, make_layer_skip_draft
    from thewhisper_tpu.models.quant import quantize_params
    from thewhisper_tpu.models.whisper import (
        compute_cross_kv,
        decoder_prefill,
        decoder_step,
        decoder_verify,
        encoder_forward,
        init_params_device,
        make_cache,
    )

    log(f"backend={jax.default_backend()}")
    arch = dataclasses.replace(
        ARCH_PRESETS["large-v3"], max_source_positions=500,
        alignment_heads=((7, 0), (14, 3), (28, 7)))
    dt = jnp.bfloat16
    log("init large-v3 params on device (host init costs ~13 min over "
        "the tunnel)...")
    t0 = time.time()
    params_bf16 = init_params_device(arch, seed=0, dtype=dt)
    params = quantize_params(params_bf16, components=("decoder",))
    jax.tree.map(lambda x: x.block_until_ready(), params)
    draft4, darch4 = make_layer_skip_draft(params, arch, 4)
    log(f"  ready in {time.time() - t0:.0f}s")

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((1, 128, 1000)).astype(np.float32))
    if args.e2e_only:
        mel_np = np.asarray(mel, np.float32)
        _e2e_section(args, w, params, arch, dt, mel_np)
        return
    enc = jax.jit(lambda p, m: encoder_forward(p, m, arch, dt))(params, mel)
    s_cap = 4 + 160 + w + 1

    def setup(p_, a_):
        ck, cv = compute_cross_kv(p_, enc, a_)
        cache = make_cache(a_, 1, s_cap, ck.astype(dt), cv.astype(dt),
                           dtype=dt)
        prompt = jnp.asarray([[50258, 50259, 50360, 50364]], jnp.int32)
        _, cache, _ = decoder_prefill(p_, prompt, cache, a_, dt)
        return cache

    cache = jax.jit(lambda p: setup(p, arch))(params)
    d_cache = jax.jit(lambda p: setup(p, darch4))(draft4)
    tok = jnp.asarray([[1000]], jnp.int32)

    def make_steps(p_ref, a_, t_):
        def mk(n):
            def run(p_, c0):
                def body(i, carry):
                    c, acc = carry
                    logits, nc, _ = decoder_verify(
                        p_, t_, jnp.full((1,), 4, jnp.int32) + (i % 64), c,
                        a_, dt)
                    return nc, acc + jnp.sum(logits)
                _, acc = jax.lax.fori_loop(0, n, body, (c0, jnp.float32(0)))
                return acc
            return run
        return mk

    t_step = bench_diff(make_steps(params, arch, tok), (params, cache))
    log(f"single step (int8): {t_step*1e3:.3f} ms "
        f"-> plain ceiling {1.0/t_step:.0f} tok/s")

    win = jnp.asarray([list(range(1000, 1000 + w + 1))], jnp.int32)
    t_ver = bench_diff(make_steps(params, arch, win), (params, cache))
    log(f"verify ({w+1} tokens, one weight read): {t_ver*1e3:.3f} ms "
        f"= {t_ver/t_step:.2f}x a step")

    t_draft = bench_diff(make_steps(draft4, darch4, tok), (draft4, d_cache))
    log(f"draft step (4 of 32 layers): {t_draft*1e3:.3f} ms "
        f"= {t_draft/t_step:.2f}x a step")

    if args.bf16:
        cache_bf = jax.jit(lambda p: setup(p, arch))(params_bf16)
        t_bf = bench_diff(make_steps(params_bf16, arch, tok),
                          (params_bf16, cache_bf))
        log(f"single step (bf16 'XL' analog): {t_bf*1e3:.3f} ms "
            f"-> {1.0/t_bf:.0f} tok/s")

    r = t_ver / t_step
    d = t_draft / t_step
    log(f"modeled two-model speculative speedup at W={w} "
        f"(cost/round = {w}*{d:.2f} + {r:.2f} steps):")
    for a in (0.6, 0.7, 0.8, 0.9, 1.0):
        em = sum(a ** i for i in range(1, w + 1))
        log(f"  acceptance {a:.1f}: {(em + 1) / (w * d + r):.2f}x")

    # --- e2e: plain, proposal ceiling (all-right), floor (all-wrong) -------
    del cache, d_cache, enc
    if args.bf16:
        del cache_bf
    mel_np = np.asarray(mel, np.float32)
    _e2e_section(args, w, params, arch, dt, mel_np)


def _e2e_section(args, w, params, arch, dt, mel_np):
    import numpy as np

    from thewhisper_tpu.config import GenerationOptions, SpecialTokens
    from thewhisper_tpu.engine import WhisperEngine

    sp = SpecialTokens()
    ek = dict(compute_dtype=dt, batch_buckets=(1,),
              suppress_tokens=[sp.eot], spec_window=w)
    o_s = GenerationOptions(max_new_tokens=16, language="en")
    o_l = GenerationOptions(max_new_tokens=144, language="en")

    eng = WhisperEngine(params, arch, **ek)
    eng_p = WhisperEngine(params, arch, **ek)  # proposal variant programs

    log("compiling e2e programs...")
    r_l = eng.transcribe_features(mel_np, o_l)
    eng.transcribe_features(mel_np, o_s)
    right = np.asarray(r_l.tokens)[:, 4:]            # target's own greedy
    right = np.pad(right, ((0, 0), (0, w + 1)))
    wrong = np.full_like(right, 300)
    eng_p.transcribe_features(mel_np, o_s, draft_tokens=wrong)
    eng_p.transcribe_features(mel_np, o_l, draft_tokens=wrong)

    # Interleaved A/B/C so tunnel drift hits all arms equally.
    P, R, W_ = {}, {}, {}
    for name, e_, dr in (("plain", eng, None),
                         ("right", eng_p, right),
                         ("wrong", eng_p, wrong)):
        P[name], R[name], W_[name] = [], [], []
    for _ in range(8):
        for name, e_, dr in (("plain", eng, None),
                             ("right", eng_p, right),
                             ("wrong", eng_p, wrong)):
            t0 = time.perf_counter()
            rs = e_.transcribe_features(mel_np, o_s, draft_tokens=dr)
            P[name].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            rl = e_.transcribe_features(mel_np, o_l, draft_tokens=dr)
            R[name].append(time.perf_counter() - t0)
            W_[name] = (rs.spec_rounds, rl.spec_rounds)
    med = statistics.median
    emitted = 144 - 16
    base = emitted / (med(R["plain"]) - med(P["plain"]))
    log(f"e2e plain greedy: {base:.0f} tok/s (differential)")
    for name in ("right", "wrong"):
        dt_ = med(R[name]) - med(P[name])
        rs, rl = W_[name]
        extra = (f", {(rl or 0) - (rs or 0)} rounds"
                 if rl is not None else "")
        log(f"e2e proposal {name}: {emitted/dt_:.0f} tok/s "
            f"({emitted/dt_/base:.2f}x plain{extra})")


if __name__ == "__main__":
    main()

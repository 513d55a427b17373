"""Speculative-decoding economics on the real chip (turbo "S", bs=1).

Measures, with fori_loop-amortized jits (full output reduced INSIDE the
loop — see benchmark/README.md probe methodology):

1. single decoder_step cost (the greedy baseline, int8 weights)
2. decoder_verify window cost for W+1 = 5 tokens (one weight read
   scoring 5 positions)
3. a 2-layer layer-skip draft step cost
4. end-to-end speculative_decode tok/s with draft == target (100%
   acceptance: validates the loop on hardware and bounds its overhead)

From (1)-(3) the expected speedup at draft acceptance rate a is
    speedup(a) = (E[m] + 1) / (W*d + r),   E[m] = sum_{i<=W} a^i
in units of single steps, where d/r are the draft/verify costs relative
to one step. Random weights give a ~= 0 for any real draft, so the
end-to-end win cannot be measured here — the microbenchmark ratios plus
literature acceptance (0.7-0.9 for distil drafts) give the estimate.
"""

import dataclasses
import json
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

N_LOOP = 64
W = 4


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(fn, *args, iters=6):
    fn(*args)                                     # compile + warm
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*args)
        jax_block(r)
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def bench_diff(make_fn, args, iters=6):
    """Per-iteration cost via N vs 3N loop lengths — cancels the tunnel
    RTT and dispatch overhead that a single absolute timing includes."""
    import jax

    f1 = jax.jit(make_fn(N_LOOP))
    f3 = jax.jit(make_fn(3 * N_LOOP))
    t1 = bench(f1, *args, iters=iters)
    t3 = bench(f3, *args, iters=iters)
    return (t3 - t1) / (2 * N_LOOP)


def jax_block(r):
    import jax

    jax.tree.map(lambda x: x.block_until_ready(), r)


def main():
    import jax
    import jax.numpy as jnp

    from thewhisper_tpu.config import ARCH_PRESETS, GenerationOptions, SpecialTokens
    from thewhisper_tpu.engine import WhisperEngine, make_layer_skip_draft
    from thewhisper_tpu.engine.decode import suppress_mask
    from thewhisper_tpu.models.quant import quantize_params
    from thewhisper_tpu.models.whisper import (
        compute_cross_kv,
        decoder_prefill,
        decoder_step,
        decoder_verify,
        encoder_forward,
        init_params,
        make_cache,
    )

    log(f"backend={jax.default_backend()}")
    arch = dataclasses.replace(
        ARCH_PRESETS["large-v3-turbo"], max_source_positions=500,
        alignment_heads=((1, 0), (2, 3), (3, 7)))
    dt = jnp.bfloat16
    log("init turbo int8 params...")
    t0 = time.time()
    params = quantize_params(init_params(arch, seed=0, dtype=dt),
                             components=("decoder",))
    draft2, darch2 = make_layer_skip_draft(params, arch, 2)
    log(f"  ready in {time.time() - t0:.0f}s")

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((1, 128, 1000)).astype(np.float32))
    enc = jax.jit(lambda p, m: encoder_forward(p, m, arch, dt))(params, mel)
    s_cap = 4 + 160 + W + 1

    def setup(p_, a_):
        ck, cv = compute_cross_kv(p_, enc, a_)
        cache = make_cache(a_, 1, s_cap, ck.astype(dt), cv.astype(dt), dtype=dt)
        prompt = jnp.asarray([[50258, 50259, 50360, 50364]], jnp.int32)
        _, cache, _ = decoder_prefill(p_, prompt, cache, a_, dt)
        return cache

    cache = jax.jit(lambda p: setup(p, arch))(params)
    d_cache = jax.jit(lambda p: setup(p, darch2))(draft2)

    tok = jnp.asarray([[1000]], jnp.int32)

    # --- 1. single step ----------------------------------------------------
    def make_steps(n):
        def run(p_, c0):
            def body(i, carry):
                c, acc = carry
                logits, nc, _ = decoder_step(
                    p_, tok, jnp.int32(4) + (i % 64), c, arch, dt)
                return nc, acc + jnp.sum(logits)
            _, acc = jax.lax.fori_loop(0, n, body, (c0, jnp.float32(0)))
            return acc
        return run

    t_step = bench_diff(make_steps, (params, cache))
    log(f"single step (int8): {t_step*1e3:.3f} ms")

    # --- 2. verify window of W+1 tokens ------------------------------------
    win = jnp.asarray([[1000, 1001, 1002, 1003, 1004]], jnp.int32)

    def make_verify(n):
        def run(p_, c0):
            def body(i, carry):
                c, acc = carry
                logits, nc, _ = decoder_verify(
                    p_, win, jnp.full((1,), 4, jnp.int32) + (i % 64), c,
                    arch, dt)
                return nc, acc + jnp.sum(logits)
            _, acc = jax.lax.fori_loop(0, n, body, (c0, jnp.float32(0)))
            return acc
        return run

    t_ver = bench_diff(make_verify, (params, cache))
    log(f"verify (5 tokens, one weight read): {t_ver*1e3:.3f} ms "
        f"= {t_ver/t_step:.2f}x a step -> "
        f"{5*t_step/t_ver:.2f}x token-throughput at full acceptance")

    # --- 3. 2-layer draft step ---------------------------------------------
    def make_draft(n):
        def run(p_, c0):
            def body(i, carry):
                c, acc = carry
                logits, nc, _ = decoder_verify(
                    p_, tok, jnp.full((1,), 4, jnp.int32) + (i % 64), c,
                    darch2, dt)
                return nc, acc + jnp.sum(logits)
            _, acc = jax.lax.fori_loop(0, n, body, (c0, jnp.float32(0)))
            return acc
        return run

    t_draft = bench_diff(make_draft, (draft2, d_cache))
    log(f"draft step (2 of 4 layers): {t_draft*1e3:.3f} ms "
        f"= {t_draft/t_step:.2f}x a step")

    r = t_ver / t_step
    d = t_draft / t_step
    for a in (0.6, 0.7, 0.8, 0.9, 1.0):
        em = sum(a ** i for i in range(1, W + 1))
        log(f"  modeled speedup @ acceptance {a:.1f}: "
            f"{(em + 1) / (W * d + r):.2f}x")

    # --- 4. end-to-end A/B: plain vs ngram-spec vs all-accept --------------
    mel_np = np.asarray(mel, np.float32)
    s_opts = GenerationOptions(max_new_tokens=16, language="en")
    l_opts = GenerationOptions(max_new_tokens=144, language="en")

    def e2e(eng, n=8):
        eng.transcribe_features(mel_np, s_opts)
        eng.transcribe_features(mel_np, l_opts)

        def timed(o):
            ts = []
            res = None
            for _ in range(n):
                t0 = time.perf_counter()
                res = eng.transcribe_features(mel_np, o)
                ts.append(time.perf_counter() - t0)
            return statistics.median(ts), res

        ts_, rs_ = timed(s_opts)
        tl_, rl_ = timed(l_opts)
        n_s, n_l = int(rs_.num_generated[0]), int(rl_.num_generated[0])
        return (n_l - n_s) / max(tl_ - ts_, 1e-9), rl_

    ek = dict(compute_dtype=dt, batch_buckets=(1,),
              suppress_tokens=[SpecialTokens().eot])
    plain_tok_s, r_plain = e2e(WhisperEngine(params, arch, **ek))
    log(f"e2e plain greedy: {plain_tok_s:.0f} tok/s")
    ng_tok_s, r_ng = e2e(WhisperEngine(
        params, arch, spec_ngram=True, spec_window=W, **ek))
    same = bool(np.array_equal(
        np.asarray(r_plain.tokens), np.asarray(r_ng.tokens)))
    log(f"e2e ngram-spec:   {ng_tok_s:.0f} tok/s "
        f"({ng_tok_s/plain_tok_s:.2f}x plain; tokens identical: {same})")
    aa_tok_s, _ = e2e(WhisperEngine(
        params, arch, draft_params=params, draft_arch=arch,
        spec_window=W, **ek))
    # Cost model for draft == target: W+1 full-model draft steps (the
    # +1 keeps the draft cache hole-free) + one verify per W+1 tokens.
    log(f"e2e all-accept (draft==target, loop-overhead check): "
        f"{aa_tok_s:.0f} tok/s "
        f"(cost model expects ~{(W+1)/(W+1+r):.2f}x a greedy step rate)")

    print(json.dumps({
        "step_ms": round(t_step * 1e3, 3),
        "verify5_ms": round(t_ver * 1e3, 3),
        "draft2_ms": round(t_draft * 1e3, 3),
        "verify_vs_step": round(r, 3),
        "draft_vs_step": round(d, 3),
        "e2e_plain_tok_s": round(plain_tok_s, 1),
        "e2e_ngram_tok_s": round(ng_tok_s, 1),
        "ngram_tokens_identical": same,
        "e2e_all_accept_tok_s": round(aa_tok_s, 1),
    }))


if __name__ == "__main__":
    main()

"""Race the decode megakernel against the production XLA step.

tools/gemv_chain_probe.py measured the large-v3 decode MLP chain at
0.573 ms in one Pallas kernel vs 0.750 ms under XLA (89% vs ~57% of the
HBM floor) and concluded the adoption path is a FULL-STEP megakernel.
ops/mega_step.py is that kernel: all 32 layers (fused-qkv GEMV,
self-attention over the slot-major KV cache, int8 cross-attention, MLP)
plus final LN and the tied-embedding logits GEMV in one pallas_call.

This probe, on large-v3 decode shapes (L=32, D=1280, F=5120, H=20,
S cache slots, T_enc=1500, V=51866, int8-S weights):
1. pins megakernel numerics against models.whisper.decoder_step on the
   real chip (logits / cache / alignment);
2. times N-vs-3N interleaved decode loops: XLA decoder_step (including
   embed + logits + where-iota cache write — the production body) vs
   mega_decoder_step, both with/without alignment capture.

Roofline: per step the kernel moves ~(L x (qkv 3D^2 + 2 D^2 proj + cross
q/o + 2 D F) int8 + self 2 S D bf16 + cross 2 T_pad D int8) + emb D V_pad
int8 ~= 1.0 GB on large-v3 at S=448 -> ~1.22 ms at 819 GB/s.

Usage: python tools/mega_step_probe.py [--layers 32] [--slots 448]
       [--steps 24] [--reps 5] [--align] [--cpu]
"""

import argparse
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--slots", type=int, default=448)
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--prompt", type=int, default=4)
    ap.add_argument("--align", action="store_true",
                    help="also time the capture_alignment=True variants")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from thewhisper_tpu.config import WhisperArch
    from thewhisper_tpu.models.quant import quantize_kv, quantize_params
    from thewhisper_tpu.models.whisper import (
        DecodeCache,
        compute_cross_kv,
        decoder_prefill,
        decoder_step,
        fuse_self_qkv_params,
        init_params_device,
        make_cache,
    )
    from thewhisper_tpu.ops.mega_step import (
        from_slot_major,
        mega_decoder_step,
        pack_mega_params,
        prepare_mega_cache,
    )

    log(f"backend={jax.default_backend()}")
    L, S, P = args.layers, args.slots, args.prompt
    arch = WhisperArch(
        d_model=1280, encoder_layers=2, encoder_heads=20,
        decoder_layers=L, decoder_heads=20, d_ff=5120, n_mels=128,
        vocab_size=51866, max_source_positions=1500,
        max_target_positions=448,
        alignment_heads=tuple((i % L, (3 * i) % 20) for i in range(8)))

    t0 = time.time()
    params = init_params_device(arch, dtype=jnp.bfloat16)
    params = quantize_params(params, components=("decoder",))
    params = fuse_self_qkv_params(params)
    params = pack_mega_params(params, arch)
    assert "_mega" in params["decoder"], "mega pack refused the params"
    jax.block_until_ready(params["decoder"]["_mega"]["embt"])
    log(f"params ready in {time.time() - t0:.1f}s")

    enc_out = jax.jit(
        lambda k: 0.1 * jax.random.normal(k, (1, 1500, 1280), jnp.bfloat16)
    )(jax.random.PRNGKey(1))
    ck, cv = compute_cross_kv(params, enc_out, arch)
    ckq, cvq = quantize_kv(ck), quantize_kv(cv)
    cache0 = make_cache(arch, 1, S, ckq, cvq, dtype=jnp.bfloat16)
    prompt = jnp.asarray(np.arange(1, P + 1)[None], jnp.int32)

    @jax.jit
    def prefill(params, cache):
        _, cache, _ = decoder_prefill(params, prompt, cache, arch,
                                      jnp.bfloat16)
        return cache

    cache = prefill(params, cache0)
    sk0, sv0, cross = prepare_mega_cache(cache)
    sk0, sv0 = jax.block_until_ready((sk0, sv0))
    log("prefill + slot-major conversion done")

    # --- numerics on the real chip -----------------------------------------
    tok = jnp.asarray([[17]], jnp.int32)
    pos = jnp.int32(P)
    lg_r, cache_r, al_r = jax.jit(
        lambda p, t, q, c: decoder_step(p, t, q, c, arch, jnp.bfloat16)
    )(params, tok, pos, cache)
    lg_m, (sk1, sv1), al_m = jax.jit(
        lambda p, t, q, k, v: mega_decoder_step(p, t, q, k, v, cross, arch,
                                                True)
    )(params, tok, pos, sk0, sv0)
    lr, lm = np.asarray(lg_r, np.float32), np.asarray(lg_m, np.float32)
    rel = np.abs(lr - lm).max() / max(np.abs(lr).max(), 1e-6)
    log(f"numerics: logits max rel err = {rel:.2e}")
    am, ar = np.asarray(al_m, np.float32), np.asarray(al_r, np.float32)
    log(f"numerics: align max abs err = {np.abs(am - ar).max():.2e}")
    kr = np.asarray(cache_r.self_k, np.float32)
    km = np.asarray(from_slot_major(sk1[:, :S], 20), np.float32)  # trim sublane pad
    log(f"numerics: cache-k max abs err = {np.abs(kr - km).max():.2e}")
    assert rel < 5e-2, "megakernel diverged from the XLA step"

    # --- timing loops (production body shape: embed->step->argmax) --------
    def make_xla_loop(n, capture):
        @jax.jit
        def loop(params, cache, tok):
            def body(i, c):
                t, ck_, cv_, tk = c
                step_cache = DecodeCache(ck_, cv_, cache.cross_k,
                                         cache.cross_v)
                lg, nc, al = decoder_step(params, tk, P + (i % (S - P - 1)),
                                          step_cache, arch, jnp.bfloat16)
                tk = jnp.argmax(lg, axis=-1).astype(jnp.int32)[:, None]
                acc = t + jnp.sum(lg) + (jnp.sum(al) if capture else 0.0)
                return (acc, nc.self_k, nc.self_v, tk)
            t, _, _, tk = jax.lax.fori_loop(
                0, n, body, (jnp.float32(0), cache.self_k, cache.self_v, tok))
            return t + jnp.sum(tk.astype(jnp.float32))
        return loop

    def make_mega_loop(n, capture, cache_write=True):
        @jax.jit
        def loop(params, sk, sv, tok):
            def body(i, c):
                t, k, v, tk = c
                lg, (nk, nv), al = mega_decoder_step(
                    params, tk, P + (i % (S - P - 1)), k, v, cross, arch,
                    capture)
                tk = jnp.argmax(lg, axis=-1).astype(jnp.int32)[:, None]
                acc = t + jnp.sum(lg) + (jnp.sum(al) if capture else 0.0)
                if not cache_write:   # isolate the where-iota update cost
                    nk, nv = k, v
                return (acc, nk, nv, tk)
            t, _, _, tk = jax.lax.fori_loop(
                0, n, body, (jnp.float32(0), sk, sv, tok))
            return t + jnp.sum(tk.astype(jnp.float32))
        return loop

    n = args.steps
    variants = [("noalign", False)] + ([("align", True)] if args.align else [])
    for tag, cap in variants:
        arms = {
            "xla": (make_xla_loop(n, cap), make_xla_loop(3 * n, cap),
                    (params, cache, tok)),
            "mega": (make_mega_loop(n, cap), make_mega_loop(3 * n, cap),
                     (params, sk0, sv0, tok)),
            "mega_nowrite": (
                make_mega_loop(n, cap, cache_write=False),
                make_mega_loop(3 * n, cap, cache_write=False),
                (params, sk0, sv0, tok)),
        }
        for l1, l3, a in arms.values():
            float(l1(*a))
            float(l3(*a))
        log(f"compiled {tag}")
        res = {k: [] for k in arms}
        for _ in range(args.reps):
            for k, (l1, l3, a) in arms.items():
                t0 = time.perf_counter()
                float(l1(*a))
                t1 = time.perf_counter()
                float(l3(*a))
                t2 = time.perf_counter()
                res[k].append(((t2 - t1) - (t1 - t0)) / (2 * n) * 1e3)
        for k in arms:
            med = statistics.median(res[k])
            log(f"[{tag}] {k:12s}: {med:.3f} ms/step (min {min(res[k]):.3f})")
        mx, mm = statistics.median(res["xla"]), statistics.median(res["mega"])
        log(f"[{tag}] speedup {mx / mm:.3f}x; mega tok/s {1e3 / mm:.0f}")


if __name__ == "__main__":
    main()

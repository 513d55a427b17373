"""Race the verify megakernel against the production XLA verify pass.

ops/mega_step.py::mega_decoder_verify runs a whole W-token speculative
verify window (all L layers + final LN + logits) as ONE Pallas kernel,
streaming each weight tile once for all W query rows — the same
kernel-boundary-elimination win as the decode megakernel (2.204 ->
1.714 ms = 1.29x on the large-v3 step), applied to the speculative
round's dominant cost (the verify pass measured ~0.92x a plain step
under XLA).

On large-v3 decode shapes (L=32, D=1280, F=5120, H=20, int8-S weights,
int8 cross-KV), this probe:
1. pins kernel numerics against models.whisper.decoder_verify on the
   real chip (per-row logits + window cache writes);
2. times N-vs-3N interleaved loops of the full verify body (embed +
   pass + cache write) for XLA vs mega at W in {5, 8};
3. prints the implied speculative-round economics (verify cost in units
   of the plain mega step).

Usage: python tools/mega_verify_probe.py [--layers 32] [--slots 448]
       [--window 5] [--steps 16] [--reps 5] [--cpu]
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
    ap.add_argument("--slots", type=int, default=256,
                    help="cache slots (production spec sizing is "
                         "prompt+max_new+W+1, ~240 for 224-token windows)")
    ap.add_argument("--window", type=int, default=5,
                    help="verify window W (spec_window + 1)")
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--prompt", type=int, default=4)
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
        decoder_verify,
        fuse_self_qkv_params,
        init_params_device,
        make_cache,
    )
    from thewhisper_tpu.ops.mega_step import (
        from_slot_major,
        mega_decoder_verify,
        pack_mega_params,
        prepare_mega_cache,
    )

    log(f"backend={jax.default_backend()}")
    arch = WhisperArch(
        d_model=1280, encoder_layers=2, encoder_heads=20,
        decoder_layers=args.layers, decoder_heads=20, d_ff=5120,
        n_mels=128, vocab_size=51866, max_source_positions=1500,
        max_target_positions=448,
        alignment_heads=tuple((i % args.layers, i % 20) for i in range(8)))
    t0 = time.time()
    params = init_params_device(arch, seed=0, dtype=jnp.bfloat16)
    params = quantize_params(params, components=("decoder",))
    params = fuse_self_qkv_params(params)
    params = pack_mega_params(params, arch)
    jax.block_until_ready(params["decoder"]["_mega"]["embt"])
    log(f"params ready in {time.time() - t0:.1f}s")

    rng = np.random.default_rng(0)
    enc = jnp.asarray(
        rng.standard_normal((1, 1500, 1280)) * 0.05, jnp.bfloat16)
    ck, cv = compute_cross_kv(params, enc, arch)
    cache = make_cache(arch, 1, args.slots, quantize_kv(ck),
                       quantize_kv(cv), dtype=jnp.bfloat16)
    prompt = jnp.asarray([[50258, 50259, 50360, 50364][:args.prompt]],
                         jnp.int32)
    _, cache, _ = decoder_prefill(params, prompt, cache, arch, jnp.bfloat16)
    sk, sv, cross = prepare_mega_cache(cache)
    jax.block_until_ready(sk)
    log("prefill + slot-major conversion done")

    w = args.window
    pos = args.prompt
    window = jnp.asarray([[100 + 13 * i for i in range(w)]], jnp.int32)

    # --- numerics (params/cache as jit ARGS, like mega_step_probe) ------
    posv = jnp.asarray([pos], jnp.int32)
    lg_r, cache_r, _ = jax.jit(
        lambda p, t, q, c: decoder_verify(p, t, q, c, arch, jnp.bfloat16)
    )(params, window, posv, cache)
    jax.block_until_ready(lg_r)
    log("xla verify numerics done")
    lg_m, (sk1, sv1), _ = jax.jit(
        lambda p, t, q, k, v: mega_decoder_verify(p, t, q, k, v, cross,
                                                  arch)
    )(params, window, jnp.int32(pos), sk, sv)
    jax.block_until_ready(lg_m)
    log("mega verify numerics done")
    lr = np.asarray(lg_r, np.float32)
    lm = np.asarray(lg_m, np.float32)
    rel = np.abs(lr - lm).max() / max(np.abs(lr).max(), 1e-6)
    log(f"numerics: logits max rel err = {rel:.2e}")
    kr = np.asarray(cache_r.self_k, np.float32)
    km = np.asarray(from_slot_major(sk1[:, :args.slots],
                                    arch.decoder_heads),
                    np.float32)   # trim the sublane pad
    log(f"numerics: cache-k max abs err = {np.abs(kr - km).max():.2e}")
    assert rel < 5e-2, "verify megakernel diverged from the XLA pass"

    # --- timed loops: full verify body incl. embed + cache write -------
    def make_xla_loop(n):
        @jax.jit
        def run(k0, v0):
            def body(i, kv):
                k, v = kv
                lg, nc, _ = decoder_verify(
                    params, window, jnp.asarray([pos], jnp.int32),
                    DecodeCache(k, v, cache.cross_k, cache.cross_v),
                    arch, jnp.bfloat16)
                # Consume logits so nothing is dead-code-eliminated.
                k = nc.self_k + 0 * jnp.sum(lg).astype(nc.self_k.dtype)
                return (k, nc.self_v)
            k, v = jax.lax.fori_loop(0, n, body, (k0, v0))
            return jnp.sum(k.astype(jnp.float32)), jnp.sum(
                v.astype(jnp.float32))
        return run

    def make_mega_loop(n):
        @jax.jit
        def run(k0, v0):
            def body(i, kv):
                k, v = kv
                lg, (nk, nv), _ = mega_decoder_verify(
                    params, window, jnp.int32(pos), k, v, cross, arch)
                nk = nk + 0 * jnp.sum(lg).astype(nk.dtype)
                return (nk, nv)
            k, v = jax.lax.fori_loop(0, n, body, (k0, v0))
            return jnp.sum(k.astype(jnp.float32)), jnp.sum(
                v.astype(jnp.float32))
        return run

    n = args.steps
    arms = {
        "xla ": (make_xla_loop(n), make_xla_loop(3 * n),
                 (cache.self_k, cache.self_v)),
        "mega": (make_mega_loop(n), make_mega_loop(3 * n), (sk, sv)),
    }
    for name, (f1, f3, a) in arms.items():
        jax.block_until_ready(f1(*a))
        jax.block_until_ready(f3(*a))
        log(f"compiled {name.strip()}")

    res = {}
    for name in arms:
        res[name] = []
    for _ in range(args.reps):
        for name, (f1, f3, a) in arms.items():      # interleaved A/B
            t1 = time.perf_counter()
            jax.block_until_ready(f1(*a))
            t1 = time.perf_counter() - t1
            t3 = time.perf_counter()
            jax.block_until_ready(f3(*a))
            t3 = time.perf_counter() - t3
            res[name].append((t3 - t1) / (2 * n))
    out = {}
    for name, xs in res.items():
        ms = statistics.median(xs) * 1e3
        out[name] = ms
        log(f"[W={w}] {name}: {ms:.3f} ms/verify (min {min(xs)*1e3:.3f})")
    sp = out["xla "] / out["mega"]
    log(f"[W={w}] speedup {sp:.3f}x; verify = "
        f"{out['mega']:.3f} ms for {w} tokens "
        f"({out['mega'] / w:.3f} ms/tok amortized)")


if __name__ == "__main__":
    main()

"""Does fusing the self-attention q/k/v projections pay at bs=1?

The large-v3 int8 decode step runs at 2.07 ms ~ 48% of its ~0.98 ms HBM
floor, and the int4 probe proved the residual is PER-KERNEL OVERHEAD,
not weight bandwidth (halving weight bytes bought only 8-10%,
models/quant.py:26-36). Each decoder layer issues 8 projection matmuls
(self q/k/v/o, cross q/o, fc1/fc2); concatenating the self q/k/v
weights into one (in, 3*out) GEMV removes 2 kernels per layer — 64 of
the ~256 projection kernels per large-v3 step.

Method: the REAL ``_stack_step`` (imported) vs a probe-local twin whose
only change is the fused qkv projection, both driven by the same
fori_loop harness (N vs 3N differential, result reduced in-loop,
interleaved reps — CLAUDE.md measurement rules). Weights are the same
int8 leaves; the fused copy concatenates q/s once at setup.

Usage: python tools/qkv_fuse_probe.py [--arch large-v3] [--steps 64]
"""

import argparse
import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="large-v3")
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from thewhisper_tpu.config import ARCH_PRESETS
    from thewhisper_tpu.models.quant import quantize_params
    from thewhisper_tpu.models import whisper as W
    from thewhisper_tpu.models.whisper import (
        compute_cross_kv,
        decoder_prefill,
        init_params_device,
        make_cache,
    )

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    arch = dataclasses.replace(
        ARCH_PRESETS[args.arch], max_source_positions=500,
        alignment_heads=((1, 0), (2, 3)))
    dt = jnp.bfloat16
    B = args.batch
    t0 = time.time()
    base = init_params_device(arch, seed=0, dtype=dt)
    p8 = quantize_params({"decoder": base["decoder"]},
                         components=("decoder",))
    log(f"device init+quant {time.time() - t0:.0f}s")

    # Fused twin: concat self q/k/v int8 leaves along the out axis.
    dec = dict(p8["decoder"])
    layers = dict(dec["layers"])
    sa = layers["self"]
    fused_w = {"q": jnp.concatenate(
        [sa["q_w"]["q"], sa["k_w"]["q"], sa["v_w"]["q"]], axis=-1),
        "s": jnp.concatenate(
        [sa["q_w"]["s"], sa["k_w"]["s"], sa["v_w"]["s"]], axis=-1)}
    d = arch.d_model
    fused_b = jnp.concatenate(
        [sa["q_b"], jnp.zeros((sa["q_b"].shape[0], d), sa["q_b"].dtype),
         sa["v_b"]], axis=-1)
    layers_f = dict(layers)
    layers_f["self_qkv_w"] = fused_w
    layers_f["self_qkv_b"] = fused_b
    dec_f = dict(dec)
    dec_f["layers"] = layers_f
    pf = {"decoder": dec_f}

    n_heads = arch.decoder_heads
    sel = W._alignment_selector(arch)

    def stack_step_fused(params, x, cache, position):
        """_stack_step with ONE fused self-qkv GEMV per layer."""
        dcr = params["decoder"]
        s_max = cache.self_k.shape[4]
        mask = (jnp.arange(s_max) < position)[None, None, None, :]

        def layer(carry, xs):
            h = carry
            lp, cross_k, cross_v, self_k, self_v = xs
            q_in = W._layer_norm(h, lp["ln1"]["scale"], lp["ln1"]["bias"])
            qkv = W._linear(q_in, lp["self_qkv_w"], lp["self_qkv_b"])
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = jnp.transpose(W._split_heads(q, n_heads), (0, 2, 1, 3))
            k = jnp.transpose(W._split_heads(k, n_heads), (0, 2, 1, 3))
            v = jnp.transpose(W._split_heads(v, n_heads), (0, 2, 1, 3))
            dh = q.shape[-1]
            self_logit = jnp.sum(
                (q * dh ** -0.5).astype(jnp.float32)
                * k.astype(jnp.float32), axis=-1, keepdims=True)
            a, _ = W._attn_feature_major(
                q, self_k.astype(q.dtype), self_v.astype(q.dtype), mask,
                extra_logit=self_logit, extra_v=v.astype(q.dtype))
            h = h + W._linear(W._merge_heads(a), lp["self"]["o_w"],
                              lp["self"]["o_b"])
            h, align = W._cross_and_mlp(h, lp, n_heads, cross_k, cross_v,
                                        xs[0]["_align_sel"])
            return h, (jnp.transpose(k, (0, 1, 3, 2)).astype(self_k.dtype),
                       jnp.transpose(v, (0, 1, 3, 2)).astype(self_v.dtype),
                       align)

        layers_x = dict(dcr["layers"])
        layers_x["_align_sel"] = jnp.asarray(sel)
        xs = (layers_x, cache.cross_k, cache.cross_v, cache.self_k,
              cache.self_v)
        x, (k_new, v_new, _) = jax.lax.scan(layer, x, xs)
        slot = jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, 1, 1, cache.self_k.shape[4]), 4) == position
        new_cache = W.DecodeCache(
            jnp.where(slot, k_new, cache.self_k),
            jnp.where(slot, v_new, cache.self_v),
            cache.cross_k, cache.cross_v)
        x = W._layer_norm(x, dcr["ln_post"]["scale"],
                          dcr["ln_post"]["bias"])
        return x, new_cache

    rng = jax.random.PRNGKey(0)
    enc = (0.02 * jax.random.normal(
        rng, (B, arch.max_source_positions, arch.d_model), jnp.float32)
    ).astype(dt)
    N = args.steps
    s_cap = 8 + 3 * N + 1
    prompt = jnp.full((B, 4), 50258, jnp.int32)

    def make_loop(params, n_steps, fused):
        def run(params):
            ck, cv = compute_cross_kv(params, enc, arch)
            cache = make_cache(arch, B, s_cap, ck, cv, dtype=dt)
            logits, c, _ = decoder_prefill(params, prompt, cache, arch, dt)
            tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)

            def body(i, carry):
                tok, c, acc = carry
                x = W._embed_tokens(params["decoder"], tok[:, None],
                                    4 + i, dt)
                if fused:
                    x, c = stack_step_fused(params, x, c, 4 + i)
                else:
                    x, c, _ = W._stack_step(params, x, arch, c, 4 + i, sel)
                lg = W._logits(params["decoder"], x)[:, 0]
                tok = jnp.argmax(lg, -1).astype(jnp.int32)
                return tok, c, acc + jnp.sum(tok)

            tok, c, acc = jax.lax.fori_loop(
                0, n_steps, body, (tok, c, jnp.int32(0)))
            return acc

        return jax.jit(run)

    variants = {
        "separate": (make_loop(p8, N, False), make_loop(p8, 3 * N, False), p8),
        "fused-qkv": (make_loop(pf, N, True), make_loop(pf, 3 * N, True), pf),
    }
    for name, (fn, fn3, p) in variants.items():
        int(fn(p))
        int(fn3(p))
        log(f"{name}: compiled")
    best = {k: float("inf") for k in variants}
    for r in range(args.reps):
        for name, (fn, fn3, p) in variants.items():
            t0 = time.perf_counter()
            int(fn(p))
            t1 = time.perf_counter()
            int(fn3(p))
            t2 = time.perf_counter()
            ms = (t2 - t1 - (t1 - t0)) / (2 * N) * 1e3
            best[name] = min(best[name], ms)
            log(f"  rep{r} {name}: {ms:.3f} ms/step")
    for name, ms in best.items():
        log(f"{name}: BEST {ms:.3f} ms/step -> {1e3 / ms:.0f} tok/s")
    if all(np.isfinite(v) for v in best.values()):
        log(f"fused speedup: {best['separate'] / best['fused-qkv']:.3f}x")


if __name__ == "__main__":
    main()

"""Phase attribution of the bs=32 decode step (VERDICT r4 #4).

The measured bs=32 step (1.5 ms) reads 705 MB -> 57% of the 819 GB/s
HBM peak while tools/gemv_chain_probe.py demonstrated 89% is reachable
with boundary-free weight streaming. Byte budget (utils/flops.py,
turbo, cache 84, t_enc 1500, bs 32):

    cross-KV int8  492 MB   (70%)  <- the lever, if any
    weights  int8   92 MB
    embedding int8  66 MB
    self-cache bf16 55 MB

This probe times each phase in ISOLATION as jitted fns over the real
leaves (same shapes/dtypes as the production step), so the slack can be
attributed: scan/kernel-boundary overhead (full-vs-sum gap) vs a phase
running under the HBM floor (phase% column).

Run on an idle real TPU: python tools/bs32_step_probe.py
"""

import dataclasses
import statistics
import time

import numpy as np

import jax
import jax.numpy as jnp

HBM = 819e9


def timeit(fn, *args, iters=20):
    r = fn(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main() -> None:
    from thewhisper_tpu.config import ARCH_PRESETS
    from thewhisper_tpu.models.quant import quantize_kv, quantize_params
    from thewhisper_tpu.models.whisper import (
        compute_cross_kv,
        decoder_prefill,
        decoder_step,
        fuse_self_qkv_params,
        init_params_device,
        make_cache,
    )

    print(f"backend: {jax.default_backend()}", flush=True)
    arch = dataclasses.replace(
        ARCH_PRESETS["large-v3-turbo"],
        alignment_heads=((1, 0), (2, 3), (3, 7)))
    B, T, S, P = 32, 1500, 84, 4
    L, D, F, H = (arch.decoder_layers, arch.d_model, arch.d_ff,
                  arch.decoder_heads)
    dh = D // H
    V = arch.vocab_size
    print("init params on device...", flush=True)
    params = fuse_self_qkv_params(quantize_params(
        init_params_device(arch, seed=0, dtype=jnp.bfloat16),
        components=("decoder",)))
    rng = np.random.default_rng(0)
    enc = jnp.asarray(rng.standard_normal((B, T, D)) * 0.1, jnp.bfloat16)
    ck, cv = jax.jit(compute_cross_kv, static_argnums=2)(params, enc, arch)
    cache = make_cache(arch, B, S, quantize_kv(ck), quantize_kv(cv),
                       dtype=jnp.bfloat16)
    prompt = jnp.tile(jnp.asarray([[1, 2, 3, 4]], jnp.int32), (B, 1))
    _, cache, _ = jax.jit(decoder_prefill, static_argnums=(3, 4))(
        params, prompt, cache, arch, jnp.bfloat16)
    tok = jnp.ones((B, 1), jnp.int32)

    step = jax.jit(lambda p, t, c: decoder_step(
        p, t, jnp.int32(P + 3), c, arch, jnp.bfloat16)[0].sum())
    t_full = timeit(step, params, tok, cache)
    total_mb = 705
    print(f"full step: {t_full*1e3:.3f} ms -> "
          f"{total_mb/1e3/ t_full / (HBM/1e9) * 100:.1f}% HBM", flush=True)

    dec = params["decoder"]
    lyr = dec["layers"]
    ckq, cks = cache.cross_k["q"], cache.cross_k["s"]   # (L,B,H,dh,T)
    cvq, cvs = cache.cross_v["q"], cache.cross_v["s"]

    # -- cross attention only (the production einsum path, per layer) ----
    q_const = jnp.asarray(rng.standard_normal((B, H, 1, dh)) * 0.1,
                          jnp.bfloat16)

    def cross_only(kq, ks, vq, vs):
        out = jnp.zeros((B, 1, D), jnp.float32)
        for l in range(L):
            cq_eff = q_const * ks[l][:, :, None, :].astype(jnp.bfloat16)
            lg = jnp.einsum("bhqd,bhdt->bhqt", cq_eff,
                            kq[l].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
            pr = jax.nn.softmax(lg, axis=-1).astype(jnp.bfloat16)
            c = jnp.einsum("bhqt,bhdt->bhqd", pr,
                           vq[l].astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            c = c * vs[l][:, :, None, :]
            out = out + c.transpose(0, 2, 1, 3).reshape(B, 1, D)
        return out.sum()

    t_cross = timeit(jax.jit(cross_only), ckq, cks, cvq, cvs)
    mb = L * 2 * B * T * D / 1e6
    print(f"cross-attn ({mb:.0f} MB): {t_cross*1e3:.3f} ms -> "
          f"{mb/1e3/t_cross/(HBM/1e9)*100:.1f}% HBM", flush=True)

    # -- self attention + qkv/o projections ------------------------------
    h_const = jnp.asarray(rng.standard_normal((B, 1, D)) * 0.1,
                          jnp.bfloat16)

    def self_only(sk, sv, layers):
        sa = layers["self"]
        out = jnp.zeros((B, 1, D), jnp.float32)
        mask = (jnp.arange(S) < P + 3)[None, None, None, :]
        for l in range(L):
            w = sa["qkv_w"]
            qkv = (h_const @ w["q"][l].astype(jnp.bfloat16)
                   * w["s"][l].astype(jnp.bfloat16) + sa["qkv_b"][l])
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(B, 1, H, dh).transpose(0, 2, 1, 3)
            lg = jnp.einsum("bhqd,bhds->bhqs", q * dh ** -0.5,
                            sk[l].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
            lg = jnp.where(mask, lg, -1e9)
            pr = jax.nn.softmax(lg, axis=-1).astype(jnp.bfloat16)
            c = jnp.einsum("bhqs,bhds->bhqd", pr,
                           sv[l].astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            c = c.transpose(0, 2, 1, 3).reshape(B, 1, D).astype(jnp.bfloat16)
            ow = sa["o_w"]
            out = out + (c @ ow["q"][l].astype(jnp.bfloat16)
                         * ow["s"][l].astype(jnp.bfloat16))
        return out.sum()

    t_self = timeit(jax.jit(self_only), cache.self_k, cache.self_v, lyr)
    mb_s = (L * 2 * B * S * D * 2 + L * (3 * D * D + D * D)) / 1e6
    print(f"self-attn+proj ({mb_s:.0f} MB): {t_self*1e3:.3f} ms -> "
          f"{mb_s/1e3/t_self/(HBM/1e9)*100:.1f}% HBM", flush=True)

    # -- MLP --------------------------------------------------------------
    def mlp_only(layers):
        m = layers["mlp"]
        out = jnp.zeros((B, 1, D), jnp.float32)
        for l in range(L):
            h1 = (h_const @ m["fc1_w"]["q"][l].astype(jnp.bfloat16)
                  * m["fc1_w"]["s"][l].astype(jnp.bfloat16) + m["fc1_b"][l])
            h1 = jax.nn.gelu(h1.astype(jnp.bfloat16))
            out = out + (h1 @ m["fc2_w"]["q"][l].astype(jnp.bfloat16)
                         * m["fc2_w"]["s"][l].astype(jnp.bfloat16))
        return out.sum()

    t_mlp = timeit(jax.jit(mlp_only), lyr)
    mb_m = L * 2 * D * F / 1e6
    print(f"mlp ({mb_m:.0f} MB): {t_mlp*1e3:.3f} ms -> "
          f"{mb_m/1e3/t_mlp/(HBM/1e9)*100:.1f}% HBM", flush=True)

    # -- logits ------------------------------------------------------------
    def logits_only(d):
        e = d["token_emb"]
        raw = jnp.einsum("bsd,vd->bsv", h_const,
                         e["q"].astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return (raw * e["s"][None, None, :]).sum()

    t_lg = timeit(jax.jit(logits_only), dec)
    mb_l = V * D / 1e6
    print(f"logits ({mb_l:.0f} MB): {t_lg*1e3:.3f} ms -> "
          f"{mb_l/1e3/t_lg/(HBM/1e9)*100:.1f}% HBM", flush=True)

    t_sum = t_cross + t_self + t_mlp + t_lg
    print(f"sum of phases {t_sum*1e3:.3f} ms vs full {t_full*1e3:.3f} "
          f"-> boundary/other {max(t_full-t_sum, 0)*1e3:.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()

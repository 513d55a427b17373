"""Phase attribution of the bs=32 decode step (VERDICT r4 #4).

The measured bs=32 step (1.5 ms) reads ~705 MB -> 57% of the 819 GB/s
HBM peak while tools/gemv_chain_probe.py demonstrated 89% is reachable
with boundary-free weight streaming. Byte budget (utils/flops.py,
turbo, cache 84, t_enc 1500, bs 32):

    cross-KV int8  492 MB   (70%)  <- the lever, if any
    weights  int8   92 MB
    embedding int8  66 MB
    self-cache bf16 55 MB

Each phase is timed as a lax.fori_loop of N iterations inside ONE jit
(N=4 vs N=12 differential cancels the ~25 ms tunnel RTT and dispatch;
a data-dependent carry defeats CSE/loop hoisting — CLAUDE.md: eager
postludes and per-call timing both produce garbage on the tunnel).

Run on an idle real TPU: python tools/bs32_step_probe.py
"""

import dataclasses
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

HBM = 819e9


def loop_ms(body, ops, n_lo=4, n_hi=12, iters=8, init=None):
    """Per-iteration ms of ``body(carry, ops) -> carry`` via N-differential.

    ``ops`` (a pytree of device arrays) is passed as a jit ARGUMENT —
    closing over it would embed ~700 MB of constants in the program and
    blow up the axon remote-compile request (HTTP 413). The carry must
    be FETCHED (``float``), not block_until_ready'd: the axon tunnel
    returns from block_until_ready without a device round trip. And the
    body must fold the FULL output into the carry (``.sum()``, never
    ``out[0, 0]`` — XLA slices a [0,0] read back through the matmuls
    and times a bs=1 shred of the graph; CLAUDE.md)."""

    def run(n):
        def f(c, o):
            return jax.lax.fori_loop(0, n, lambda i, cc: body(cc, o), c)

        f = jax.jit(f)
        c0 = init if init is not None else jnp.float32(0.0)

        def call():
            out = f(c0, ops)
            # Fetch ONLY the scalar leaf: forces execution without
            # pulling a whole KV cache back through the tunnel.
            return float(jax.tree.leaves(out)[0])

        call()                                  # compile
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            call()
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts)

    lo_fn_t = run(n_lo)
    hi_fn_t = run(n_hi)
    return (hi_fn_t - lo_fn_t) / (n_hi - n_lo) * 1e3


def main() -> None:
    from thewhisper_tpu.config import ARCH_PRESETS
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

    bf16, f32 = jnp.bfloat16, jnp.float32

    # -- full production step (cache threads through the carry so the
    #    KV write stays live; token perturbed by the scalar) ---------------
    def full_body(cc, o):
        c, ca = cc
        tok = (jnp.ones((B, 1), jnp.int32)
               + (c > 1e30).astype(jnp.int32))
        lg, ca2, _ = decoder_step(o, tok, jnp.int32(P + 3), ca, arch, bf16)
        return c + lg.sum().astype(jnp.float32) * 1e-30, ca2

    t_full = loop_ms(full_body, params, init=(jnp.float32(0.0), cache))
    print(f"full step: {t_full:.3f} ms -> "
          f"{705 / t_full / (HBM / 1e9) * 100:.1f}% HBM", flush=True)

    dec = params["decoder"]
    lyr = dec["layers"]
    ckq, cks = cache.cross_k["q"], cache.cross_k["s"]   # (L,B,H,dh,T)
    cvq, cvs = cache.cross_v["q"], cache.cross_v["s"]
    q_const = jnp.asarray(rng.standard_normal((B, H, 1, dh)) * 0.1, bf16)
    h_const = jnp.asarray(rng.standard_normal((B, 1, D)) * 0.1, bf16)

    # -- cross attention (production einsum path, per layer) ---------------
    def cross_body(c, o):
        q0, kq, ks, vq, vs = o
        q = q0 + (c * 1e-30).astype(bf16)
        acc = jnp.float32(0.0)
        for l in range(L):
            cq_eff = q * ks[l][:, :, None, :].astype(bf16)
            lg = jnp.einsum("bhqd,bhdt->bhqt", cq_eff, kq[l].astype(bf16),
                            preferred_element_type=f32)
            pr = jax.nn.softmax(lg, axis=-1).astype(bf16)
            ctx = jnp.einsum("bhqt,bhdt->bhqd", pr, vq[l].astype(bf16),
                             preferred_element_type=f32)
            acc = acc + (ctx * vs[l][:, :, None, :]).sum()
        return c + acc * 1e-30

    mb = L * 2 * B * T * D / 1e6
    t_cross = loop_ms(cross_body, (q_const, ckq, cks, cvq, cvs), n_hi=16)
    print(f"cross-attn ({mb:.0f} MB): {t_cross:.3f} ms -> "
          f"{mb / t_cross / (HBM / 1e9) * 100:.1f}% HBM", flush=True)

    # -- self attention + qkv/o projections ---------------------------------
    sk, sv = cache.self_k, cache.self_v

    def self_body(c, o):
        h0, sa, sk, sv = o
        h = h0 + (c * 1e-30).astype(bf16)
        acc = jnp.float32(0.0)
        mask = (jnp.arange(S) < P + 3)[None, None, None, :]
        for l in range(L):
            w = sa["qkv_w"]
            qkv = (h @ w["q"][l].astype(bf16) * w["s"][l].astype(bf16)
                   + sa["qkv_b"][l])
            q, _, _ = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(B, 1, H, dh).transpose(0, 2, 1, 3)
            lg = jnp.einsum("bhqd,bhds->bhqs", q * dh ** -0.5,
                            sk[l].astype(bf16), preferred_element_type=f32)
            lg = jnp.where(mask, lg, -1e9)
            pr = jax.nn.softmax(lg, axis=-1).astype(bf16)
            ctx = jnp.einsum("bhqs,bhds->bhqd", pr, sv[l].astype(bf16),
                             preferred_element_type=f32)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(B, 1, D).astype(bf16)
            ow = sa["o_w"]
            acc = acc + (ctx @ ow["q"][l].astype(bf16)
                         * ow["s"][l].astype(bf16)).sum()
        return c + acc * 1e-30

    mb_s = (L * 2 * B * S * D * 2 + L * (3 * D * D + D * D)) / 1e6
    t_self = loop_ms(self_body, (h_const, lyr["self"], sk, sv), n_hi=32)
    print(f"self-attn+proj ({mb_s:.0f} MB): {t_self:.3f} ms -> "
          f"{mb_s / t_self / (HBM / 1e9) * 100:.1f}% HBM", flush=True)

    # -- self attention + the real step's where-iota cache WRITE ------------
    # The write pass (_stack_step: where(iota==pos, new, cache) on both
    # 27.5 MB buffers) reads + rewrites the whole self cache after the
    # attention scan already consumed it: ~110 MB of traffic per step on
    # top of the 55 MB attention read. This arm carries the caches
    # through the loop so the write stays live; minus self_body = the
    # marginal write cost.
    def self_write_body(cc, o):
        c, csk, csv = cc
        h0, sa = o
        h = h0 + (c * 1e-30).astype(bf16)
        acc = jnp.float32(0.0)
        mask = (jnp.arange(S) < P + 3)[None, None, None, :]
        slot = (jnp.arange(S) == P + 3)[None, None, None, None, :]
        for l in range(L):
            w = sa["qkv_w"]
            qkv = (h @ w["q"][l].astype(bf16) * w["s"][l].astype(bf16)
                   + sa["qkv_b"][l])
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(B, 1, H, dh).transpose(0, 2, 1, 3)
            lg = jnp.einsum("bhqd,bhds->bhqs", q * dh ** -0.5,
                            csk[l].astype(bf16), preferred_element_type=f32)
            lg = jnp.where(mask, lg, -1e9)
            pr = jax.nn.softmax(lg, axis=-1).astype(bf16)
            ctx = jnp.einsum("bhqs,bhds->bhqd", pr, csv[l].astype(bf16),
                             preferred_element_type=f32)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(B, 1, D).astype(bf16)
            ow = sa["o_w"]
            acc = acc + (ctx @ ow["q"][l].astype(bf16)
                         * ow["s"][l].astype(bf16)).sum()
        k_new = jnp.zeros((L, B, H, dh, 1), csk.dtype) + (
            acc * 1e-30).astype(csk.dtype)
        csk = jnp.where(slot, k_new, csk)
        csv = jnp.where(slot, k_new, csv)
        return c + acc * 1e-30, csk, csv

    t_sw = loop_ms(self_write_body, (h_const, lyr["self"]), n_hi=16,
                   init=(jnp.float32(0.0), sk, sv))
    mb_w = 2 * L * 2 * B * S * dh * H * 2 / 1e6
    print(f"self-attn+proj+WRITE: {t_sw:.3f} ms -> write pass "
          f"{t_sw - t_self:.3f} ms for ~{mb_w:.0f} MB rw "
          f"({mb_w / max(t_sw - t_self, 1e-9) / (HBM / 1e9) * 100:.1f}% HBM)",
          flush=True)

    # -- ring-buffer alternative: tiny 8-slot side cache, splice every 8 ----
    # Write each step's K/V into an (L,B,H,dh,8) ring (16 MB rw), give
    # attention an extra 8-slot segment, and merge into the big cache
    # once per 8 steps (the 110 MB pass, amortized 8x).
    W8 = 8

    def ring_body(cc, o):
        c, csk, csv, rk, rv, i = cc
        h0, sa = o
        h = h0 + (c * 1e-30).astype(bf16)
        acc = jnp.float32(0.0)
        mask = (jnp.arange(S) < P + 3)[None, None, None, :]
        rmask = (jnp.arange(W8) <= (i % W8))[None, None, None, :]
        rk_n, rv_n = rk, rv
        for l in range(L):
            w = sa["qkv_w"]
            qkv = (h @ w["q"][l].astype(bf16) * w["s"][l].astype(bf16)
                   + sa["qkv_b"][l])
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(B, 1, H, dh).transpose(0, 2, 1, 3)
            lg = jnp.einsum("bhqd,bhds->bhqs", q * dh ** -0.5,
                            csk[l].astype(bf16), preferred_element_type=f32)
            lg = jnp.where(mask, lg, -1e9)
            lg2 = jnp.einsum("bhqd,bhds->bhqs", q * dh ** -0.5,
                             rk[l].astype(bf16), preferred_element_type=f32)
            lg2 = jnp.where(rmask, lg2, -1e9)
            lgc = jnp.concatenate([lg, lg2], axis=-1)
            pr = jax.nn.softmax(lgc, axis=-1).astype(bf16)
            ctx = (jnp.einsum("bhqs,bhds->bhqd", pr[..., :S],
                              csv[l].astype(bf16),
                              preferred_element_type=f32)
                   + jnp.einsum("bhqs,bhds->bhqd", pr[..., S:],
                                rv[l].astype(bf16),
                                preferred_element_type=f32))
            ctx = ctx.transpose(0, 2, 1, 3).reshape(B, 1, D).astype(bf16)
            ow = sa["o_w"]
            acc = acc + (ctx @ ow["q"][l].astype(bf16)
                         * ow["s"][l].astype(bf16)).sum()
        k_new = jnp.zeros((L, B, H, dh, 1), rk.dtype) + (
            acc * 1e-30).astype(rk.dtype)
        rslot = (jnp.arange(W8) == (i % W8))[None, None, None, None, :]
        rk_n = jnp.where(rslot, k_new, rk)
        rv_n = jnp.where(rslot, k_new, rv)

        def splice(args):
            csk, csv, rk_n, rv_n = args
            base = P + 3  # probe: fixed splice window (cost model only)
            span = (jnp.arange(S) >= base) & (jnp.arange(S) < base + W8)
            idx = jnp.clip(jnp.arange(S) - base, 0, W8 - 1)
            csk2 = jnp.where(span[None, None, None, None, :],
                             rk_n[..., idx], csk)
            csv2 = jnp.where(span[None, None, None, None, :],
                             rv_n[..., idx], csv)
            return csk2, csv2

        csk, csv = jax.lax.cond(
            i % W8 == W8 - 1, splice, lambda a: (a[0], a[1]),
            (csk, csv, rk_n, rv_n))
        return c + acc * 1e-30, csk, csv, rk_n, rv_n, i + 1

    ring0 = jnp.zeros((L, B, H, dh, W8), sk.dtype)
    t_ring = loop_ms(ring_body, (h_const, lyr["self"]), n_hi=16,
                     init=(jnp.float32(0.0), sk, sv, ring0, ring0,
                           jnp.int32(0)))
    print(f"self-attn+proj+RING8: {t_ring:.3f} ms "
          f"(vs write {t_sw:.3f}; saves {t_sw - t_ring:.3f} ms/step)",
          flush=True)

    # -- MLP -----------------------------------------------------------------
    def mlp_body(c, o):
        h0, m = o
        h = h0 + (c * 1e-30).astype(bf16)
        acc = jnp.float32(0.0)
        for l in range(L):
            h1 = (h @ m["fc1_w"]["q"][l].astype(bf16)
                  * m["fc1_w"]["s"][l].astype(bf16) + m["fc1_b"][l])
            h1 = jax.nn.gelu(h1.astype(bf16))
            acc = acc + (h1 @ m["fc2_w"]["q"][l].astype(bf16)
                         * m["fc2_w"]["s"][l].astype(bf16)).sum()
        return c + acc * 1e-30

    mb_m = L * 2 * D * F / 1e6
    t_mlp = loop_ms(mlp_body, (h_const, lyr["mlp"]), n_hi=32)
    print(f"mlp ({mb_m:.0f} MB): {t_mlp:.3f} ms -> "
          f"{mb_m / t_mlp / (HBM / 1e9) * 100:.1f}% HBM", flush=True)

    # -- logits ---------------------------------------------------------------
    def logits_body(c, o):
        h0, e = o
        h = h0 + (c * 1e-30).astype(bf16)
        raw = jnp.einsum("bsd,vd->bsv", h, e["q"].astype(bf16),
                         preferred_element_type=f32)
        # Square before the fold: sum(h @ E^T * s) factors into
        # h @ (s @ E) and the 66 MB read hoists out of the loop.
        return c + jnp.square(raw * e["s"][None, None, :]).sum() * 1e-30

    mb_l = V * D / 1e6
    # The 66 MB read is ~0.08 ms/iter: needs the widest N span of all
    # the phases to clear the ~±0.5 ms tunnel call noise.
    t_lg = loop_ms(logits_body, (h_const, dec["token_emb"]), n_hi=64)
    print(f"logits ({mb_l:.0f} MB): {t_lg:.3f} ms -> "
          f"{mb_l / t_lg / (HBM / 1e9) * 100:.1f}% HBM", flush=True)

    t_sum = t_cross + t_self + t_mlp + t_lg
    print(f"sum of phases {t_sum:.3f} ms vs full {t_full:.3f} "
          f"-> boundary/other {t_full - t_sum:.3f} ms", flush=True)


if __name__ == "__main__":
    main()

"""In-situ cost of the bs=32 self-cache write, and the ring-8 alternative.

tools/bs32_step_probe.py attributed the bs=32 turbo step (VERDICT r4 #4):
cross-attn / MLP / logits each run AT or ABOVE the nominal 819 GB/s HBM
peak under XLA (the >100% readings are loop-hoisted scales, not errors),
leaving ~0.46 ms/step of "boundary/other". Its write-pass arm measured
NEGATIVE (-0.42 ms) — under-resolved: that arm's N-span was 12 while the
per-call tunnel noise is ~±0.5 ms. This probe re-asks only the write
question, with three FULL-step arms interleaved in one window:

  A) production ``decoder_step`` (where-iota single-slot write: reads +
     rewrites both (L,B,H,dh,S) self caches, ~110 MB rw at turbo bs=32)
  B) the same step with the write DISCARDED (cache carried unchanged —
     XLA dead-code-eliminates the write pass; attention still reads it)
  C) a ring-8 step: fresh K/V go to an (L,B,H,dh,8) side ring (~4 MB rw),
     attention reads cache ⊕ ring ⊕ fresh, and the big caches are spliced
     once every 8 steps (the 110 MB pass, amortized 8x)

A − B = the write's true in-situ cost; A − C = what a production ring
would save. All arms fold the full logits into a scalar carry, pass
operands as jit args (a closed-over cross-KV embeds ~500 MB of constants
in the program and 413s the axon remote-compile), and fetch only the
scalar (block_until_ready returns without a tunnel round trip here —
CLAUDE.md). N-differential per arm (lo=4, hi=24) cancels dispatch + RTT.

Run on an idle real TPU: python tools/bs32_write_probe.py
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
W8 = 8


def main() -> None:
    from thewhisper_tpu.config import ARCH_PRESETS
    from thewhisper_tpu.models.quant import quantize_kv, quantize_params
    from thewhisper_tpu.models.whisper import (
        _alignment_selector,
        _cross_and_mlp,
        _embed_tokens,
        _layer_norm,
        _logits,
        _self_qkv,
        _split_heads,
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
    H = arch.decoder_heads
    bf16, f32 = jnp.bfloat16, jnp.float32

    print("init params on device...", flush=True)
    params = fuse_self_qkv_params(quantize_params(
        init_params_device(arch, seed=0, dtype=bf16),
        components=("decoder",)))
    rng = np.random.default_rng(0)
    enc = jnp.asarray(rng.standard_normal((B, T, arch.d_model)) * 0.1, bf16)
    ck, cv = jax.jit(compute_cross_kv, static_argnums=2)(params, enc, arch)
    cache = make_cache(arch, B, S, quantize_kv(ck), quantize_kv(cv),
                       dtype=bf16)
    prompt = jnp.tile(jnp.asarray([[1, 2, 3, 4]], jnp.int32), (B, 1))
    _, cache, _ = jax.jit(decoder_prefill, static_argnums=(3, 4))(
        params, prompt, cache, arch, bf16)
    base = P + 3          # ring window starts here; mask below is static
    align_sel = jnp.asarray(_alignment_selector(arch))

    # --- arm bodies (carry, params) -> carry --------------------------------

    def body_write(cc, o):
        c, ca = cc
        tok = jnp.ones((B, 1), jnp.int32) + (c > 1e30).astype(jnp.int32)
        lg, ca2, _ = decoder_step(o, tok, jnp.int32(base), ca, arch, bf16)
        return c + lg.sum().astype(f32) * 1e-30, ca2

    def body_nowrite(cc, o):
        c, ca = cc
        tok = jnp.ones((B, 1), jnp.int32) + (c > 1e30).astype(jnp.int32)
        lg, _, _ = decoder_step(o, tok, jnp.int32(base), ca, arch, bf16)
        return c + lg.sum().astype(f32) * 1e-30, ca

    def ring_step(o, tok, i, ca, rk, rv):
        """decoder_step with the single-slot write routed to an 8-ring."""
        dec = o["decoder"]
        x = _embed_tokens(dec, tok, jnp.int32(base), bf16)
        mask_c = (jnp.arange(S) < base)[None, None, None, :]
        mask_r = (jnp.arange(W8) < (i % W8))[None, None, None, :]

        def layer(carry, xs):
            h = carry
            lp, cross_k, cross_v, self_k, self_v, ring_k, ring_v = xs
            q_in = _layer_norm(h, lp["ln1"]["scale"], lp["ln1"]["bias"])
            q_p, k_p, v_p = _self_qkv(q_in, lp["self"])
            q = jnp.transpose(_split_heads(q_p, H), (0, 2, 1, 3))
            k = jnp.transpose(_split_heads(k_p, H), (0, 2, 1, 3))
            v = jnp.transpose(_split_heads(v_p, H), (0, 2, 1, 3))
            dh = q.shape[-1]
            qs = (q * dh ** -0.5).astype(f32)
            lg_f = jnp.sum(qs * k.astype(f32), axis=-1, keepdims=True)
            lg_c = jnp.einsum("bhqd,bhds->bhqs", q * dh ** -0.5,
                              self_k.astype(q.dtype),
                              preferred_element_type=f32)
            lg_c = jnp.where(mask_c, lg_c, -1e9)
            lg_r = jnp.einsum("bhqd,bhds->bhqs", q * dh ** -0.5,
                              ring_k.astype(q.dtype),
                              preferred_element_type=f32)
            lg_r = jnp.where(mask_r, lg_r, -1e9)
            pr = jax.nn.softmax(
                jnp.concatenate([lg_c, lg_r, lg_f], axis=-1), axis=-1)
            ctx = (jnp.einsum("bhqs,bhds->bhqd", pr[..., :S].astype(bf16),
                              self_v.astype(bf16),
                              preferred_element_type=f32)
                   + jnp.einsum("bhqs,bhds->bhqd",
                                pr[..., S:S + W8].astype(bf16),
                                ring_v.astype(bf16),
                                preferred_element_type=f32)
                   + pr[..., S + W8:].astype(f32) * v.astype(f32))
            ctx = jnp.transpose(ctx, (0, 2, 1, 3)).reshape(B, 1, -1)
            ow = lp["self"]["o_w"]
            h = h + (ctx.astype(bf16) @ ow["q"].astype(bf16)
                     * ow["s"].astype(bf16) + lp["self"]["o_b"])
            h, _ = _cross_and_mlp(h, lp, H, cross_k, cross_v,
                                  lp["_align_sel"])
            return h, (jnp.transpose(k, (0, 1, 3, 2)).astype(self_k.dtype),
                       jnp.transpose(v, (0, 1, 3, 2)).astype(self_v.dtype))

        layers = dict(dec["layers"])
        layers["_align_sel"] = align_sel            # (L, H, A), scanned
        xs = (layers, ca.cross_k, ca.cross_v, ca.self_k, ca.self_v, rk, rv)
        x, (k_new, v_new) = jax.lax.scan(layer, x, xs, unroll=1)
        rslot = (jnp.arange(W8) == (i % W8))[None, None, None, None, :]
        rk2 = jnp.where(rslot, k_new, rk)
        rv2 = jnp.where(rslot, v_new, rv)

        def splice(args):
            sk, sv, rk2, rv2 = args
            span = ((jnp.arange(S) >= base)
                    & (jnp.arange(S) < base + W8))[None, None, None, None, :]
            idx = jnp.clip(jnp.arange(S) - base, 0, W8 - 1)
            return (jnp.where(span, rk2[..., idx], sk),
                    jnp.where(span, rv2[..., idx], sv))

        sk2, sv2 = jax.lax.cond(
            i % W8 == W8 - 1, splice, lambda a: (a[0], a[1]),
            (ca.self_k, ca.self_v, rk2, rv2))
        ca2 = ca._replace(self_k=sk2, self_v=sv2)
        x = _layer_norm(x, dec["ln_post"]["scale"], dec["ln_post"]["bias"])
        return _logits(dec, x)[:, 0], ca2, rk2, rv2

    def body_ring(cc, o):
        c, ca, rk, rv, i = cc
        tok = jnp.ones((B, 1), jnp.int32) + (c > 1e30).astype(jnp.int32)
        lg, ca2, rk2, rv2 = ring_step(o, tok, i, ca, rk, rv)
        return c + lg.sum().astype(f32) * 1e-30, ca2, rk2, rv2, i + 1

    ring0 = jnp.zeros((arch.decoder_layers, B, H,
                       arch.d_model // H, W8), cache.self_k.dtype)
    inits = {
        "A:write": (body_write, (jnp.float32(0.0), cache)),
        "B:no-write": (body_nowrite, (jnp.float32(0.0), cache)),
        "C:ring8": (body_ring, (jnp.float32(0.0), cache, ring0, ring0,
                                jnp.int32(0))),
    }

    # --- interleaved N-differential -----------------------------------------
    n_lo, n_hi, rounds = 4, 24, 10
    calls = {}
    for name, (body, init) in inits.items():
        for n in (n_lo, n_hi):
            def make(body=body, init=init, n=n):
                fn = jax.jit(lambda c, o: jax.lax.fori_loop(
                    0, n, lambda i, cc: body(cc, o), c))

                def call():
                    return float(jax.tree.leaves(fn(init, params))[0])
                return call
            calls[(name, n)] = make()
    for k, call in calls.items():
        print(f"compile {k}...", flush=True)
        call()
    samples = {k: [] for k in calls}
    for _ in range(rounds):
        for k, call in calls.items():
            t0 = time.perf_counter()
            call()
            samples[k].append(time.perf_counter() - t0)
    res = {}
    for name in inits:
        lo = statistics.median(samples[(name, n_lo)])
        hi = statistics.median(samples[(name, n_hi)])
        res[name] = (hi - lo) / (n_hi - n_lo) * 1e3
        print(f"{name}: {res[name]:.3f} ms/step", flush=True)
    d_ab = res["A:write"] - res["B:no-write"]
    d_ac = res["A:write"] - res["C:ring8"]
    print(f"write cost in situ (A-B): {d_ab:.3f} ms; "
          f"ring saves (A-C): {d_ac:.3f} ms", flush=True)


if __name__ == "__main__":
    main()

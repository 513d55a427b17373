"""Encoder component breakdown at bs=32 x 30 s (the offline RTFx fixed cost).

Times isolated pieces of the encoder against their v5e rooflines to find
where the non-MXU time goes:

- conv stem alone (conv1+gelu+conv2+gelu+pos)
- attention-only layer stack (ln1 + mha, no MLP)
- mlp-only layer stack (ln2 + mlp, no attention)
- full encoder

Roofline arithmetic (v5e: 197 TFLOP/s bf16, ~819 GB/s HBM), S=1536 padded:
  per layer per sample: QKVO 4*S*d^2*2 = 20.1 GF, attn 2*S^2*d*2 = 12.1 GF
  (MXU half-utilized at dh=64 -> ~2x cost), MLP 2*S*d*4d*2 = 40.3 GF.
Run on the real TPU with an idle host.
"""

import dataclasses
import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from thewhisper_tpu.config import ARCH_PRESETS
    from thewhisper_tpu.models import whisper as W

    log(f"backend={jax.default_backend()}")
    arch = dataclasses.replace(ARCH_PRESETS["large-v3-turbo"])
    dt = jnp.bfloat16
    log("init encoder params (bf16)...")
    t0 = time.time()
    params = W.init_params(arch, seed=0, dtype=dt)
    enc = params["encoder"]
    mel = jax.device_put(jnp.asarray(
        (0.1 * np.random.default_rng(0).standard_normal((32, 128, 3000))
         ).astype(np.float32)))
    # Post-stem activation shape: (32, 1536, 1280) padded to flash multiple.
    x0 = jax.device_put(jnp.asarray(
        (0.1 * np.random.default_rng(1).standard_normal((32, 1536, 1280))
         ).astype(np.float32)).astype(dt))
    log(f"  ready in {time.time() - t0:.0f}s")
    n_heads = arch.encoder_heads
    valid_len = 1500

    @jax.jit
    def conv_stem(mel):
        x = mel.astype(dt)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, enc["conv1"]["w"].shape, ("NCH", "OIH", "NCH"))
        x = jax.lax.conv_general_dilated(
            x, enc["conv1"]["w"].astype(dt), (1,), [(1, 1)],
            dimension_numbers=dn, preferred_element_type=jnp.float32,
        ).astype(dt) + enc["conv1"]["b"].astype(dt)[None, :, None]
        x = W._gelu(x)
        dn2 = jax.lax.conv_dimension_numbers(
            x.shape, enc["conv2"]["w"].shape, ("NCH", "OIH", "NCH"))
        x = jax.lax.conv_general_dilated(
            x, enc["conv2"]["w"].astype(dt), (2,), [(1, 1)],
            dimension_numbers=dn2, preferred_element_type=jnp.float32,
        ).astype(dt) + enc["conv2"]["b"].astype(dt)[None, :, None]
        x = W._gelu(x)
        x = jnp.transpose(x, (0, 2, 1))
        return x + enc["pos_emb"][: x.shape[1]].astype(dt)

    @jax.jit
    def attn_stack(layers, x):
        def layer(h, lp):
            a_in = W._layer_norm(h, lp["ln1"]["scale"], lp["ln1"]["bias"])
            a, _ = W._mha(a_in, a_in, lp["attn"], n_heads, valid_len=valid_len)
            return h + a, None
        x, _ = jax.lax.scan(layer, x, layers)
        return x

    @jax.jit
    def mlp_stack(layers, x):
        def layer(h, lp):
            m = W._mlp(W._layer_norm(
                h, lp["ln2"]["scale"], lp["ln2"]["bias"]), lp["mlp"])
            return h + m, None
        x, _ = jax.lax.scan(layer, x, layers)
        return x

    @jax.jit
    def qkvo_only(layers, x):
        """The four projections without the attention core."""
        def layer(h, lp):
            a_in = W._layer_norm(h, lp["ln1"]["scale"], lp["ln1"]["bias"])
            p = lp["attn"]
            q = W._linear(a_in, p["q_w"], p["q_b"])
            k = W._linear(a_in, p["k_w"], None)
            v = W._linear(a_in, p["v_w"], p["v_b"])
            o = W._linear(q * k * v, p["o_w"], p["o_b"])
            return h + o, None
        x, _ = jax.lax.scan(layer, x, layers)
        return x

    @jax.jit
    def full(params, mel):
        return W.encoder_forward.__wrapped__(params, mel, arch, dt)

    def bench(name, fn, *args):
        def run():
            return float(jnp.mean(fn(*args).astype(jnp.float32)))
        log(f"[{name}] compiling...")
        t0 = time.time()
        run()
        log(f"  compiled+first in {time.time() - t0:.0f}s")
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        ms = statistics.median(ts) * 1e3
        log(f"[{name}] {ms:.1f} ms (min {min(ts)*1e3:.1f})")
        return round(ms, 1)

    out = {}
    layers = enc["layers"]
    out["attn_stack32"] = bench("attn_stack32", attn_stack, layers, x0)
    out["qkvo_only32"] = bench("qkvo_only32", qkvo_only, layers, x0)
    out["mlp_stack32"] = bench("mlp_stack32", mlp_stack, layers, x0)
    out["full_encoder"] = bench("full_encoder", full, params, mel)
    # Rooflines (ms) at 197 TFLOP/s, bs=32, S=1536 incl. 2.4% pad waste.
    out["roofline_ms"] = {
        "qkvo": round(4 * 1536 * 1280**2 * 2 * 32 * 32 / 197e12 * 1e3, 0),
        "attn_mxu_half": round(2 * 1536**2 * 1280 * 2 * 32 * 32 / (197e12 / 2) * 1e3, 0),
        "mlp": round(2 * 1536 * 1280 * 5120 * 2 * 32 * 32 / 197e12 * 1e3, 0),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

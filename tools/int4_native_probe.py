"""Native jnp.int4 decode at bs=1, now measurable via on-device params.

Round 2 dropped int4 for two reasons (tools/int4_pack_probe.py,
benchmark/README.md): native ``jnp.int4`` hit a plugin RecursionError
when TRANSFERRED through the axon tunnel, and host-side nibble packing
with in-graph unpack measured slower than int8. ``init_params_device``
+ the device path in ``quantize_params`` sidestep the transfer entirely
— int4 buffers are created ON the device and only tokens come back —
so the native-int4 question (does XLA's packed S4 HBM layout halve the
weight-bandwidth of the GEMV-bound decode step?) is finally measurable.

Method: decoder-only params on device, int8 vs int4 decoder_step timed
INTERLEAVED (tunnel drift lesson), differential N-vs-3N step loops with
the output reduced inside the jitted loop. bs=1 decode reads ~171 MB
int8 per step; a true packed-int4 path reads ~86 MB -> up to ~2x on the
bandwidth-bound fraction.

MEASURED (v5e, 2026-08-18): passing S4 arrays as jit ARGUMENTS still
RecursionErrors in the axon plugin even when they were created on
device (the dispatch-layout path re-enters jit) — so the int4 variants
quantize IN-PROGRAM from the bf16 base: the S4 tensors are born inside
the executable, live as loop invariants, and the one-time quantize
cancels in the N-vs-3N differential. The ``int8-inprog`` control
validates the methodology (it must match the int8-by-argument number;
if XLA's while-loop invariant code motion hoisted the dequant out of
the loop body, inprog variants would read dequantized bf16 instead and
the control would blow up to bf16 speed).

Usage: python tools/int4_native_probe.py [--steps 64] [--reps 4]
       [--arch large-v3-turbo|large-v3] [--batch 1]
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
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--arch", default="large-v3-turbo")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--try-args", action="store_true",
                    help="also attempt the int4/int4+emb4 BY-ARGUMENT "
                    "variants (known to RecursionError in the axon "
                    "plugin — two wasted compile attempts per run; "
                    "int8-by-argument stays the default boundary-"
                    "crossing baseline)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from thewhisper_tpu.config import ARCH_PRESETS
    from thewhisper_tpu.models.quant import quantize_params, quantized_bytes
    from thewhisper_tpu.models.whisper import (
        compute_cross_kv,
        decoder_prefill,
        decoder_step,
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
    base = {"decoder": init_params_device(arch, seed=0, dtype=dt)["decoder"]}
    p8 = quantize_params(base, components=("decoder",))
    p4 = quantize_params(base, components=("decoder",), bits=4)
    # int4 table too: the tied logits matmul reads the FULL (V, d) table
    # every step — the single biggest per-token HBM read.
    from thewhisper_tpu.models.quant import quantize_embedding
    p4e = {"decoder": dict(p4["decoder"])}
    p4e["decoder"]["token_emb"] = quantize_embedding(
        base["decoder"]["token_emb"], bits=4)
    jax.tree.map(lambda x: x.block_until_ready(), (p8, p4, p4e))
    log(f"device init+quant in {time.time() - t0:.0f}s; decoder bytes: "
        f"int8 {quantized_bytes(p8['decoder']) / 2**20:.0f} MiB, "
        f"int4 {quantized_bytes(p4['decoder']) / 2**20:.0f} MiB, "
        f"int4+emb4 {quantized_bytes(p4e['decoder']) / 2**20:.0f} MiB")

    # Synthetic encoder states -> cross KV -> prefill -> step loop.
    rng = jax.random.PRNGKey(0)
    enc = (0.02 * jax.random.normal(
        rng, (B, arch.max_source_positions, arch.d_model), jnp.float32)
    ).astype(dt)
    s_cap = 8 + args.steps * 3 + 1

    def make_loop(params, n_steps, prequant=None):
        prompt = jnp.full((B, 4), 50258, jnp.int32)

        def run(params):
            # In-program variants: quantize INSIDE the executable (S4
            # cannot cross the jit boundary on this plugin). One-time
            # cost; cancels in the N-vs-3N differential.
            if prequant is not None:
                params = prequant(params)
            ck, cv = compute_cross_kv(params, enc, arch)
            cache = make_cache(arch, B, s_cap, ck, cv, dtype=dt)
            logits, c, _ = decoder_prefill(params, prompt, cache, arch, dt)
            tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)

            def body(i, carry):
                tok, c, acc = carry
                # decoder_step returns logits (B, V) — already squeezed.
                lg, c, _ = decoder_step(
                    params, tok[:, None], 4 + i, c, arch, dt)
                tok = jnp.argmax(lg, -1).astype(jnp.int32)
                # Reduce INSIDE the loop: eager postludes / out[0,0]
                # carries both produced garbage numbers (CLAUDE.md).
                return tok, c, acc + jnp.sum(tok)

            tok, c, acc = jax.lax.fori_loop(
                0, n_steps, body, (tok, c, jnp.int32(0)))
            return acc

        return jax.jit(run)

    def quant_inprog(bits, emb_bits):
        def prequant(base):
            out = quantize_params(base, components=("decoder",), bits=bits,
                                  quantize_embedding_table=False)
            dec = dict(out["decoder"])
            dec["token_emb"] = quantize_embedding(
                dec["token_emb"], bits=emb_bits)
            out["decoder"] = dec
            return out
        return prequant

    N = args.steps
    variants = {}
    # The by-argument int4 variants RecursionError in the axon plugin
    # (see docstring) — skipped unless --try-args; int8-by-argument
    # remains the boundary-crossing baseline.
    by_arg = ([("int4", p4, None), ("int4+emb4", p4e, None)]
              if args.try_args else [])
    for name, p, pre in (
        ("int8", p8, None),
        *by_arg,
        ("int8-inprog", base, quant_inprog(8, 8)),     # methodology control
        ("int4-inprog", base, quant_inprog(4, 8)),
        ("int4+emb4-inprog", base, quant_inprog(4, 4)),
    ):
        try:
            fn_n = make_loop(p, N, prequant=pre)
            fn_3n = make_loop(p, 3 * N, prequant=pre)
            int(fn_n(p))
            int(fn_3n(p))
            variants[name] = (fn_n, fn_3n, p)
            log(f"  {name}: compiled")
        except Exception as e:
            log(f"  {name}: FAILED to compile/run: {e!r}")

    best = {k: float("inf") for k in variants}
    for r in range(args.reps):
        for name, (fn_n, fn_3n, p) in variants.items():
            t0 = time.perf_counter()
            int(fn_n(p))
            t1 = time.perf_counter()
            int(fn_3n(p))
            t2 = time.perf_counter()
            ms = (t2 - t1 - (t1 - t0)) / (2 * N) * 1e3
            best[name] = min(best[name], ms)
            log(f"  rep{r} {name}: {ms:.3f} ms/step (differential)")
    for name, ms in best.items():
        log(f"{name}: BEST {ms:.3f} ms/step -> {1e3 / ms:.0f} tok/s at bs={B}")
    if "int8" in best:
        for k, v in best.items():
            if k != "int8" and np.isfinite(v):
                log(f"{k} speedup vs int8: {best['int8'] / v:.2f}x")


if __name__ == "__main__":
    main()

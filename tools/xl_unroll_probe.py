"""Why is the large-v3 bs=1 step 2.9x off its bandwidth floor?

tools/xl_probe.py measured the large-v3 int8 step at 2.84 ms. The
per-step weight traffic is ~0.8 GB (32 layers x ~23 MB + the 66 MB tied
embedding), so the v5e's 820 GB/s HBM puts the floor near 1.0 ms —
turbo's step runs at ~79% of its floor, large-v3 at ~35%. Prime suspect:
the layer-scan unroll cap of 4 (8 scan iterations of overhead for the
deep decoder where turbo unrolls fully).

This probe sweeps WHISPER_DECODER_UNROLL over the large-v3 step with
params built ON DEVICE (step timing is weight-value-independent;
host init + tunnel transfer of 3.1 GB costs ~13 min we don't pay here)
and also times the bf16 step for the int8-overhead split.

Usage: python tools/xl_unroll_probe.py [--unrolls 1,4,8,16]
"""

import argparse
import dataclasses
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

N_LOOP = 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--unrolls", default="1,4,8,16")
    ap.add_argument("--arch", default="large-v3")
    args = ap.parse_args()
    unrolls = [int(u) for u in args.unrolls.split(",")]

    import jax
    import jax.numpy as jnp

    from thewhisper_tpu.config import ARCH_PRESETS
    from thewhisper_tpu.models.quant import quantize_params
    from thewhisper_tpu.models.whisper import (
        compute_cross_kv,
        decoder_prefill,
        decoder_step,
        init_params_device,
        make_cache,
    )

    log(f"backend={jax.default_backend()}")
    arch = dataclasses.replace(
        ARCH_PRESETS[args.arch], max_source_positions=500,
        alignment_heads=((1, 0), (3, 3)))
    dt = jnp.bfloat16
    t0 = time.time()
    # Decoder only: the step never touches encoder weights, and the
    # full large-v3 encoder would double the device-init footprint.
    params_bf = {"decoder": init_params_device(arch, dtype=dt)["decoder"]}
    params = quantize_params(params_bf, components=("decoder",))
    jax.tree.map(lambda x: x.block_until_ready(), params)
    log(f"device init: {time.time() - t0:.1f}s")

    enc = (jnp.arange(500 * arch.d_model, dtype=jnp.float32)
           .reshape(1, 500, arch.d_model) % 997 * 1e-4).astype(dt)
    s_cap = 4 + 160 + 5

    def setup(p_):
        ck, cv = compute_cross_kv(p_, enc, arch)
        cache = make_cache(arch, 1, s_cap, ck.astype(dt), cv.astype(dt),
                           dtype=dt)
        prompt = jnp.asarray([[50258, 50259, 50360, 50364]], jnp.int32)
        _, cache, _ = decoder_prefill(p_, prompt, cache, arch, dt)
        return cache

    tok = jnp.asarray([[1000]], jnp.int32)

    def make_steps(p_ref, n):
        def run(p_, c0):
            def body(i, carry):
                c, acc = carry
                logits, nc, _ = decoder_step(
                    p_, tok, jnp.int32(4) + (i % 64), c, arch, dt)
                return nc, acc + jnp.sum(logits)
            _, acc = jax.lax.fori_loop(0, n, body, (c0, jnp.float32(0)))
            return acc
        return run

    def bench(fn, *a, iters=6):
        r = fn(*a)
        r.block_until_ready()
        ts = []
        for _ in range(iters):
            t1 = time.perf_counter()
            fn(*a).block_until_ready()
            ts.append(time.perf_counter() - t1)
        return statistics.median(ts)

    for name, p_ in (("int8", params), ("bf16", params_bf)):
        cache = jax.jit(setup)(p_)
        for u in unrolls:
            os.environ["WHISPER_DECODER_UNROLL"] = str(u)
            tc = time.time()
            f1 = jax.jit(make_steps(p_, N_LOOP))
            f3 = jax.jit(make_steps(p_, 3 * N_LOOP))
            t1 = bench(f1, p_, cache)
            t3 = bench(f3, p_, cache)
            step = (t3 - t1) / (2 * N_LOOP)
            log(f"{name} unroll={u:>2}: {step*1e3:.3f} ms/step "
                f"({1.0/step:.0f} tok/s)  [wall incl compile "
                f"{time.time()-tc:.0f}s]")
        del cache
    os.environ.pop("WHISPER_DECODER_UNROLL", None)


if __name__ == "__main__":
    main()

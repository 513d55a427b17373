"""Mosaic capability checks for the decode-step megakernel.

tools/gemv_chain_probe.py showed the bs=1 decode MLP chain runs 1.31x
faster as ONE Pallas kernel (732 GB/s vs XLA's 57%-of-floor) and that the
win is eliminating kernel boundaries. Extending that to the FULL decoder
layer (self-attn + KV cache + cross-attn + MLP) needs a KV-cache write
path. Findings recorded here:

- A (1, d) DMA at a dynamic sublane offset into a slot-major (S, d) HBM
  ref is REJECTED by Mosaic: "Slice shape along dimension 0 must be
  aligned to tiling (8), but is 1" — sub-(8,128)-tile DMA shapes are
  illegal even on HBM memrefs (same family as the CLAUDE.md lane-dim
  note).
- Fallback A (XLA-side): keep the cache write OUT of the kernel — return
  the layer k/v rows and `dynamic_update_slice` them into a slot-major
  (L, S, d) carry. Contiguous row writes, unlike the pathological
  feature-major strided column DUS from round 2.
- Fallback B (in-kernel): group layout (S//8, 8, d); slice dim 0 (not
  tiled), read-modify-write the 8-row group around the slot.

This probe measures both fallbacks.

Usage: python tools/mega_caps_probe.py [--cpu] [--interpret]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    log(f"backend={jax.default_backend()}")
    L, S, D = 32, 448, 1280
    rng = np.random.default_rng(0)

    # --- fallback B: 8-row-group RMW at a dynamic group offset ------------
    def kernel(pos_ref, row_ref, cache_in_ref, cache_out_ref, buf, sem):
        pos = pos_ref[0]
        g, r = pos // 8, pos % 8
        rd = pltpu.make_async_copy(
            cache_in_ref.at[pl.ds(g, 1)], buf, sem)
        rd.start()
        rd.wait()
        sel = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1) == r
        buf[...] = jnp.where(sel, row_ref[...][None], buf[...])
        wr = pltpu.make_async_copy(
            buf, cache_out_ref.at[pl.ds(g, 1)], sem)
        wr.start()
        wr.wait()

    @jax.jit
    def write_row_b(cache, pos, row):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((S // 8, 8, D), jnp.bfloat16),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[pltpu.VMEM((1, 8, D), jnp.bfloat16),
                            pltpu.SemaphoreType.DMA],
            input_output_aliases={2: 0},
            interpret=args.interpret,
        )(jnp.reshape(pos, (1,)).astype(jnp.int32), row, cache)

    cache0 = jnp.zeros((S // 8, 8, D), jnp.bfloat16)
    row = jnp.asarray(rng.standard_normal((1, D)), jnp.bfloat16)
    got = np.asarray(write_row_b(cache0, jnp.int32(13), row), np.float32)
    flat = got.reshape(S, D)
    ok = (np.array_equal(flat[13], np.asarray(row[0], np.float32))
          and float(np.abs(np.delete(flat, 13, axis=0)).max()) == 0.0)
    log(f"fallback B group-RMW write + alias: {'OK' if ok else 'FAIL'}")

    # inside a fori_loop carry
    @jax.jit
    def loop_writes(cache, rows):
        def body(i, c):
            return write_row_b(c, i, rows[i][None])
        return jax.lax.fori_loop(0, 16, body, cache)

    rows = jnp.asarray(rng.standard_normal((16, D)), jnp.bfloat16)
    got2 = np.asarray(loop_writes(cache0, rows), np.float32).reshape(S, D)
    ok2 = np.allclose(got2[:16], np.asarray(rows, np.float32)) and \
        float(np.abs(got2[16:]).max()) == 0.0
    log(f"fallback B in fori_loop carry: {'OK' if ok2 else 'FAIL'}")

    if args.interpret:
        return

    # --- fallback A: XLA DUS on slot-major (L, S, D) carry -----------------
    big_rows = jnp.asarray(rng.standard_normal((L, 1, D)), jnp.bfloat16)

    @jax.jit
    def loop_dus(cache, n):
        def body(i, c):
            pos = i % S
            return jax.lax.dynamic_update_slice(
                c, big_rows * (i + 1.0), (0, pos, 0))
        return jnp.sum(jax.lax.fori_loop(0, n, body, cache)
                       .astype(jnp.float32))

    big = jnp.zeros((L, S, D), jnp.bfloat16)   # 36 MB

    def time_loop(fn, tag):
        for n in (32, 96):
            float(fn(big, n))
        reps = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(fn(big, 32))
            t1 = time.perf_counter()
            float(fn(big, 96))
            t2 = time.perf_counter()
            reps.append(((t2 - t1) - (t1 - t0)) / 64 * 1e6)
        log(f"{tag}: {np.median(reps):.1f} us/iter")

    time_loop(loop_dus, "fallback A: XLA DUS (L,1,D) row into 36 MB carry")

    # reference yardstick: where-iota full rewrite (what _stack_step does
    # today on the feature-major cache)
    @jax.jit
    def loop_where(cache, n):
        def body(i, c):
            pos = i % S
            slot = jax.lax.broadcasted_iota(jnp.int32, (1, S, 1), 1) == pos
            return jnp.where(slot, big_rows, c)
        return jnp.sum(jax.lax.fori_loop(0, n, body, cache)
                       .astype(jnp.float32))

    time_loop(loop_where, "yardstick: where-iota full 36 MB rewrite")

    # fallback B cost at scale: one aliased pallas row-write per iteration
    bigg = jnp.zeros((L * S // 8, 8, D), jnp.bfloat16)

    def kernel_l(pos_ref, row_ref, c_in, c_out, buf, sem):
        pos = pos_ref[0]
        g, r = pos // 8, pos % 8
        rd = pltpu.make_async_copy(c_in.at[pl.ds(g, 1)], buf, sem)
        rd.start()
        rd.wait()
        sel = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1) == r
        buf[...] = jnp.where(sel, row_ref[...][None], buf[...])
        wr = pltpu.make_async_copy(buf, c_out.at[pl.ds(g, 1)], sem)
        wr.start()
        wr.wait()

    @jax.jit
    def write_row_big(cache, pos, row):
        return pl.pallas_call(
            kernel_l,
            out_shape=jax.ShapeDtypeStruct((L * S // 8, 8, D), jnp.bfloat16),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[pltpu.VMEM((1, 8, D), jnp.bfloat16),
                            pltpu.SemaphoreType.DMA],
            input_output_aliases={2: 0},
        )(jnp.reshape(pos, (1,)).astype(jnp.int32), row, cache)

    @jax.jit
    def loop_pallas(cache, n):
        def body(i, c):
            return write_row_big(c, i % (L * S), big_rows[0])
        return jnp.sum(jax.lax.fori_loop(0, n, body, cache)
                       .astype(jnp.float32))

    def time_loop2(fn, tag):
        for n in (32, 96):
            float(fn(bigg, n))
        reps = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(fn(bigg, 32))
            t1 = time.perf_counter()
            float(fn(bigg, 96))
            t2 = time.perf_counter()
            reps.append(((t2 - t1) - (t1 - t0)) / 64 * 1e6)
        log(f"{tag}: {np.median(reps):.1f} us/iter")

    time_loop2(loop_pallas, "fallback B: aliased pallas group-RMW on 36 MB")


if __name__ == "__main__":
    main()

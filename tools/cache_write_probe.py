"""Can a Pallas aliased slot-write beat the where-iota KV-cache write?

The bs=32 decode step rewrites the full self-KV cache twice per step via
where(iota==pos) selects (~320 us each for the 24 MB buffer — the clean
bandwidth-bound choice after dynamic_update_slice measured ~850 us).
An input_output_aliased Pallas kernel could touch ONLY the lane-tiles
containing the written slot (128/T of the buffer) — IF (a) XLA honors
the alias inside a fori_loop carry without a defensive copy, and (b)
Mosaic can store to a dynamic lane-dim column at all (it tiles lanes in
128s; dynamic lane slicing is historically restricted — CLAUDE.md).
This probe answers both on the real shapes.

Variants, timed with N-vs-3N differential fori_loops:
1. where(iota==pos) full-buffer select        (current engine behavior)
2. dynamic_update_slice                       (known-bad baseline)
3. Pallas slot-write with input_output_aliases

MEASURED (v5e, 2026-08): in this isolated loop BOTH XLA variants cost
~0.1-0.2 us/write — XLA performs the column write fully in place when
the loop body is only the write. Two conclusions: (a) the ~320 us the
ENGINE pays per cache write is not the write primitive but the
read-write liveness copy of the full decode step (the cache is read by
attention and written in the same iteration, and the while-carry
double-buffers); (b) a Pallas kernel can't help with that either — the
copy is a buffer-lifetime decision made by XLA around the whole step,
not inside the write. Possible future work: restructure the step so the
self-KV write is provably post-all-reads and donation-friendly. The
Pallas variant itself died in the remote compile helper (HTTP 500,
environment-side Mosaic crash), recorded for completeness.
"""

import json
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

N = 50
L, B, H, DH, T = 4, 32, 20, 64, 228   # bs=32 self-KV cache (bf16: 24 MB)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(fn, *args, iters=6):
    import jax

    fn(*args)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.tree.map(lambda x: x.block_until_ready(), r)
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def diff(make, args):
    import jax

    f1 = jax.jit(make(N))
    f3 = jax.jit(make(3 * N))
    return (bench(f3, *args) - bench(f1, *args)) / (2 * N)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    cache0 = jax.device_put(jnp.asarray(
        rng.standard_normal((L, B, H, DH, T)).astype(np.float32)
    ).astype(jnp.bfloat16))
    new_col = jax.device_put(jnp.asarray(
        rng.standard_normal((L, B, H, DH, 1)).astype(np.float32)
    ).astype(jnp.bfloat16))

    # 1. where-iota select (engine behavior)
    def make_where(n):
        def run(cache, col):
            def body(i, c):
                pos = 4 + (i % 128)
                # Data-dependent value: without this, XLA fuses all N
                # constant writes into ONE buffer pass (measured ~0).
                colv = col + c[:1, :1, :1, :1, pos]
                slot = jax.lax.broadcasted_iota(
                    jnp.int32, (1, 1, 1, 1, T), 4) == pos
                return jnp.where(slot, colv, c)
            return jax.lax.fori_loop(0, n, body, cache)
        return run

    t_where = diff(make_where, (cache0, new_col))
    log(f"where-iota select: {t_where*1e6:.0f} us/write")

    # 2. dynamic_update_slice (known-bad)
    def make_dus(n):
        def run(cache, col):
            def body(i, c):
                pos = 4 + (i % 128)
                colv = col + c[:1, :1, :1, :1, pos]
                return jax.lax.dynamic_update_slice(
                    c, colv, (0, 0, 0, 0, pos))
            return jax.lax.fori_loop(0, n, body, cache)
        return run

    t_dus = diff(make_dus, (cache0, new_col))
    log(f"dynamic_update_slice: {t_dus*1e6:.0f} us/write")

    # 3. Pallas aliased slot-write over a (L*B, H*DH, T) view.
    cache2 = cache0.reshape(L * B, H * DH, T)
    col2 = new_col.reshape(L * B, H * DH, 1)

    def kernel(pos_ref, col_ref, cache_ref, out_ref):
        # Full-block read-modify-write: lane-tiled memory cannot DMA a
        # single lane column (CLAUDE.md), so the block round-trips VMEM.
        pos = pos_ref[0]
        out_ref[...] = cache_ref[...]
        out_ref[:, :, pl.dslice(pos, 1)] = col_ref[...]

    def pallas_write(cache, col, pos):
        return pl.pallas_call(
            kernel,
            grid=(L * B,),
            in_specs=[
                pl.BlockSpec((1,), lambda i: (0,)),
                pl.BlockSpec((1, H * DH, 1), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, H * DH, T), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, H * DH, T), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
            input_output_aliases={2: 0},
        )(pos, col, cache)

    def make_pallas(n):
        def run(cache, col):
            def body(i, c):
                pos = jnp.full((1,), 4 + (i % 128), jnp.int32)
                colv = col + c[:1, :1, pos[0]][:, :, None]
                return pallas_write(c, colv, pos)
            return jax.lax.fori_loop(0, n, body, cache)
        return run

    try:
        t_pl = diff(make_pallas, (cache2, col2))
        log(f"pallas aliased slot-write: {t_pl*1e6:.0f} us/write")
        # Correctness: one write lands in the right column.
        pos = jnp.full((1,), 7, jnp.int32)
        outc = np.asarray(pallas_write(cache2, col2, pos).astype(jnp.float32))
        ref = np.asarray(cache2.astype(jnp.float32)).copy()
        ref[:, :, 7] = np.asarray(col2.astype(jnp.float32))[:, :, 0]
        np.testing.assert_allclose(outc, ref)
        log("pallas write correctness: OK")
        ok = True
    except Exception as e:
        log(f"pallas variant failed: {type(e).__name__}: {str(e)[:300]}")
        t_pl, ok = float("nan"), False

    print(json.dumps({
        "where_us": round(t_where * 1e6, 1),
        "dus_us": round(t_dus * 1e6, 1),
        "pallas_us": round(t_pl * 1e6, 1) if ok else None,
    }))


if __name__ == "__main__":
    main()

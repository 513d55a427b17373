"""Can a manually-pipelined Pallas GEMV chain beat XLA's decode MLP?

The large-v3 int8 bs=1 decode step runs at ~57% of its ~1.2 ms HBM floor
and the residual is PER-KERNEL overhead, not bandwidth (int4 halved the
weight bytes for 8-10%, tools/int4_native_probe.py; fusing self q/k/v
removed 2 of 8 projection kernels for 4.5%, tools/qkv_fuse_probe.py).
ops/attention_pallas.py's post-mortem says the remaining headroom needs
"a much more serious kernel (manual double-buffered DMA + MXU/VPU
overlap)". This probe builds that kernel for the biggest slice of the
step — the MLP (fc1 -> tanh GELU -> fc2 = 13.1 of the 22.9 MB of int8
weights each large-v3 layer reads) — and races it against the exact XLA
lowering the model uses today (models/whisper.py::_mlp + _layer_norm,
weight-only int8 leaves, rolled lax.scan over 32 stacked layers).

Three arms, interleaved, N-vs-3N differential timing (CLAUDE.md rules):

- ``xla``    : ln2 + _linear(int8 dict) + _gelu + _linear + residual,
               rolled scan — the production decode MLP sub-chain.
- ``pallas`` : one pallas_call per STACK: the whole L-layer MLP chain in
               a single kernel; weights stay in HBM and stream through a
               double-buffered VMEM window (2 x tile), h lives in VMEM,
               ln2/gelu/scales/residual fused around the dots.
- ``hybrid`` : (optional --hybrid) one pallas_call per LAYER inside the
               scan, reading its slice of the stacked HBM weights via a
               scalar index — the shape that could slot into
               models/whisper.py::_stack_step without restructuring it.

Roofline: 32 layers x 13.11 MB = 419.5 MB of int8 weights -> 512 us at
the 819 GB/s v5e HBM peak. XLA's arm carries the same bytes.

Usage: python tools/gemv_chain_probe.py [--layers 32] [--steps 32]
       [--tile 512] [--reps 5] [--hybrid]
"""

import argparse
import functools
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

D_MODEL = 1280
D_FFN = 5120


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_mlp_chain_kernel(n_layers: int, tile: int, d_model: int, d_ffn: int,
                           interpret: bool = False):
    """Returns fn(x, ln_s, ln_b, s1, b1, s2, b2, w1q, w2q) -> (1, d) bf16.

    One Pallas program: for each layer, stream W1 (d_model, d_ffn) column
    tiles and W2 (d_ffn, d_model) row tiles HBM->VMEM double-buffered,
    computing ln2 -> x@W1*s1+b1 -> tanh-gelu -> h@W2*s2+b2 -> +residual
    entirely in VMEM. DMA of tile j+1 (and of the next phase/layer's
    first tile) is issued before waiting on tile j, so the HBM pipe never
    drains across the fc1->fc2 or layer->layer boundaries.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nt1 = d_ffn // tile   # W1 column tiles, each (d_model, tile)
    nt2 = d_ffn // tile   # W2 row tiles, each (tile, d_model)

    def kernel(x_ref, lns_ref, lnb_ref, s1_ref, b1_ref, s2_ref, b2_ref,
               w1_ref, w2_ref, o_ref, w1buf, w2buf, h_ref, sem1, sem2):
        def dma1(slot, l, j):
            return pltpu.make_async_copy(
                w1_ref.at[l, :, pl.ds(j * tile, tile)], w1buf.at[slot],
                sem1.at[slot])

        def dma2(slot, l, j):
            return pltpu.make_async_copy(
                w2_ref.at[l, pl.ds(j * tile, tile), :], w2buf.at[slot],
                sem2.at[slot])

        dma1(0, 0, 0).start()

        def layer_body(l, x):
            # ln2 (f32, matching models/whisper.py::_layer_norm)
            x32 = x.astype(jnp.float32)
            mean = jnp.mean(x32, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
            q_in = ((x32 - mean) * jax.lax.rsqrt(var + 1e-5)
                    * lns_ref[l][None].astype(jnp.float32)
                    + lnb_ref[l][None].astype(jnp.float32)
                    ).astype(jnp.bfloat16)

            def fc1_body(j, _):
                slot = j % 2

                @pl.when(j + 1 < nt1)
                def _():
                    dma1((j + 1) % 2, l, j + 1).start()

                @pl.when(j + 1 == nt1)
                def _():
                    dma2(0, l, 0).start()

                dma1(slot, l, j).wait()
                wt = w1buf[slot].astype(jnp.bfloat16)   # (d_model, tile)
                part = jax.lax.dot_general(
                    q_in, wt, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (1, tile)
                part = (part * s1_ref[l, pl.ds(j * tile, tile)][None]
                        + b1_ref[l, pl.ds(j * tile, tile)][None])
                h_ref[:, pl.ds(j * tile, tile)] = jax.nn.gelu(
                    part.astype(jnp.bfloat16), approximate=True)
                return 0

            jax.lax.fori_loop(0, nt1, fc1_body, 0, unroll=True)

            def fc2_body(j, acc):
                slot = j % 2

                @pl.when(j + 1 < nt2)
                def _():
                    dma2((j + 1) % 2, l, j + 1).start()

                @pl.when((j + 1 == nt2) & (l + 1 < n_layers))
                def _():
                    dma1(0, l + 1, 0).start()

                dma2(slot, l, j).wait()
                wt = w2buf[slot].astype(jnp.bfloat16)   # (tile, d_model)
                hj = h_ref[:, pl.ds(j * tile, tile)]
                return acc + jax.lax.dot_general(
                    hj, wt, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (1, d_model)

            acc = jax.lax.fori_loop(
                0, nt2, fc2_body,
                jnp.zeros((1, d_model), jnp.float32), unroll=True)
            y = acc * s2_ref[l][None] + b2_ref[l][None]
            return x + y.astype(jnp.bfloat16)

        x = jax.lax.fori_loop(0, n_layers, layer_body, x_ref[...])
        o_ref[...] = x

    @jax.jit
    def run(x, ln_s, ln_b, s1, b1, s2, b2, w1q, w2q):
        vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, d_model), jnp.bfloat16),
            in_specs=[vmem()] * 7 + [
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=vmem(),
            scratch_shapes=[
                pltpu.VMEM((2, d_model, tile), jnp.int8),
                pltpu.VMEM((2, tile, d_model), jnp.int8),
                pltpu.VMEM((1, d_ffn), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(x, ln_s, ln_b, s1, b1, s2, b2, w1q, w2q)

    return run


def build_mlp_layer_kernel(tile: int, d_model: int, d_ffn: int,
                           interpret: bool = False):
    """Per-layer variant: fn(x, l, ln_s, ln_b, s1, b1, s2, b2, w1q, w2q).

    Same fused ln2+fc1+gelu+fc2+residual math as the stack kernel, but one
    pallas_call per layer with the layer index ``l`` arriving as a scalar —
    the shape that drops into models/whisper.py::_stack_step's lax.scan
    (the stacked weights stay loop-invariant HBM operands; only the index
    varies, so XLA materializes no per-iteration weight copies).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nt = d_ffn // tile

    def kernel(l_ref, x_ref, lns_ref, lnb_ref, s1_ref, b1_ref, s2_ref,
               b2_ref, w1_ref, w2_ref, o_ref, w1buf, w2buf, h_ref,
               sem1, sem2):
        l = l_ref[0]

        def dma1(slot, j):
            return pltpu.make_async_copy(
                w1_ref.at[l, :, pl.ds(j * tile, tile)], w1buf.at[slot],
                sem1.at[slot])

        def dma2(slot, j):
            return pltpu.make_async_copy(
                w2_ref.at[l, pl.ds(j * tile, tile), :], w2buf.at[slot],
                sem2.at[slot])

        dma1(0, 0).start()
        x = x_ref[...]
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        q_in = ((x32 - mean) * jax.lax.rsqrt(var + 1e-5)
                * lns_ref[l][None].astype(jnp.float32)
                + lnb_ref[l][None].astype(jnp.float32)).astype(jnp.bfloat16)

        def fc1_body(j, _):
            slot = j % 2

            @pl.when(j + 1 < nt)
            def _():
                dma1((j + 1) % 2, j + 1).start()

            @pl.when(j + 1 == nt)
            def _():
                dma2(0, 0).start()

            dma1(slot, j).wait()
            wt = w1buf[slot].astype(jnp.bfloat16)
            part = jax.lax.dot_general(
                q_in, wt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            part = (part * s1_ref[l, pl.ds(j * tile, tile)][None]
                    + b1_ref[l, pl.ds(j * tile, tile)][None])
            h_ref[:, pl.ds(j * tile, tile)] = jax.nn.gelu(
                part.astype(jnp.bfloat16), approximate=True)
            return 0

        jax.lax.fori_loop(0, nt, fc1_body, 0, unroll=True)

        def fc2_body(j, acc):
            slot = j % 2

            @pl.when(j + 1 < nt)
            def _():
                dma2((j + 1) % 2, j + 1).start()

            dma2(slot, j).wait()
            wt = w2buf[slot].astype(jnp.bfloat16)
            hj = h_ref[:, pl.ds(j * tile, tile)]
            return acc + jax.lax.dot_general(
                hj, wt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        acc = jax.lax.fori_loop(
            0, nt, fc2_body, jnp.zeros((1, d_model), jnp.float32),
            unroll=True)
        y = acc * s2_ref[l][None] + b2_ref[l][None]
        o_ref[...] = x + y.astype(jnp.bfloat16)

    @jax.jit
    def run(x, l, ln_s, ln_b, s1, b1, s2, b2, w1q, w2q):
        vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, d_model), jnp.bfloat16),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [vmem()] * 7 + [
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=vmem(),
            scratch_shapes=[
                pltpu.VMEM((2, d_model, tile), jnp.int8),
                pltpu.VMEM((2, tile, d_model), jnp.int8),
                pltpu.VMEM((1, d_ffn), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(jnp.reshape(l, (1,)).astype(jnp.int32), x, ln_s, ln_b,
          s1, b1, s2, b2, w1q, w2q)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--hybrid", action="store_true",
                    help="also time one pallas_call per layer inside scan")
    ap.add_argument("--interpret", action="store_true",
                    help="numerics-only run via the Pallas interpreter "
                         "(works on CPU; no timing value)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from thewhisper_tpu.models import whisper as W

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    L, D, F, T = args.layers, D_MODEL, D_FFN, args.tile
    assert F % T == 0

    rng = np.random.default_rng(0)
    # int8 weight-only leaves, stacked (L, ...) like the scan layout.
    # Weights init ON DEVICE (420 MB over the axon tunnel would dominate).
    kq1, kq2 = jax.random.split(jax.random.PRNGKey(0))
    w1q = jax.jit(lambda k: jax.random.randint(
        k, (L, D, F), -127, 128, dtype=jnp.int8))(kq1)
    w2q = jax.jit(lambda k: jax.random.randint(
        k, (L, F, D), -127, 128, dtype=jnp.int8))(kq2)
    w1q.block_until_ready()
    s1 = jnp.asarray((rng.uniform(0.5, 1.5, (L, F)) * 0.02 / 127
                      ).astype(np.float32))
    s2 = jnp.asarray((rng.uniform(0.5, 1.5, (L, D)) * 0.02 / 127
                      ).astype(np.float32))
    b1 = jnp.asarray((0.02 * rng.standard_normal((L, F))).astype(np.float32))
    b2 = jnp.asarray((0.02 * rng.standard_normal((L, D))).astype(np.float32))
    ln_s = jnp.ones((L, D), jnp.float32)
    ln_b = jnp.zeros((L, D), jnp.float32)
    x0 = jnp.asarray((0.1 * rng.standard_normal((1, D))).astype(np.float32)
                     ).astype(jnp.bfloat16)

    gb = (w1q.size + w2q.size) / 1e9
    log(f"L={L} D={D} F={F} tile={T}: {gb * 1e3:.1f} MB int8 weights/step "
        f"-> roofline {gb / 0.819:.3f} ms at 819 GB/s")

    # All big arrays travel as ARGUMENTS, never closures: closed-over
    # device arrays inline into the lowered module as literals, and the
    # axon remote-compile endpoint rejects the 420 MB body (HTTP 413).
    P = {"ln_s": ln_s, "ln_b": ln_b, "s1": s1, "b1": b1, "s2": s2,
         "b2": b2, "w1q": w1q, "w2q": w2q}

    # --- XLA arm: exactly the production decode MLP sub-chain ------------
    def xla_layer(x, xs):
        lp_mlp, lp_ln = xs
        q_in = W._layer_norm(x, lp_ln["scale"], lp_ln["bias"])
        return x + W._mlp(q_in, lp_mlp), None

    @jax.jit
    def xla_chain(x, P):
        mlp_leaves = {
            "fc1_w": {"q": P["w1q"], "s": P["s1"]}, "fc1_b": P["b1"],
            "fc2_w": {"q": P["w2q"], "s": P["s2"]}, "fc2_b": P["b2"],
        }
        ln_leaves = {"scale": P["ln_s"], "bias": P["ln_b"]}
        y, _ = jax.lax.scan(xla_layer, x, (mlp_leaves, ln_leaves))
        return y

    pallas_chain = build_mlp_chain_kernel(L, T, D, F,
                                          interpret=args.interpret)

    def pallas_once(x, P):
        return pallas_chain(x, P["ln_s"], P["ln_b"], P["s1"], P["b1"],
                            P["s2"], P["b2"], P["w1q"], P["w2q"])

    if args.hybrid:
        layer_fn = build_mlp_layer_kernel(T, D, F, interpret=args.interpret)

        @jax.jit
        def hybrid_chain(x, P):
            def body(x, l):
                return layer_fn(x, l, P["ln_s"], P["ln_b"], P["s1"],
                                P["b1"], P["s2"], P["b2"], P["w1q"],
                                P["w2q"]), None
            y, _ = jax.lax.scan(body, x, jnp.arange(L, dtype=jnp.int32))
            return y

    # --- numerics ---------------------------------------------------------
    ref = np.asarray(xla_chain(x0, P), np.float32)
    got = np.asarray(pallas_once(x0, P), np.float32)
    err = np.max(np.abs(ref - got)) / max(np.max(np.abs(ref)), 1e-6)
    log(f"numerics: max rel err vs XLA arm = {err:.2e}")
    assert err < 5e-2, "pallas chain diverged from the XLA reference"
    if args.hybrid:
        goth = np.asarray(hybrid_chain(x0, P), np.float32)
        errh = np.max(np.abs(ref - goth)) / max(np.max(np.abs(ref)), 1e-6)
        log(f"numerics: hybrid max rel err vs XLA arm = {errh:.2e}")
        assert errh < 5e-2, "hybrid layer kernel diverged"
    if args.interpret:
        log("interpret mode: numerics validated; skipping timing")
        return

    # --- timing: N vs 3N steps, interleaved -------------------------------
    def make_loop(step_fn, n):
        @jax.jit
        def loop(x, P):
            def body(i, x):
                return step_fn(x, P) * 0.999  # keep magnitudes bounded
            x = jax.lax.fori_loop(0, n, body, x)
            return jnp.sum(x.astype(jnp.float32))
        return loop

    n = args.steps
    arms = {"xla": xla_chain, "pallas": pallas_once}
    if args.hybrid:
        arms["hybrid"] = hybrid_chain
    loops = {k: (make_loop(f, n), make_loop(f, 3 * n)) for k, f in arms.items()}
    for k, (l1, l3) in loops.items():
        float(l1(x0, P))
        float(l3(x0, P))
        log(f"compiled {k}")

    res = {k: [] for k in arms}
    for rep in range(args.reps):
        for k, (l1, l3) in loops.items():
            t0 = time.perf_counter()
            float(l1(x0, P))
            t1 = time.perf_counter()
            float(l3(x0, P))
            t2 = time.perf_counter()
            per = ((t2 - t1) - (t1 - t0)) / (2 * n)
            res[k].append(per * 1e3)
    for k, v in res.items():
        med = statistics.median(v)
        log(f"{k:8s}: {med:.3f} ms/chain (min {min(v):.3f}, max {max(v):.3f})"
            f"  -> {gb / med * 1e3:.0f} GB/s effective")
    ratio = statistics.median(res["xla"]) / statistics.median(res["pallas"])
    log(f"pallas/xla speedup: {ratio:.3f}x")


if __name__ == "__main__":
    main()

"""Does nibble-packed int4 (unpack-in-graph) beat int8 for bs=1 GEMV?

bs=1 decode is weight-bandwidth-bound. Native jnp.int4 cannot cross the
axon tunnel (plugin RecursionError), so int4 here means two nibbles per
int8 byte, unpacked with shifts inside the graph. The win requires XLA to
fuse the unpack+dequant into the dot's operand read instead of
materializing the unpacked weights — this probe answers whether it does.

Shapes: the decoder MLP GEMV (1, 1280) @ (1280, 5120), fori_loop with a
full-reduction carry (see int8_matmul_probe.py for why), 64 iterations.
"""

import json
import statistics
import sys
import time

import numpy as np

N = 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    kdim, n = 1280, 5120
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((8, kdim), dtype=np.float32)).astype(jnp.bfloat16))
    w8 = rng.integers(-7, 8, (kdim, n)).astype(np.int8)
    scale = (np.abs(rng.standard_normal((n,))) * 0.01 + 1e-3).astype(np.float32)
    # pack pairs along the contraction dim: byte = (hi << 4) | (lo & 0xF)
    lo = w8[0::2]
    hi = w8[1::2]
    packed = ((hi.astype(np.int16) << 4) | (lo.astype(np.int16) & 0xF)
              ).astype(np.int8)                      # (kdim//2, n)
    w8_d = jax.device_put(jnp.asarray(w8))
    wp_d = jax.device_put(jnp.asarray(packed))
    s_d = jax.device_put(jnp.asarray(scale))
    wb_d = jax.device_put(jnp.asarray(w8.astype(np.float32)).astype(jnp.bfloat16))

    def unpack(p):
        # arithmetic shifts sign-extend: low nibble via <<4 then >>4.
        lo = jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(p, jnp.int8(4)), jnp.int8(4))
        hi = jax.lax.shift_right_arithmetic(p, jnp.int8(4))
        # interleave back to (kdim, n)
        w = jnp.stack([lo, hi], axis=1).reshape(p.shape[0] * 2, p.shape[1])
        return w

    def looped(step, *args):
        @jax.jit
        def fn(*args):
            def body(i, c):
                out = step(c, *args)
                return jnp.max(jnp.abs(out)).astype(jnp.float32) * 1e-30
            return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))
        return fn

    def bf16_step(c, x, w, s):
        return (x + c.astype(x.dtype)) @ w

    def int8_step(c, x, w, s):
        wd = w.astype(x.dtype) * s.astype(x.dtype)[None, :]
        return (x + c.astype(x.dtype)) @ wd

    def int4_step(c, x, p, s):
        wd = unpack(p).astype(x.dtype) * s.astype(x.dtype)[None, :]
        return (x + c.astype(x.dtype)) @ wd

    # correctness of the unpack
    ref = np.asarray(w8, np.float32)
    got = np.asarray(jax.jit(unpack)(wp_d), np.float32)
    assert np.array_equal(ref, got), "unpack mismatch"
    log("unpack exact")

    out = {}
    for name, step, w in [("bf16", bf16_step, wb_d),
                          ("int8", int8_step, w8_d),
                          ("int4_packed", int4_step, wp_d)]:
        fn = looped(step, x, w, s_d)
        float(fn(x, w, s_d))
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            float(fn(x, w, s_d))
            ts.append(time.perf_counter() - t0)
        us = statistics.median(ts) / N * 1e6
        log(f"[{name}] {us:.1f} us/GEMV")
        out[name] = round(us, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

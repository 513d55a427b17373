"""Does XLA hit the v5e int8 MXU path (2x bf16 peak) for dot_general?

Methodology: N dependent matmuls inside ONE jitted fori_loop, where the
carry is a FULL max-reduction of each output (scaled to epsilon), so no
slice-pushdown/DCE can skip the work. Two earlier versions of this probe
were wrong: (1) an eager 1 GB reduction postlude dominated every variant
at "15 TFLOP/s"; (2) a carry of out[0,0] let XLA rewrite each matmul into
a single dot row — every shape "ran" in the same 1.5-1.9 ms and bf16
"hit" 415-587 TFLOP/s on a 197-peak chip. The max-carry forces all
elements; its epilogue pass is shared by all variants.
Run on the real TPU with an idle host.
"""

import json
import statistics
import sys
import time

import numpy as np

N_ITERS = 16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    m, kdim, n = 32 * 1536, 1280, 5120
    a_bf = jax.device_put(jnp.asarray(
        rng.standard_normal((m, kdim), dtype=np.float32)).astype(jnp.bfloat16))
    w_bf = jax.device_put(jnp.asarray(
        rng.standard_normal((kdim, n), dtype=np.float32)).astype(jnp.bfloat16))
    a_i8 = jax.device_put(jnp.asarray(
        rng.integers(-127, 127, (m, kdim)).astype(np.int8)))
    w_i8 = jax.device_put(jnp.asarray(
        rng.integers(-127, 127, (kdim, n)).astype(np.int8)))
    w_scale = jax.device_put(jnp.asarray(
        (np.abs(rng.standard_normal((n,))) * 0.01 + 1e-3).astype(np.float32)))
    a_scale = jax.device_put(jnp.asarray(
        (np.abs(rng.standard_normal((m,))) * 0.01 + 1e-3).astype(np.float32)))

    flops = 2 * m * kdim * n * N_ITERS

    def looped(one_step, *args):
        """Run one_step N times with a scalar data dependency, one dispatch."""
        @jax.jit
        def fn(*args):
            def body(i, carry):
                out = one_step(carry, *args)
                # Full reduction: depends on EVERY output element.
                return jnp.max(jnp.abs(out)).astype(jnp.float32) * 1e-30
            return jax.lax.fori_loop(0, N_ITERS, body, jnp.float32(0.0))
        return fn

    def bf16_step(c, a, w):
        return (a + c.astype(a.dtype)) @ w

    def int8_step(c, a, w):
        # carry folds into the output, not the int8 input (keeps int8 feed)
        acc = jax.lax.dot_general(a, w, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) + c

    def int8_scaled_step(c, a, w, sa, sw):
        acc = jax.lax.dot_general(a, w, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y = (acc.astype(jnp.float32) * sa[:, None] * sw[None, :]
             ).astype(jnp.bfloat16)
        return y.astype(jnp.float32) + c

    def wonly_step(c, a, w, sw):
        wd = w.astype(a.dtype) * sw.astype(a.dtype)[None, :]
        return (a + c.astype(a.dtype)) @ wd

    def w8a8_full_step(c, a, w, sw):
        """The complete W8A8 layer cost: dynamic act quant + int8 dot +
        rescale (what models.whisper._linear pays)."""
        a = a + c.astype(a.dtype)
        a32 = a.astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(a32), axis=-1), 1e-8) / 127.0
        q = jnp.clip(jnp.round(a32 / s[:, None]), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(q, w, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * s[:, None] * sw[None, :]
                ).astype(jnp.bfloat16)

    cases = [
        ("bf16", looped(bf16_step), (a_bf, w_bf)),
        ("int8_raw", looped(int8_step), (a_i8, w_i8)),
        ("int8_scaled", looped(int8_scaled_step), (a_i8, w_i8, a_scale, w_scale)),
        ("weight_only", looped(wonly_step), (a_bf, w_i8, w_scale)),
        ("w8a8_full", looped(w8a8_full_step), (a_bf, w_i8, w_scale)),
    ]
    out = {}
    for name, fn, args in cases:
        r = float(fn(*args))  # compile + first run
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            float(fn(*args))
            ts.append(time.perf_counter() - t0)
        sec = statistics.median(ts)
        ms = sec / N_ITERS * 1e3
        log(f"[{name}] {ms:.2f} ms/matmul  ({flops / sec / 1e12:.0f} TFLOP/s)")
        out[name] = {"ms_per_matmul": round(ms, 2),
                     "tflops": round(flops / sec / 1e12, 0)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""GELU/LayerNorm variant probe on the MLP activation volume (bs=32x30s)."""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    log(f"backend={jax.default_backend()}")
    big = jax.device_put(jnp.full((32, 1500, 5120), 0.3, jnp.bfloat16))
    x = jax.device_put(jnp.full((32, 1500, 1280), 0.3, jnp.bfloat16))
    out = {}

    def bench(fn, name, n=6):
        f = jax.jit(fn)
        float(jnp.mean(f(big if "ln" not in name else x).astype(jnp.float32)))
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            float(jnp.mean(
                f(big if "ln" not in name else x).astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(ts) * 1e3, 1)
        log(f"[{name}] {out[name]} ms")

    def loop(g):
        def f(v):
            for _ in range(4):
                v = g(v)
            return v
        return f

    bench(loop(lambda v: jax.nn.gelu(v, approximate=False)), "gelu_exact_x4")
    bench(loop(lambda v: jax.nn.gelu(v, approximate=True)), "gelu_tanh_x4")
    bench(loop(lambda v: v * jax.nn.sigmoid(1.702 * v)), "gelu_sigmoid_x4")
    bench(loop(lambda v: jax.nn.relu(v)), "relu_x4")
    bench(loop(lambda v: jax.nn.gelu(v.astype(jnp.float32),
                                     approximate=False).astype(jnp.bfloat16)),
          "gelu_exact_f32_x4")

    # LayerNorm variants on (32,1500,1280), 8 applications (~2 per layer x4).
    def ln_f32(v):
        v32 = v.astype(jnp.float32)
        m = jnp.mean(v32, -1, keepdims=True)
        var = jnp.var(v32, -1, keepdims=True)
        return ((v32 - m) * jax.lax.rsqrt(var + 1e-5)).astype(v.dtype)

    def ln_mixed(v):
        m = jnp.mean(v, -1, keepdims=True, dtype=jnp.float32).astype(v.dtype)
        c = v - m
        var = jnp.mean((c * c).astype(jnp.float32), -1, keepdims=True)
        return c * jax.lax.rsqrt(var + 1e-5).astype(v.dtype)

    bench(loop(ln_f32), "ln_f32_x4")
    bench(loop(ln_mixed), "ln_mixed_x4")

    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Identify the TPU and measure its actual peaks (matmul TFLOP/s, HBM GB/s).

The chip reports "TPU v5 lite" (v5e: 197 bf16 TFLOP/s, 819 GB/s HBM).
Methodology: every timing loop's carry is a FULL max-reduction of the
output — a carry of out[0,0] lets XLA slice each matmul down to one
row-column dot (a first version of this probe "measured" 418-587 TFLOP/s
that way), and a *0.0 carry DCEs the op entirely.
"""

import json
import statistics
import sys
import time

import numpy as np

N = 16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    d = jax.devices()[0]
    info = {"device_kind": getattr(d, "device_kind", "?"),
            "platform": d.platform}
    try:
        ms = d.memory_stats()
        info["hbm_bytes"] = ms.get("bytes_limit")
    except Exception:
        pass
    log(info)

    rng = np.random.default_rng(0)

    # --- matmul peak at a few shapes ---------------------------------------
    def matmul_case(m, k, n):
        a = jax.device_put(jnp.asarray(
            rng.standard_normal((m, k), dtype=np.float32)).astype(jnp.bfloat16))
        w = jax.device_put(jnp.asarray(
            rng.standard_normal((k, n), dtype=np.float32)).astype(jnp.bfloat16))

        @jax.jit
        def fn(a, w):
            def body(i, c):
                out = (a + c.astype(a.dtype)) @ w
                # Full reduction: no slice-pushdown can skip the matmul.
                return jnp.max(jnp.abs(out)).astype(jnp.float32) * 1e-30
            return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))

        float(fn(a, w))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(fn(a, w))
            ts.append(time.perf_counter() - t0)
        sec = statistics.median(ts) / N
        return round(2 * m * k * n / sec / 1e12, 0)

    info["bf16_tflops"] = {
        "49152x1280x5120": matmul_case(49152, 1280, 5120),
        "49152x5120x1280": matmul_case(49152, 5120, 1280),
        "49152x1280x1280": matmul_case(49152, 1280, 1280),
        "8192x8192x8192": matmul_case(8192, 8192, 8192),
    }
    log(info["bf16_tflops"])

    # --- HBM bandwidth: big elementwise copy (read + write) ----------------
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((512, 1024, 1024), dtype=np.float32)))  # 2 GB

    @jax.jit
    def copy_loop(x):
        def body(i, c):
            y = x + c
            return jnp.max(y) * 1e-30
        return jax.lax.fori_loop(0, 8, body, jnp.float32(0.0))

    float(copy_loop(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(copy_loop(x))
        ts.append(time.perf_counter() - t0)
    sec = statistics.median(ts) / 8
    gbps = (2 * x.size * 4) / sec / 1e9
    info["hbm_gbps_copy"] = round(gbps, 0)
    log(f"HBM copy bandwidth: {gbps:.0f} GB/s")

    # --- VPU transcendental throughput (tanh on 1 GB bf16) -----------------
    xb = x.astype(jnp.bfloat16)

    @jax.jit
    def tanh_loop(x):
        def body(i, c):
            y = jnp.tanh(x + c.astype(x.dtype))
            return jnp.max(y).astype(jnp.float32) * 1e-30
        return jax.lax.fori_loop(0, 8, body, jnp.float32(0.0))

    float(tanh_loop(xb))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(tanh_loop(xb))
        ts.append(time.perf_counter() - t0)
    sec = statistics.median(ts) / 8
    info["tanh_gelem_s"] = round(x.size / sec / 1e9, 1)
    log(f"tanh: {info['tanh_gelem_s']} G elem/s")

    print(json.dumps(info))


if __name__ == "__main__":
    main()

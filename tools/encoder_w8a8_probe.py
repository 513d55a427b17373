"""Full-encoder A/B: bf16 vs W8A8 (int8 activations + weights, "S+" mode).

bs=32 x 30 s on the real TPU. Also reports output deviation vs bf16.
"""

import dataclasses
import json
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from thewhisper_tpu.config import ARCH_PRESETS
    from thewhisper_tpu.models import whisper as W
    from thewhisper_tpu.models.quant import quantize_params

    log(f"backend={jax.default_backend()}")
    arch = dataclasses.replace(ARCH_PRESETS["large-v3-turbo"])
    dt = jnp.bfloat16
    log("init params (bf16) + W8A8 copy...")
    t0 = time.time()
    params = W.init_params(arch, seed=0, dtype=dt)
    qparams = quantize_params(params, components=("encoder",),
                              activation_int8=True)
    qparams["decoder"] = params["decoder"]
    mel = jax.device_put(jnp.asarray(
        (0.1 * np.random.default_rng(0).standard_normal((32, 128, 3000))
         ).astype(np.float32)))
    log(f"  ready in {time.time() - t0:.0f}s")

    @jax.jit
    def full(params, mel):
        return W.encoder_forward.__wrapped__(params, mel, arch, dt)

    def bench(name, p, iters=8):
        def run():
            return float(jnp.mean(full(p, mel).astype(jnp.float32)))
        log(f"[{name}] compiling...")
        t0 = time.time()
        run()
        log(f"  compiled+first in {time.time() - t0:.0f}s")
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        ms = statistics.median(ts) * 1e3
        log(f"[{name}] {ms:.1f} ms (min {min(ts)*1e3:.1f})")
        return round(ms, 1)

    a = np.asarray(full(params, mel), dtype=np.float32)
    b = np.asarray(full(qparams, mel), dtype=np.float32)
    rel = float(np.abs(a - b).max() / np.abs(a).max())
    cc = float(np.corrcoef(a.ravel(), b.ravel())[0, 1])
    log(f"W8A8 vs bf16: max rel err {rel:.4f}, corr {cc:.6f}")

    out = {"max_rel_err": round(rel, 4), "corr": round(cc, 6)}
    out["encoder_bf16"] = bench("bf16", params)
    out["encoder_w8a8"] = bench("w8a8", qparams)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

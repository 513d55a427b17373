"""A/B the conv stem: XLA conv_general_dilated vs 3-tap matmul stem.

Also re-times the full encoder with the matmul stem. bs=32 x 30 s, v5e.
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

    log(f"backend={jax.default_backend()}")
    arch = dataclasses.replace(ARCH_PRESETS["large-v3-turbo"])
    dt = jnp.bfloat16
    log("init params...")
    t0 = time.time()
    params = W.init_params(arch, seed=0, dtype=dt)
    enc = params["encoder"]
    stem = {"conv1": enc["conv1"], "conv2": enc["conv2"]}
    mel = jax.device_put(jnp.asarray(
        (0.1 * np.random.default_rng(0).standard_normal((32, 128, 3000))
         ).astype(np.float32)))
    log(f"  ready in {time.time() - t0:.0f}s")

    @jax.jit
    def conv_old(stem, mel):
        x = mel.astype(dt)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, stem["conv1"]["w"].shape, ("NCH", "OIH", "NCH"))
        x = jax.lax.conv_general_dilated(
            x, stem["conv1"]["w"].astype(dt), (1,), [(1, 1)],
            dimension_numbers=dn, preferred_element_type=jnp.float32,
        ).astype(dt) + stem["conv1"]["b"].astype(dt)[None, :, None]
        x = W._gelu(x)
        dn2 = jax.lax.conv_dimension_numbers(
            x.shape, stem["conv2"]["w"].shape, ("NCH", "OIH", "NCH"))
        x = jax.lax.conv_general_dilated(
            x, stem["conv2"]["w"].astype(dt), (2,), [(1, 1)],
            dimension_numbers=dn2, preferred_element_type=jnp.float32,
        ).astype(dt) + stem["conv2"]["b"].astype(dt)[None, :, None]
        x = W._gelu(x)
        return jnp.transpose(x, (0, 2, 1))

    @jax.jit
    def conv_new(stem, mel):
        return W._conv_stem(mel, stem, dt)

    @jax.jit
    def full(params, mel):
        return W.encoder_forward.__wrapped__(params, mel, arch, dt)

    def bench(name, fn, *args, iters=8):
        def run():
            return float(jnp.mean(fn(*args).astype(jnp.float32)))
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

    # Numerical agreement first (bf16: identical math, different assoc.)
    a = np.asarray(conv_old(stem, mel), dtype=np.float32)
    b = np.asarray(conv_new(stem, mel), dtype=np.float32)
    err = float(np.max(np.abs(a - b)))
    log(f"max |old - new| = {err:.3e} (bf16 activations)")

    out = {"max_abs_err": err}
    out["conv_old"] = bench("conv_old", conv_old, stem, mel)
    out["conv_new"] = bench("conv_new", conv_new, stem, mel)
    out["full_encoder_new_stem"] = bench("full_new", full, params, mel)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Encoder decomposition probe: conv stem vs stack; fused-QKV A/B."""

import dataclasses
import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from thewhisper_tpu.config import ARCH_PRESETS
    from thewhisper_tpu.models.whisper import (
        _prec,
        encoder_forward,
        init_params,
    )

    log(f"backend={jax.default_backend()}")
    arch = dataclasses.replace(ARCH_PRESETS["large-v3-turbo"])
    log("init encoder params (bf16)...")
    params = init_params(arch, seed=0, dtype=jnp.bfloat16)
    mel = jax.device_put(jnp.asarray(
        (0.1 * np.random.default_rng(0).standard_normal((32, 128, 3000))
         ).astype(np.float32)))

    out = {}

    def bench(fn, name, n=6):
        t0 = time.time()
        fn()
        log(f"[{name}] compiled+first in {time.time() - t0:.0f}s")
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        ms = statistics.median(ts) * 1e3
        out[name] = round(ms, 1)
        log(f"[{name}] {ms:.1f} ms (min {min(ts)*1e3:.1f})")

    # Conv stem alone.
    @jax.jit
    def stem(params, mel):
        enc = params["encoder"]
        x = mel.astype(jnp.bfloat16)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, enc["conv1"]["w"].shape, ("NCH", "OIH", "NCH"))
        x = jax.lax.conv_general_dilated(
            x, enc["conv1"]["w"], (1,), [(1, 1)], dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16) + enc["conv1"]["b"][None, :, None]
        x = jax.nn.gelu(x, approximate=False)
        dn2 = jax.lax.conv_dimension_numbers(
            x.shape, enc["conv2"]["w"].shape, ("NCH", "OIH", "NCH"))
        x = jax.lax.conv_general_dilated(
            x, enc["conv2"]["w"], (2,), [(1, 1)], dimension_numbers=dn2,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16) + enc["conv2"]["b"][None, :, None]
        return jax.nn.gelu(x, approximate=False)

    bench(lambda: float(jnp.mean(stem(params, mel).astype(jnp.float32))),
          "conv_stem")

    # GELU-only cost over the MLP activation volume (erf on VPU).
    big = jax.device_put(jnp.ones((32, 1500, 5120), jnp.bfloat16))

    @jax.jit
    def gelus(x):
        for _ in range(4):   # 4 "layers" worth per call
            x = jax.nn.gelu(x, approximate=False)
        return x

    bench(lambda: float(jnp.mean(gelus(big).astype(jnp.float32))[None][0]),
          "gelu_exact_4layers_mlpvol")

    # Pure MLP-shaped matmul chain: ideal-compute yardstick.
    w1 = jax.device_put(jnp.ones((1280, 5120), jnp.bfloat16))
    w2 = jax.device_put(jnp.ones((5120, 1280), jnp.bfloat16))
    x0 = jax.device_put(jnp.ones((48000, 1280), jnp.bfloat16))

    @jax.jit
    def mlp_chain(x, w1, w2):
        for _ in range(32):
            x = (x @ w1 @ w2) * jnp.bfloat16(1e-4)
        return x

    bench(lambda: float(jnp.mean(mlp_chain(x0, w1, w2).astype(jnp.float32))),
          "matmul_chain_32x_mlp")

    # Full encoder: fused QKV on vs off.
    for name, env in (("encoder_fuseqkv", "1"), ("encoder_nofuse", "0")):
        os.environ["WHISPER_FUSE_QKV"] = env
        encoder_forward.clear_cache()
        bench(lambda: float(jnp.mean(
            encoder_forward(params, mel, arch, jnp.bfloat16)
            .astype(jnp.float32))), name)

    print(json.dumps(out))


if __name__ == "__main__":
    main()

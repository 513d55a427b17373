"""Encoder perf probe: flash-attention block sizes / scan unroll variants.

Measures encoder_forward at bs=32 x 30 s (the offline RTFx fixed cost)
across env-knob variants. Run on the real TPU with an idle host.
"""

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
    from thewhisper_tpu.models import whisper as W
    from thewhisper_tpu.models.whisper import encoder_forward, init_params

    log(f"backend={jax.default_backend()}")
    arch = dataclasses.replace(ARCH_PRESETS["large-v3-turbo"])
    log("init encoder params (bf16)...")
    t0 = time.time()
    params = init_params(arch, seed=0, dtype=jnp.bfloat16)
    # Keep only what the encoder reads to cut transfer time.
    params = {"encoder": params["encoder"], "decoder": params["decoder"]}
    mel = jax.device_put(jnp.asarray(
        (0.1 * np.random.default_rng(0).standard_normal((32, 128, 3000))
         ).astype(np.float32)))
    log(f"  ready in {time.time() - t0:.0f}s")

    # Block sizes must divide the padded sequence (1536).
    variants = [
        ("flash512x512", {"WHISPER_FLASH_BLOCK": "512,512"}),
        ("flash768x768", {"WHISPER_FLASH_BLOCK": "768,768"}),
        ("flash512x768", {"WHISPER_FLASH_BLOCK": "512,768"}),
        ("flash768x512", {"WHISPER_FLASH_BLOCK": "768,512"}),
        ("flash256x512", {"WHISPER_FLASH_BLOCK": "256,512"}),
        ("flash1536x512", {"WHISPER_FLASH_BLOCK": "1536,512"}),
        ("naive", {"WHISPER_FLASH_ATTENTION": "0"}),
        ("flash512_unroll2", {"WHISPER_FLASH_BLOCK": "512,512",
                              "WHISPER_ENCODER_UNROLL": "2"}),
        ("flash512_unroll4", {"WHISPER_FLASH_BLOCK": "512,512",
                              "WHISPER_ENCODER_UNROLL": "4"}),
    ]
    out = {}
    base_env = {k: os.environ.get(k) for k in
                ("WHISPER_FLASH_BLOCK", "WHISPER_FLASH_ATTENTION",
                 "WHISPER_ENCODER_UNROLL")}
    for name, env in variants:
        for k, v in base_env.items():
            os.environ.pop(k, None)
            if v is not None:
                os.environ[k] = v
        os.environ.update(env)
        encoder_forward.clear_cache()

        # block_until_ready is unreliable over the tunnel: force completion
        # by reducing on device and fetching the scalar (adds one ~25 ms
        # RTT, identical across variants).
        def run():
            return float(jnp.mean(
                encoder_forward(params, mel, arch, jnp.bfloat16)
                .astype(jnp.float32)))

        log(f"[{name}] compiling...")
        t0 = time.time()
        run()
        log(f"  compiled+first in {time.time() - t0:.0f}s")
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        ms = statistics.median(ts) * 1e3
        out[name] = round(ms, 1)
        log(f"[{name}] {ms:.1f} ms (min {min(ts)*1e3:.1f})")

    print(json.dumps(out))


if __name__ == "__main__":
    main()

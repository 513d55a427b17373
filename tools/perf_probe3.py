"""Round-2 re-measure after: tanh GELU (bf16), pad-once encoder,
where-iota cache writes, int8 cross-KV default.

Also validates flash+segment-id numerics vs the naive path on-chip.
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

    from thewhisper_tpu.config import ARCH_PRESETS, GenerationOptions, SpecialTokens
    from thewhisper_tpu.engine import WhisperEngine
    from thewhisper_tpu.models.quant import quantize_params
    from thewhisper_tpu.models.whisper import encoder_forward, init_params

    log(f"backend={jax.default_backend()}")
    out = {}
    rng = np.random.default_rng(0)
    arch = dataclasses.replace(
        ARCH_PRESETS["large-v3-turbo"],
        alignment_heads=((1, 0), (2, 3), (3, 7)))
    log("init params...")
    t0 = time.time()
    raw = init_params(arch, seed=0, dtype=jnp.bfloat16)
    params = quantize_params(raw, components=("decoder",))
    log(f"  ready in {time.time() - t0:.0f}s")

    # --- flash + pad-once numerics vs naive, small batch ------------------
    mel2 = jax.device_put(jnp.asarray(
        (0.1 * rng.standard_normal((2, 128, 3000))).astype(np.float32)))
    e_flash = np.asarray(encoder_forward(raw, mel2, arch, jnp.bfloat16),
                         dtype=np.float32)
    os.environ["WHISPER_FLASH_ATTENTION"] = "0"
    encoder_forward.clear_cache()
    e_naive = np.asarray(encoder_forward(raw, mel2, arch, jnp.bfloat16),
                         dtype=np.float32)
    os.environ.pop("WHISPER_FLASH_ATTENTION")
    encoder_forward.clear_cache()
    err = float(np.max(np.abs(e_flash - e_naive)))
    scale = float(np.max(np.abs(e_naive))) + 1e-9
    out["flash_vs_naive_max_abs"] = round(err, 5)
    out["flash_vs_naive_rel"] = round(err / scale, 5)
    log(f"flash-vs-naive: max abs {err:.4f} (rel {err/scale:.5f})")

    # --- encoder time, bs=32 ----------------------------------------------
    mel32 = jax.device_put(jnp.asarray(
        (0.1 * rng.standard_normal((32, 128, 3000))).astype(np.float32)))

    def enc_run():
        return float(jnp.mean(encoder_forward(
            raw, mel32, arch, jnp.bfloat16).astype(jnp.float32)))

    enc_run()
    ts = [0.0] * 6
    for i in range(6):
        t0 = time.perf_counter()
        enc_run()
        ts[i] = time.perf_counter() - t0
    out["encoder_bs32_ms"] = round(statistics.median(ts) * 1e3, 1)
    log(f"encoder bs=32x30s: {out['encoder_bs32_ms']} ms")

    # --- offline RTFx (int8 cross-KV default path) -------------------------
    eng = WhisperEngine(params, arch, compute_dtype=jnp.bfloat16,
                        batch_buckets=(32,), cross_kv_int8=True,
                        suppress_tokens=[SpecialTokens().eot])
    audio32 = jax.device_put(jnp.asarray(
        (0.1 * rng.standard_normal((32, 30 * 16000))).astype(np.float32)))
    s_opts = GenerationOptions(max_new_tokens=16, language="en")
    l_opts = GenerationOptions(max_new_tokens=144, language="en")
    log("compiling bs=32 generate programs...")
    eng.transcribe_audio(audio32, s_opts)
    eng.transcribe_audio(audio32, l_opts)

    def timed(o, n=6):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            eng.transcribe_audio(audio32, o)
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts)

    t16, t144 = timed(s_opts), timed(l_opts)
    ms_step = (t144 - t16) / 128 * 1e3
    fixed = max(t16 - 16 * ms_step / 1e3, 0.0)
    out["ms_per_step"] = round(ms_step, 2)
    out["fixed_s"] = round(fixed, 3)
    out["rtfx112"] = round(600.0 / (fixed + 112 * ms_step / 1e3), 1)
    out["rtfx224"] = round(600.0 / (fixed + 224 * ms_step / 1e3), 1)
    log(f"bs=32: {ms_step:.2f} ms/step, fixed {fixed*1e3:.0f} ms -> "
        f"RTFx112 {out['rtfx112']}, RTFx224 {out['rtfx224']}")

    print(json.dumps(out))


if __name__ == "__main__":
    main()

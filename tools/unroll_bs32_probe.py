"""Check the decoder-unroll default doesn't regress bs=32 decode.

bs=32 x 30 s, int8 cross-KV; 16/144 differential -> ms/step, unroll 1 vs 4.
Also re-checks the streaming tick (9 s buffer + 32 tok + align, bs=1).
"""

import dataclasses
import json
import os
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

    from thewhisper_tpu.config import ARCH_PRESETS, GenerationOptions, SpecialTokens
    from thewhisper_tpu.engine import WhisperEngine
    from thewhisper_tpu.models.quant import quantize_params
    from thewhisper_tpu.models.whisper import init_params

    log(f"backend={jax.default_backend()}")
    arch = dataclasses.replace(
        ARCH_PRESETS["large-v3-turbo"],
        alignment_heads=((1, 0), (2, 3), (3, 7)))
    dt = jnp.bfloat16
    log("init 30s-bucket params...")
    t0 = time.time()
    params = quantize_params(init_params(arch, seed=0, dtype=dt),
                             components=("decoder",))
    log(f"  ready in {time.time() - t0:.0f}s")
    audio32 = jax.device_put(jnp.asarray(
        (0.1 * np.random.default_rng(0).standard_normal((32, 30 * 16000))
         ).astype(np.float32)))
    s_opts = GenerationOptions(max_new_tokens=16, language="en")
    l_opts = GenerationOptions(max_new_tokens=144, language="en")

    out = {}
    for unroll in (1, 4):
        os.environ["WHISPER_DECODER_UNROLL"] = str(unroll)
        eng = WhisperEngine(params, arch, compute_dtype=dt,
                            batch_buckets=(32,), cross_kv_int8=True,
                            suppress_tokens=[SpecialTokens().eot])
        log(f"[unroll={unroll}] compiling...")
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
        ms = (t144 - t16) / 128 * 1e3
        fixed = max(t16 - 16 * ms / 1e3, 0.0)
        rtfx = 600.0 / (fixed + 112 * ms / 1e3)
        log(f"[unroll={unroll}] {ms:.2f} ms/step, RTFx112 {rtfx:.0f}")
        out[f"bs32_ms_step_unroll{unroll}"] = round(ms, 2)
        out[f"bs32_rtfx112_unroll{unroll}"] = round(rtfx, 0)
        del eng
    os.environ.pop("WHISPER_DECODER_UNROLL", None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

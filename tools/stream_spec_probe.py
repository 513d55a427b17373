"""Streaming tick with cross-tick proposal drafting: A/B on the real chip.

The streaming tick (9 s buffer + 32 tok + align, fused single call)
re-decodes a buffer that changed by one 0.5 s hop — the previous tick's
tokens predict nearly all of the new ones. This probe measures the tick
p50 with and without passing them as speculative proposals
(``transcribe_audio(draft_tokens=...)``), same audio (acceptance = 1 here;
real streams accept slightly less near the moving tail).
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

    from thewhisper_tpu.config import ARCH_PRESETS, GenerationOptions, SpecialTokens
    from thewhisper_tpu.engine import WhisperEngine
    from thewhisper_tpu.models.quant import quantize_params
    from thewhisper_tpu.models.whisper import init_params

    log(f"backend={jax.default_backend()}")
    arch = dataclasses.replace(
        ARCH_PRESETS["large-v3-turbo"], max_source_positions=500,
        alignment_heads=((1, 0), (2, 3), (3, 7)))
    dt = jnp.bfloat16
    log("init turbo int8 params...")
    t0 = time.time()
    params = quantize_params(init_params(arch, seed=0, dtype=dt),
                             components=("decoder",))
    log(f"  ready in {time.time() - t0:.0f}s")

    eng = WhisperEngine(
        params, arch, compute_dtype=dt, batch_buckets=(1,),
        suppress_tokens=[SpecialTokens().eot])
    rng = np.random.default_rng(0)
    buf = (0.1 * rng.standard_normal(9 * 16000)).astype(np.float32)
    audio = np.zeros((1, 10 * 16000), np.float32)
    audio[0, : len(buf)] = buf
    opts = GenerationOptions(max_new_tokens=32, language="en",
                             return_timestamps=True)

    log("compiling plain tick program...")
    res = eng.transcribe_audio(audio, opts)
    prev = np.asarray(res.tokens[:, res.prompt_len:], np.int32)
    log("compiling proposal tick program...")
    eng.transcribe_audio(audio, opts, draft_tokens=prev)

    def p50(fn, n=20):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts) * 1e3

    plain = p50(lambda: eng.transcribe_audio(audio, opts))
    spec = p50(lambda: eng.transcribe_audio(audio, opts, draft_tokens=prev))
    log(f"tick p50 plain: {plain:.1f} ms  |  with cross-tick proposals: "
        f"{spec:.1f} ms ({plain - spec:+.1f} ms)")
    # Sanity: same tokens either way (greedy-exact property).
    r2 = eng.transcribe_audio(audio, opts, draft_tokens=prev)
    same = bool(np.array_equal(
        np.asarray(r2.tokens[:, r2.prompt_len:], np.int32), prev))
    log(f"tokens identical to plain: {same}")
    print(json.dumps({"tick_p50_plain_ms": round(plain, 1),
                      "tick_p50_spec_ms": round(spec, 1),
                      "tokens_identical": same}))


if __name__ == "__main__":
    main()

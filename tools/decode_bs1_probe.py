"""bs=1 decode-throughput variants (the headline metric).

Differential 16-vs-144-token timing (bench.py methodology) over:
- int8 decoder + int8 embedding (current "S" headline)
- + decoder layer-scan unroll=4 (WHISPER_DECODER_UNROLL)

bs=1 decode is weight-bandwidth-bound (~171 MB int8 reads/step -> 0.21 ms
floor at 819 GB/s; measured 0.34 ms = 62%); unroll targets per-step op
overheads. int4 was probed and dropped: native jnp.int4 cannot cross the
axon tunnel (plugin RecursionError on transfer), and nibble-packed int8
with in-graph unpack measured SLOWER than int8 (the unpack's
stack+reshape materializes; tools/int4_pack_probe.py).
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
        ARCH_PRESETS["large-v3-turbo"], max_source_positions=500,
        alignment_heads=((1, 0), (2, 3), (3, 7)))
    dt = jnp.bfloat16
    log("init turbo params...")
    t0 = time.time()
    base = init_params(arch, seed=0, dtype=dt)
    p8 = quantize_params(base, components=("decoder",))
    log(f"  ready in {time.time() - t0:.0f}s")
    mel = np.asarray(
        0.1 * np.random.default_rng(0).standard_normal((1, 128, 1000)),
        np.float32)

    short = GenerationOptions(max_new_tokens=16, language="en")
    long_ = GenerationOptions(max_new_tokens=144, language="en")

    def tok_s(params, unroll):
        os.environ["WHISPER_DECODER_UNROLL"] = str(unroll)
        eng = WhisperEngine(params, arch, compute_dtype=dt,
                            batch_buckets=(1,),
                            suppress_tokens=[SpecialTokens().eot])
        eng.transcribe_features(mel, short)
        eng.transcribe_features(mel, long_)

        def timed(o, iters=8):
            ts = []
            r = None
            for _ in range(iters):
                t0 = time.perf_counter()
                r = eng.transcribe_features(mel, o)
                ts.append(time.perf_counter() - t0)
            return statistics.median(ts), r

        ts_, rs = timed(short)
        tl, rl = timed(long_)
        n = int(rl.num_generated[0]) - int(rs.num_generated[0])
        return n / max(tl - ts_, 1e-9)

    out = {}
    for name, params, unroll in [
        ("int8_unroll1", p8, 1),
        ("int8_unroll4", p8, 4),
    ]:
        log(f"[{name}] compiling + timing...")
        v = tok_s(params, unroll)
        log(f"[{name}] {v:.0f} tok/s")
        out[name] = round(v, 0)
    os.environ.pop("WHISPER_DECODER_UNROLL", None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

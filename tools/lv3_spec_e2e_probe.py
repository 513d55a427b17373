"""large-v3 two-model speculation measured END TO END (round-3 review #3).

Round 3 left the large-v3 draft story as a cost model: verify 0.92x a
plain step, 4-layer draft 0.11x, "2.5x at an ASSUMED 80% acceptance".
This probe replaces the assumption with device measurements:

1. **Raw layer-skip draft** (target's first N decoder layers, zero
   training): speculative vs plain engines timed INTERLEAVED with the
   16/144 differential; acceptance = device-counted tokens/round
   (EngineResult.spec_rounds).
2. **Distilled draft**: the same student trained against the (frozen,
   bf16) target's logits on the target's OWN greedy outputs over noise
   audio — the decode-time distribution — via training/distill.py.
   Teacher-forced greedy agreement and the end-to-end speculative
   numbers are re-measured at checkpoints, giving a REAL
   acceptance-vs-training curve on this hardware.

With random weights the absolute acceptance says nothing about real
checkpoints — what this measures is the MACHINERY (two-model programs,
device round counting, distillation loop) and the speedup-vs-acceptance
transfer curve, which is weight-independent arithmetic the bench's cost
model can be checked against.

Usage: python tools/lv3_spec_e2e_probe.py [--layers 4] [--steps 60]
       [--batch 4] [--window 4]
"""

import argparse
import dataclasses
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_spec(eng_plain, eng_spec, mel, short_opts, long_opts, iters=6):
    """Interleaved plain-vs-speculative 16/144 differential; returns
    (plain tok/s, spec tok/s, tok/round, rounds_s, rounds_l)."""
    med = statistics.median
    P_s, P_l, N_s, N_l = [], [], [], []
    r_s = r_l = None
    for _ in range(iters):
        t0 = time.perf_counter(); eng_plain.transcribe_features(mel, short_opts)
        P_s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); eng_plain.transcribe_features(mel, long_opts)
        P_l.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); r_s = eng_spec.transcribe_features(mel, short_opts)
        N_s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); r_l = eng_spec.transcribe_features(mel, long_opts)
        N_l.append(time.perf_counter() - t0)
    emitted = int(r_l.num_generated[0]) - int(r_s.num_generated[0])
    plain = emitted / max(med(P_l) - med(P_s), 1e-9)
    spec = emitted / max(med(N_l) - med(N_s), 1e-9)
    d_rounds = max(r_l.spec_rounds - r_s.spec_rounds, 1)
    return plain, spec, emitted / d_rounds, r_s.spec_rounds, r_l.spec_rounds


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--window", type=int, default=4)
    ap.add_argument("--gen-tokens", type=int, default=32,
                    help="teacher greedy tokens per training sample")
    ap.add_argument("--checkpoints", default="0,20,60",
                    help="distill step counts at which to re-measure")
    ap.add_argument("--save", default=None,
                    help="save the final distilled draft npz here")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from thewhisper_tpu.audio.features import LogMelFeaturizer
    from thewhisper_tpu.config import (
        ARCH_PRESETS, GenerationOptions, SpecialTokens,
    )
    from thewhisper_tpu.engine import WhisperEngine
    from thewhisper_tpu.engine.speculative import (
        make_layer_skip_draft, save_draft,
    )
    from thewhisper_tpu.models.quant import quantize_params
    from thewhisper_tpu.models.whisper import init_params_device
    from thewhisper_tpu.training.distill import (
        greedy_agreement, init_distill_state, make_distill_step,
    )

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    dt = jnp.bfloat16
    arch = dataclasses.replace(
        ARCH_PRESETS["large-v3"], max_source_positions=500,
        alignment_heads=((7, 0), (14, 3), (28, 7)))
    log("initializing large-v3 bf16 on device...")
    t0 = time.time()
    params_bf = init_params_device(arch, seed=0, dtype=dt)
    params_s = quantize_params(params_bf, components=("decoder",))
    log(f"  init+quant {time.time() - t0:.0f}s")

    sp = SpecialTokens()
    eng_plain = WhisperEngine(
        params_s, arch, compute_dtype=dt, batch_buckets=(1,),
        suppress_tokens=[sp.eot])
    featurizer = LogMelFeaturizer(n_mels=arch.n_mels, chunk_length_s=10.0)
    rng = np.random.default_rng(0)
    mel = np.asarray(featurizer(
        (0.1 * rng.standard_normal(10 * 16000)).astype(np.float32)),
        np.float32)
    short_opts = GenerationOptions(max_new_tokens=16, language="en")
    long_opts = GenerationOptions(max_new_tokens=144, language="en")
    log("compiling plain large-v3 programs...")
    eng_plain.transcribe_features(mel, short_opts)
    eng_plain.transcribe_features(mel, long_opts)

    # Teacher-forced training batches: mel from fresh noise, tokens =
    # prompt + the TARGET's own greedy continuation (the decode-time
    # distribution the draft must match).
    gen_opts = GenerationOptions(max_new_tokens=args.gen_tokens,
                                 language="en")
    eng_gen = WhisperEngine(
        params_s, arch, compute_dtype=dt, batch_buckets=(args.batch,),
        suppress_tokens=[sp.eot])

    def make_batch(seed):
        r = np.random.default_rng(seed)
        audio = (0.1 * r.standard_normal((args.batch, 10 * 16000))
                 ).astype(np.float32)
        m = np.asarray(featurizer(audio), np.float32)
        res = eng_gen.transcribe_features(m, gen_opts)
        tokens = np.asarray(
            res.tokens[:, : res.prompt_len + args.gen_tokens], np.int32)
        return {"mel": jnp.asarray(m), "tokens": jnp.asarray(tokens)}

    log("building layer-skip draft + distill machinery...")
    student, d_arch = make_layer_skip_draft(
        {"decoder": params_bf["decoder"]}, arch, args.layers)
    state, tx = init_distill_state(student, learning_rate=3e-5)
    dstep = make_distill_step(d_arch, arch, tx, compute_dtype=dt)
    agree_fn = None

    teacher = {"encoder": params_bf["encoder"],
               "decoder": params_bf["decoder"]}

    def measure(tag, draft_params):
        # Spec engine wants the INT8 target (deployment shape) + this
        # draft; draft leaves ride at compute dtype.
        dp = jax.tree.map(
            lambda a: (a.astype(dt)
                       if jnp.issubdtype(a.dtype, jnp.floating) else a),
            draft_params)
        eng_spec = WhisperEngine(
            params_s, arch, compute_dtype=dt, batch_buckets=(1,),
            suppress_tokens=[sp.eot], draft_params=dp, draft_arch=d_arch,
            spec_window=args.window)
        eng_spec.transcribe_features(mel, short_opts)
        eng_spec.transcribe_features(mel, long_opts)
        plain, spec, tpr, rs, rl = measure_spec(
            eng_plain, eng_spec, mel, short_opts, long_opts)
        log(f"{tag}: plain {plain:.0f} tok/s, spec {spec:.0f} tok/s "
            f"({spec / max(plain, 1e-9):.2f}x) at {tpr:.2f} tok/round "
            f"(device rounds {rs}/{rl})")
        del eng_spec
        return spec, tpr

    checkpoints = sorted(int(c) for c in args.checkpoints.split(","))
    results = {}
    eval_batch = make_batch(10_000)
    done = 0
    for target_steps in checkpoints:
        while done < target_steps:
            batch = make_batch(done)
            state, loss = dstep(state, {"decoder": teacher["decoder"],
                                        "encoder": teacher["encoder"]},
                                batch)
            done += 1
            if done % 10 == 0:
                log(f"  distill step {done}: loss {float(loss):.4f}")
        draft = state.student
        if agree_fn is None:
            agree_fn = jax.jit(lambda s, t, b: greedy_agreement(
                s, t, b, d_arch, arch, dt))
        agree = float(agree_fn(draft, teacher, eval_batch))
        log(f"steps={done}: teacher-forced greedy agreement {agree:.3f}")
        spec, tpr = measure(f"distilled@{done}", draft)
        results[done] = (agree, spec, tpr)

    for k, (agree, spec, tpr) in results.items():
        log(f"SUMMARY steps={k}: agreement {agree:.3f}, "
            f"{spec:.0f} tok/s at {tpr:.2f} tok/round")
    if args.save:
        save_draft(args.save, state.student, d_arch)
        log(f"saved distilled draft to {args.save}")


if __name__ == "__main__":
    main()

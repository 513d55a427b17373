"""Dump + diff the compiled HLO of the ngram vs proposal spec programs.

tools/spec_round_probe.py established with DEVICE round counts that an
ngram round costs ~0.63 ms vs ~0.20 ms for a proposal round, while the
bigram lookup math is ~1.5 us standalone — so ~0.4 ms/round comes from
how XLA *lowers* the lookup inside the while loop, not from the math.
This probe compiles decode-only variants (prefill + speculative loop,
no encoder) for the real TPU backend and dumps optimized HLO so the
loop bodies can be diffed: look for copies/fusions present only in the
ngram body, or loop-invariant work (e.g. the one-hot alignment einsum,
the suppress add) that sinks INTO the loop when drafts depend on the
token carry.

Usage: python tools/spec_hlo_probe.py [--out /tmp/spec_hlo]
Writes <out>_{ngram,prop}.txt and prints a per-opcode histogram of each
program's largest while-body computation.
"""

import argparse
import dataclasses
import os
import re
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def body_histogram(text: str):
    """Opcode + big-shape histogram of the largest while-body computation."""
    comps = {}
    cur = None
    for line in text.splitlines():
        m = re.match(r"^%?([\w\.\-]+)\s*(?:\([^)]*\))?\s*(?:->|\{)", line)
        if line and not line.startswith(" ") and "{" in line:
            name = line.split()[0].lstrip("%")
            cur = name
            comps[cur] = []
        elif cur and line.strip() and "=" in line:
            comps[cur].append(line.strip())
    bodies = {k: v for k, v in comps.items() if "body" in k}
    if not bodies:
        return None, None
    name, ops = max(bodies.items(), key=lambda kv: len(kv[1]))
    hist = Counter()
    for op in ops:
        m = re.search(r"=\s+[\w\[\],:\{\} ]*?\s*([a-z\-]+)\(", op)
        opc = m.group(1) if m else "?"
        hist[opc] += 1
    return name, hist


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/spec_hlo")
    ap.add_argument("--window", type=int, default=4)
    ap.add_argument("--max-new", type=int, default=144)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from thewhisper_tpu.config import ARCH_PRESETS, SpecialTokens
    from thewhisper_tpu.engine.decode import suppress_mask
    from thewhisper_tpu.engine.speculative import speculative_decode
    from thewhisper_tpu.models.quant import quantize_params
    from thewhisper_tpu.models.whisper import init_params, make_cache

    print(f"backend={jax.default_backend()}", flush=True)
    arch = dataclasses.replace(
        ARCH_PRESETS["large-v3-turbo"],
        max_source_positions=500,
        alignment_heads=((1, 0), (2, 3), (3, 7)),
    )
    sp = SpecialTokens()
    params = quantize_params(
        init_params(arch, seed=0, dtype=jnp.bfloat16),
        components=("decoder",))
    w, max_new, b, p = args.window, args.max_new, 1, 4
    s_cap = p + max_new + w + 1
    l, h, dh = arch.decoder_layers, arch.decoder_heads, arch.head_dim
    t_enc = arch.max_source_positions
    sup = jnp.asarray(suppress_mask(arch.vocab_size, [sp.eot]))

    rng = np.random.default_rng(0)
    ck = jnp.asarray(rng.standard_normal((l, b, h, dh, t_enc)), jnp.bfloat16)
    cv = jnp.asarray(rng.standard_normal((l, b, h, dh, t_enc)), jnp.bfloat16)
    prompt = jnp.asarray([[sp.sot, sp.first_language, sp.transcribe,
                           sp.no_timestamps]], jnp.int32)

    def run(ngram, props):
        def prog(params, prompt, ck, cv, proposal):
            cache = make_cache(arch, b, s_cap, ck, cv, dtype=jnp.bfloat16)
            res = speculative_decode(
                params, arch, None, None, prompt, cache, None,
                max_new, sp.eot, spec_window=w, suppress=sup,
                compute_dtype=jnp.bfloat16, no_speech_id=sp.no_speech,
                ngram_draft=ngram, proposal_tokens=proposal)
            return res.tokens, res.rounds
        return jax.jit(prog).lower(
            params, prompt, ck, cv,
            (jnp.zeros((b, max_new + w), jnp.int32) if props else None)
        ).compile()

    for name, ngram, props in (("ngram", True, False), ("prop", False, True)):
        print(f"compiling {name}...", flush=True)
        c = run(ngram, props)
        text = c.as_text()
        path = f"{args.out}_{name}.txt"
        with open(path, "w") as f:
            f.write(text)
        print(f"{name}: {len(text.splitlines())} HLO lines -> {path}",
              flush=True)
        bname, hist = body_histogram(text)
        if hist:
            print(f"  largest while body: {bname}")
            for opc, n in hist.most_common(24):
                print(f"    {opc:28s} {n}")
        try:
            ca = c.cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            print(f"  cost_analysis: flops={ca.get('flops', 0):.3e} "
                  f"bytes={ca.get('bytes accessed', 0):.3e}", flush=True)
        except Exception as e:
            print(f"  (no cost analysis: {e})", flush=True)


if __name__ == "__main__":
    main()

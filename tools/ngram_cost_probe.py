"""Where do the ~0.31 ms/round of ngram-draft overhead go?

RESOLVED (see tools/spec_ab_probe.py): nowhere — the overhead was a
measurement artifact (host-simulated round counts + non-interleaved
timing on a drifting tunnel). This probe's finding stands: the lookup
math is ~1.5 us standalone, consistent with the final interleaved
measurement that an ngram round costs the same as a plain step.

spec_honesty_probe measured an all-wrong PROPOSAL round at 0.281 ms but
an ngram round at ~0.594 ms — the difference is ngram_propose (the
on-device bigram lookup) plus whatever its lowering drags in. This probe
times the candidate pieces standalone (fori_loop differential, carry
threaded through each op so nothing is DCE'd):

- the full ngram_propose computation on a (1, S) token buffer;
- its gather alone (take_along_axis with dynamic rows — TPU gathers can
  lower to one-hot matmuls);
- a gather-free variant: one-hot matmul row select (explicit), and
  a where/iota select;
- the hit-scan (comparisons + argmax) alone.

If the gather dominates and the one-hot matmul variant is cheap, the
lookup in engine/speculative.py::ngram_propose should switch — cutting
the ngram round toward the 1.19x-a-step proposal round and moving the
win threshold from ~2.6 tokens/round toward ~1.5 (natural English runs
1.53: break-even instead of 0.6x).

Usage: python tools/ngram_cost_probe.py [--sbuf 160] [--iters 3]
"""

import argparse
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 256


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sbuf", type=int, default=160)
    ap.add_argument("--window", type=int, default=5)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print(f"backend={jax.default_backend()}", flush=True)
    s_buf, w, b = args.sbuf, args.window, 1
    rng = np.random.default_rng(0)
    tokens0 = jnp.asarray(rng.integers(0, 50000, (b, s_buf)), jnp.int32)

    def ngram_full(tokens_buf, feed_pos):
        prev = jnp.take_along_axis(
            tokens_buf, jnp.maximum(feed_pos - 1, 0)[:, None], axis=1)
        w0 = jnp.take_along_axis(tokens_buf, feed_pos[:, None], axis=1)
        nxt = jnp.concatenate(
            [tokens_buf[:, 1:], jnp.zeros((b, 1), jnp.int32)], axis=1)
        j = jnp.arange(s_buf)[None, :]
        hit = ((tokens_buf == prev) & (nxt == w0)
               & (j + 1 < feed_pos[:, None]) & (j > 0))
        has = jnp.any(hit, axis=1)
        j_sel = jnp.argmax(jnp.where(hit, j, -1), axis=1)
        start = jnp.where(has, j_sel + 2, feed_pos)
        rows = jnp.clip(start[:, None] + jnp.arange(w)[None, :], 0, s_buf - 1)
        return jnp.take_along_axis(tokens_buf, rows, axis=1)

    def gather_only(tokens_buf, feed_pos):
        rows = jnp.clip(feed_pos[:, None] + jnp.arange(w)[None, :],
                        0, s_buf - 1)
        return jnp.take_along_axis(tokens_buf, rows, axis=1)

    def onehot_select(tokens_buf, feed_pos):
        rows = jnp.clip(feed_pos[:, None] + jnp.arange(w)[None, :],
                        0, s_buf - 1)                      # (B, W)
        oh = (rows[:, :, None] == jnp.arange(s_buf)[None, None, :])
        return jnp.einsum("bws,bs->bw", oh.astype(jnp.int32), tokens_buf)

    def hitscan_only(tokens_buf, feed_pos):
        prev = jnp.take_along_axis(
            tokens_buf, jnp.maximum(feed_pos - 1, 0)[:, None], axis=1)
        w0 = jnp.take_along_axis(tokens_buf, feed_pos[:, None], axis=1)
        nxt = jnp.concatenate(
            [tokens_buf[:, 1:], jnp.zeros((b, 1), jnp.int32)], axis=1)
        j = jnp.arange(s_buf)[None, :]
        hit = ((tokens_buf == prev) & (nxt == w0)
               & (j + 1 < feed_pos[:, None]) & (j > 0))
        j_sel = jnp.argmax(jnp.where(hit, j, -1), axis=1)
        return j_sel[:, None] + jnp.zeros((b, w), jnp.int32)

    def ngram_onehot(tokens_buf, feed_pos):
        prev = jnp.take_along_axis(
            tokens_buf, jnp.maximum(feed_pos - 1, 0)[:, None], axis=1)
        w0 = jnp.take_along_axis(tokens_buf, feed_pos[:, None], axis=1)
        nxt = jnp.concatenate(
            [tokens_buf[:, 1:], jnp.zeros((b, 1), jnp.int32)], axis=1)
        j = jnp.arange(s_buf)[None, :]
        hit = ((tokens_buf == prev) & (nxt == w0)
               & (j + 1 < feed_pos[:, None]) & (j > 0))
        has = jnp.any(hit, axis=1)
        j_sel = jnp.argmax(jnp.where(hit, j, -1), axis=1)
        start = jnp.where(has, j_sel + 2, feed_pos)
        rows = jnp.clip(start[:, None] + jnp.arange(w)[None, :], 0, s_buf - 1)
        oh = (rows[:, :, None] == jnp.arange(s_buf)[None, None, :])
        return jnp.einsum("bws,bs->bw", oh.astype(jnp.int32), tokens_buf)

    variants = [("ngram_full (current)", ngram_full),
                ("gather only", gather_only),
                ("one-hot select only", onehot_select),
                ("hit-scan only", hitscan_only),
                ("ngram one-hot select", ngram_onehot)]

    def bench(fn):
        def loop(n_steps, tok):
            def body(i, c):
                t, acc = c
                fp = jnp.full((b,), 20, jnp.int32) + (i % 64).astype(jnp.int32)
                d = fn(t, fp)
                # fold the result back into the buffer so iterations chain
                t = t.at[:, :w].set(d)
                return (t, acc + jnp.sum(d))
            return jax.lax.fori_loop(0, n_steps, body, (tok, jnp.int32(0)))[1]

        jl = jax.jit(loop, static_argnums=0)
        np.asarray(jl(N, tokens0)); np.asarray(jl(3 * N, tokens0))
        t1 = []
        t3 = []
        for _ in range(args.iters):
            t0 = time.perf_counter(); np.asarray(jl(N, tokens0))
            t1.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); np.asarray(jl(3 * N, tokens0))
            t3.append(time.perf_counter() - t0)
        return (statistics.median(t3) - statistics.median(t1)) / (2 * N) * 1e6

    for name, fn in variants:
        us = bench(fn)
        print(f"{name:24s}: {us:8.2f} us/iter", flush=True)


if __name__ == "__main__":
    main()

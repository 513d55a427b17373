"""Speculative greedy decoding: draft k tokens cheaply, verify in one pass.

The bs=1 decode loop is weight-bandwidth-bound (~171 MB of int8 weights per
step on turbo; benchmark/README.md) — the MXU is idle while HBM streams
weights. Speculative decoding converts that slack into tokens: a small
draft model proposes ``spec_window`` tokens autoregressively, then the
target model scores the whole window in ONE weight read
(``models.whisper.decoder_verify``) and accepts the longest prefix that
matches its own greedy choices, plus one corrected "bonus" token. Output
is **greedy-equivalent for any draft** — the draft only controls speed,
never content (bit-exact in f32, tests/test_speculative.py). One honest
caveat: the verify pass computes the same math as the single-token step
with different matmul shapes, so in bf16 the logits differ by ULPs and a
near-tied argmax can resolve differently — the same nondeterminism class
as changing the batch size. Measured on a real v5e with device round
counts and interleaved A/B timing (tools/spec_ab_probe.py): a lookup
round costs ~1.0x a single step (0.80-1.18 across runs), and free ngram
drafting gives 3.4-4.6x end-to-end at bs=1 on repetitive output
(two-tier rule, W=4; W=8 reaches 5.57 tok/round at the same round cost).

The reference has no analog (its per-token host round trip,
``apple/model.py:155-255``, makes multi-token verification moot); this is
a TPU-native extension. Draft options:

- a separate small checkpoint sharing the encoder (distil-whisper style:
  same encoder, 2-layer decoder) — own params/arch, own cross-KV;
- a layer-skip self-draft (``make_layer_skip_draft``): the first N layers
  of the target decoder + its final LN/embedding, zero extra weights.

Everything runs inside one ``lax.while_loop``: per-sample positions (each
batch row accepts a different number of drafts per round) are handled by
``decoder_verify``'s masked one-hot cache writes, so no host sync or
dynamic shape ever appears.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from thewhisper_tpu.config import WhisperArch
from thewhisper_tpu.engine.decode import GreedyResult
from thewhisper_tpu.models.whisper import (
    DecodeCache,
    decoder_prefill,
    decoder_verify,
)


def make_layer_skip_draft(params: Dict[str, Any], arch: WhisperArch,
                          n_layers: int):
    """Draft = first ``n_layers`` of the target decoder (early exit).

    Returns (draft_params, draft_arch). The embedding/LN leaves are shared
    with the target; the sliced layer stacks materialize as new arrays
    (JAX has no views), so the first N layers' weights are duplicated in
    HBM — small for shallow drafts. Quality note: the early-exit logits
    go through the target's final LN/embedding without any adaptation,
    which works well on distilled/turbo models whose residual stream
    converges early; measure acceptance on real weights before relying on
    it.
    """
    import dataclasses

    dec = params["decoder"]
    layers = {k: jax.tree.map(lambda a: a[:n_layers], v)
              for k, v in dec["layers"].items()}
    draft_dec = dict(dec)
    draft_dec["layers"] = layers
    draft_params = dict(params)
    draft_params["decoder"] = draft_dec
    # Alignment heads beyond the kept layers would index out of bounds of
    # the sliced stack; the draft never produces alignment anyway.
    heads = tuple((l, h) for l, h in arch.alignment_heads if l < n_layers)
    draft_arch = dataclasses.replace(
        arch, decoder_layers=n_layers, alignment_heads=heads)
    return draft_params, draft_arch


def save_draft(path: str, draft_params: Dict[str, Any],
               draft_arch: WhisperArch) -> None:
    """Persist a (possibly distilled) decoder-only draft as one ``.npz``
    plus the arch fields — the lightweight companion format to the HF
    checkpoint layout (a draft has no encoder to ship)."""
    import dataclasses
    import json

    import numpy as np

    flat = {}

    def walk(prefix, tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(tree)

    walk("", {"decoder": draft_params["decoder"]})
    np.savez(path if path.endswith(".npz") else path + ".npz", **flat)
    meta = dataclasses.asdict(draft_arch)
    with open((path[:-4] if path.endswith(".npz") else path) + ".json",
              "w") as f:
        json.dump(meta, f)


def load_draft(path: str):
    """Inverse of :func:`save_draft` -> (draft_params, draft_arch)."""
    import json

    import numpy as np

    from thewhisper_tpu.config import WhisperArch

    npz = path if path.endswith(".npz") else path + ".npz"
    with np.load(npz) as z:
        tree: Dict[str, Any] = {}
        for key in z.files:
            node = tree
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(z[key])
    with open((path[:-4] if path.endswith(".npz") else path) + ".json") as f:
        meta = json.load(f)
    meta["alignment_heads"] = tuple(
        tuple(h) for h in meta.get("alignment_heads", ()))
    return tree, WhisperArch(**meta)


class _Carry(NamedTuple):
    tokens: jnp.ndarray      # (B, S_buf)
    n_acc: jnp.ndarray       # (B,) generated tokens accepted so far
    done: jnp.ndarray        # (B,)
    self_k: jnp.ndarray      # target decoder self-cache
    self_v: jnp.ndarray
    d_self_k: jnp.ndarray    # draft decoder self-cache
    d_self_v: jnp.ndarray
    align: jnp.ndarray
    sum_lp: jnp.ndarray
    token_lp: jnp.ndarray    # (B, max_new + W + 1)
    rounds: jnp.ndarray      # scalar int32: verify rounds executed


def speculative_decode(
    params,
    arch: WhisperArch,
    draft_params,
    draft_arch: Optional[WhisperArch],
    prompt: jnp.ndarray,              # (B, P) int32
    cache: DecodeCache,               # sized >= P + max_new + W + 1 slots
    draft_cache: Optional[DecodeCache],  # same sizing, draft geometry
    max_new_tokens: int,
    eot: int,
    spec_window: int = 4,
    suppress: Optional[jnp.ndarray] = None,
    begin_suppress: Optional[jnp.ndarray] = None,
    capture_alignment: bool = False,
    compute_dtype: jnp.dtype = jnp.float32,
    no_speech_id: Optional[int] = None,
    ngram_draft: bool = False,
    proposal_tokens: Optional[jnp.ndarray] = None,   # (B, >=max_new) int32
) -> GreedyResult:
    """Greedy decode via draft-and-verify; output == ``greedy_decode``.

    Each loop round: the draft proposes W tokens, the target scores the
    window ``[newest_accepted, d_1..d_W]`` in one ``decoder_verify`` pass,
    the longest matching prefix (m tokens) is accepted and the target's
    own argmax at the first mismatch becomes the bonus token — so every
    round advances 1..W+1 tokens and every emitted token is exactly the
    target's greedy choice.

    ``ngram_draft=True`` drafts by prompt lookup instead of a model: the
    continuation of an earlier occurrence of the current bigram in the
    generated prefix (two-tier rule — see ngram_propose). Zero extra
    weights, zero extra cache; a lookup round costs ~1.0x a plain step
    measured with device round counts + interleaved timing
    (tools/spec_ab_probe.py) — so it can never meaningfully lose, and
    wins whenever speech repeats (refrains, hesitations, hallucination
    loops: 3.4-4.6x measured at W=4). ``draft_params`` /
    ``draft_arch`` / ``draft_cache`` are ignored and may be None.

    ``proposal_tokens`` drafts from an externally supplied expected
    continuation instead (row i = the guessed i-th generated token). The
    killer use is streaming re-transcription: each tick re-decodes a
    rolling buffer that changed by ~0.5 s, so the PREVIOUS tick's output
    predicts almost every token — acceptance is near 1 and the decode
    cost collapses to a few verify passes. Takes precedence over
    ``ngram_draft``; also model-free.
    """
    w = spec_window
    b, p = prompt.shape
    s_buf = cache.self_k.shape[4]
    assert s_buf >= p + max_new_tokens + w + 1, (
        f"cache has {s_buf} slots; speculative needs "
        f"{p + max_new_tokens + w + 1}")
    ck = cache.cross_k
    t_enc = (ck["q"] if isinstance(ck, dict) else ck).shape[4]
    n_align = max(1, len(arch.alignment_heads))
    lp_buf = max_new_tokens + w + 1

    model_free = ngram_draft or proposal_tokens is not None
    if proposal_tokens is not None:
        # Index by generated position; pad so any in-loop gather is safe.
        proposal_tokens = jnp.pad(
            proposal_tokens.astype(jnp.int32),
            ((0, 0), (0, max(0, max_new_tokens + w - proposal_tokens.shape[1]))))

    logits_p, cache, align_p = decoder_prefill(
        params, prompt, cache, arch, compute_dtype)
    if model_free:
        z = jnp.zeros((1,), compute_dtype)
        draft_cache = DecodeCache(z, z, z, z)     # unused placeholder carry
    else:
        _, draft_cache, _ = decoder_prefill(
            draft_params, prompt, draft_cache, draft_arch, compute_dtype)

    # bs=1 int8-S targets route the verify pass through the verify
    # megakernel (ops/mega_step.py::mega_decoder_verify — the W extra
    # query rows ride one HBM weight stream), carrying SLOT-MAJOR
    # (L, S, D) target self K/V. Alignment capture needs the full cross
    # prob map, which the kernel's flash pass never materializes, so
    # those decodes stay on the XLA verify.
    from thewhisper_tpu.ops.mega_step import (
        MEGA_KEY,
        ensure_verify_smalls,
        mega_decoder_verify,
        mega_enabled,
        mega_pays,
        prepare_mega_cache,
    )

    dec_tree = params.get("decoder") if isinstance(params, dict) else None
    # w + 1 <= 16 bounds the kernel's VMEM row transients (two sublane
    # tiles); wider windows fall back to the XLA verify instead of
    # risking a vmem OOM at compile (ADVICE r4: the old unguarded path
    # crashed at trace for w + 1 > 8).
    use_mega = (b == 1
                and compute_dtype == jnp.bfloat16
                and not capture_alignment
                and w + 1 <= 16
                and isinstance(dec_tree, dict) and MEGA_KEY in dec_tree
                and isinstance(cache.cross_k, dict)
                and mega_pays(arch)
                and mega_enabled())
    if use_mega:
        t_self_k0, t_self_v0, mega_cross = prepare_mega_cache(cache)
        # Hoist the (L, WP, NS) scale tile OUT of the while_loop: done
        # here it is a loop-invariant closure constant; left to the
        # kernel's fallback it re-materializes every verify round.
        params = ensure_verify_smalls(params, w + 1)
    else:
        t_self_k0, t_self_v0, mega_cross = cache.self_k, cache.self_v, None

    if capture_alignment:
        align_buf = jnp.zeros((b, n_align, s_buf, t_enc), jnp.float32)
        align_buf = jax.lax.dynamic_update_slice(
            align_buf, jnp.transpose(align_p, (0, 2, 1, 3)), (0, 0, 0, 0))
    else:
        align_buf = jnp.zeros((b, 1, 1, 1), jnp.float32)

    def masked(x, is_first):
        if suppress is not None:
            x = x + suppress
        if begin_suppress is not None and is_first:
            x = x + begin_suppress
        return x

    x0 = masked(logits_p[:, -1], True)
    first_tok = jnp.argmax(x0, axis=-1).astype(jnp.int32)
    first_lp = jnp.take_along_axis(
        jax.nn.log_softmax(x0, axis=-1), first_tok[:, None], axis=-1)[:, 0]

    if no_speech_id is not None:
        no_speech_prob = jax.nn.softmax(
            logits_p[:, 0], axis=-1)[:, no_speech_id]
    else:
        no_speech_prob = jnp.zeros((b,), jnp.float32)

    tokens = jnp.zeros((b, s_buf), jnp.int32)
    tokens = jax.lax.dynamic_update_slice(
        tokens, prompt.astype(jnp.int32), (0, 0))
    tokens = tokens.at[:, p].set(first_tok)
    done0 = (first_tok == eot) | (max_new_tokens <= 1)
    token_lp0 = jnp.zeros((b, lp_buf), jnp.float32).at[:, 0].set(first_lp)
    sum_lp0 = jnp.where(first_tok == eot, 0.0, first_lp)

    cross_k, cross_v = cache.cross_k, cache.cross_v          # loop invariant
    d_cross_k, d_cross_v = draft_cache.cross_k, draft_cache.cross_v

    def ngram_propose(tokens_buf, feed_pos, w0):
        """Prompt-lookup draft: continuation of an earlier occurrence of
        the (prev, current) bigram. (B, W) proposals.

        Two-tier selection: prefer the most recent hit whose W-token
        continuation is FULLY below the write frontier; fall back to the
        most recent hit overall (whose continuation partially crosses
        into unwritten zeros). The naive most-recent rule collapses on
        short-period repetition — e.g. a period-1 loop always matches at
        feed_pos-2, drafting [tok, 0, 0, ...] for 2 tok/round where an
        older fully-written occurrence drafts W+1/round
        (tools/spec_round_probe.py: device round counts, not simulated).
        """
        prev = jnp.take_along_axis(
            tokens_buf, jnp.maximum(feed_pos - 1, 0)[:, None], axis=1)
        nxt = jnp.concatenate(
            [tokens_buf[:, 1:], jnp.zeros((b, 1), jnp.int32)], axis=1)
        j = jnp.arange(s_buf)[None, :]
        hit = ((tokens_buf == prev) & (nxt == w0)
               & (j + 1 < feed_pos[:, None]) & (j > 0))      # (B, S)
        full = hit & (j + w + 1 <= feed_pos[:, None])        # drafts written
        has = jnp.any(hit, axis=1)
        has_full = jnp.any(full, axis=1)
        j_any = jnp.argmax(jnp.where(hit, j, -1), axis=1)    # most recent
        j_full = jnp.argmax(jnp.where(full, j, -1), axis=1)
        j_sel = jnp.where(has_full, j_full, j_any)
        start = jnp.where(has, j_sel + 2, feed_pos)          # fallback: w0..
        rows = jnp.clip(start[:, None] + jnp.arange(w)[None, :], 0, s_buf - 1)
        return jnp.take_along_axis(tokens_buf, rows, axis=1)

    jidx = jnp.arange(w + 1)[None, :]                        # (1, W+1)

    def cond(c: _Carry):
        return ~jnp.all(c.done)

    def body(c: _Carry):
        feed_pos = p + c.n_acc - 1                           # (B,)
        w0 = jnp.take_along_axis(c.tokens, feed_pos[:, None], axis=1)

        # --- draft W tokens (proposals, prompt lookup, or a model) -----
        if proposal_tokens is not None:
            rows = c.n_acc[:, None] + jnp.arange(w)[None, :]
            drafts = jnp.take_along_axis(
                proposal_tokens, jnp.clip(rows, 0,
                                          proposal_tokens.shape[1] - 1),
                axis=1)
            d_k, d_v = c.d_self_k, c.d_self_v
        elif ngram_draft:
            drafts = ngram_propose(c.tokens, feed_pos, w0)   # (B, W)
            d_k, d_v = c.d_self_k, c.d_self_v
        else:
            def draft_step(dc, j):
                d_k_, d_v_, cur = dc
                dl, ndc, _ = decoder_verify(
                    draft_params, cur, feed_pos + j,
                    DecodeCache(d_k_, d_v_, d_cross_k, d_cross_v),
                    draft_arch, compute_dtype)
                nxt = jnp.argmax(
                    masked(dl[:, 0], False), axis=-1).astype(jnp.int32)
                return (ndc.self_k, ndc.self_v, nxt[:, None]), nxt

            # W+1 steps, not W: the last step exists only to write d_W's
            # K/V into the draft cache. Without it, a fully-accepted
            # round (m == W) leaves a permanent zero-KV hole below every
            # future window start — the draft then attends garbage and
            # acceptance collapses for the rest of the utterance (found
            # via the all-accept probe reading 1489 tok/s where the cost
            # model predicts ~3400).
            (d_k, d_v, _), drafts_all = jax.lax.scan(
                draft_step, (c.d_self_k, c.d_self_v, w0), jnp.arange(w + 1))
            drafts = jnp.transpose(drafts_all)[:, :w]        # (B, W)

        # --- verify the whole window in one target pass ----------------
        window = jnp.concatenate([w0, drafts], axis=1)       # (B, W+1)
        if use_mega:
            vlogits, (nk_t, nv_t), valign = mega_decoder_verify(
                params, window, feed_pos[0], c.self_k, c.self_v,
                mega_cross, arch)
        else:
            vlogits, ncache, valign = decoder_verify(
                params, window, feed_pos,
                DecodeCache(c.self_k, c.self_v, cross_k, cross_v),
                arch, compute_dtype)
            nk_t, nv_t = ncache.self_k, ncache.self_v
        sl = masked(vlogits, False)                          # (B, W+1, V)
        pred = jnp.argmax(sl, axis=-1).astype(jnp.int32)     # (B, W+1)
        logp = jax.nn.log_softmax(sl, axis=-1)

        match = pred[:, :w] == drafts                        # (B, W)
        m = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
        bonus = jnp.take_along_axis(pred, m[:, None], axis=1)  # (B, 1)
        drafts_pad = jnp.concatenate(
            [drafts, jnp.zeros((b, 1), jnp.int32)], axis=1)
        new_tok = jnp.where(jidx < m[:, None], drafts_pad, bonus)  # (B, W+1)
        lp_tok = jnp.take_along_axis(logp, new_tok[:, :, None],
                                     axis=-1)[:, :, 0]       # (B, W+1)

        # Stop at the first EOT inside the accepted run (inclusive write,
        # exclusive count — mirrors greedy's sum/len semantics).
        is_eot = (new_tok == eot) & (jidx <= m[:, None])
        has_eot = jnp.any(is_eot, axis=1)
        first_e = jnp.argmax(is_eot, axis=1)
        n_new = jnp.where(has_eot, first_e + 1, m + 1)       # tokens to write
        live = ~c.done
        wsel = (jidx < n_new[:, None]) & live[:, None]       # (B, W+1)

        # Scatter new tokens into the buffer at feed_pos+1+j via a gather:
        # for each slot s, idx = s - (feed_pos+1); in-range -> new token.
        s_iota = jnp.arange(s_buf)[None, :]
        rel = s_iota - (feed_pos[:, None] + 1)               # (B, S)
        in_rng = (rel >= 0) & (rel < n_new[:, None]) & live[:, None]
        gathered = jnp.take_along_axis(
            new_tok, jnp.clip(rel, 0, w), axis=1)
        new_tokens = jnp.where(in_rng, gathered, c.tokens)

        # Token logprobs land at generated indices n_acc+j (EOT included,
        # like greedy's token_lp).
        g_iota = jnp.arange(lp_buf)[None, :]
        grel = g_iota - c.n_acc[:, None]
        g_rng = (grel >= 0) & (grel < n_new[:, None]) & live[:, None]
        g_lp = jnp.take_along_axis(lp_tok, jnp.clip(grel, 0, w), axis=1)
        new_token_lp = jnp.where(g_rng, g_lp, c.token_lp)

        # Sum of accepted non-EOT logprobs (greedy excludes EOT's lp and
        # never counts past max_new — the final round may overshoot).
        in_budget = c.n_acc[:, None] + jidx < max_new_tokens
        inc = jnp.sum(
            jnp.where(wsel & in_budget & (new_tok != eot), lp_tok, 0.0),
            axis=1)
        new_sum = c.sum_lp + inc

        if capture_alignment:
            # Rows j <= m are the fed chain tokens at slots feed_pos+j.
            row_ok = (jidx <= m[:, None]) & live[:, None]    # (B, W+1)
            slot_rows = feed_pos[:, None] + jnp.arange(w + 1)[None, :]
            onehot = ((slot_rows[:, :, None] == jnp.arange(s_buf)[None, None, :])
                      & row_ok[:, :, None]).astype(jnp.float32)
            # HIGHEST: exact one-hot select (TPU's default f32 einsum
            # rounds operands to bf16 — CLAUDE.md precision invariant).
            upd = jnp.einsum("bjat,bjs->bast", valign, onehot,
                             precision=jax.lax.Precision.HIGHEST)
            written = jnp.any(onehot > 0, axis=1)[:, None, :, None]
            new_align = jnp.where(written, upd, c.align)
        else:
            new_align = c.align

        adv = jnp.where(live, n_new, 0)
        n_acc2 = c.n_acc + adv
        new_done = c.done | (has_eot & live) | (n_acc2 >= max_new_tokens)
        sel = live[:, None]
        sel5 = live[None, :, None, None, None]
        # Target cache keep-if-done: slot-major (L, S, D) on the mega
        # path (b==1, scalar select), feature-major 5-d otherwise.
        sel_t = live[0] if use_mega else sel5
        return _Carry(
            new_tokens, n_acc2, new_done,
            jnp.where(sel_t, nk_t, c.self_k),
            jnp.where(sel_t, nv_t, c.self_v),
            c.d_self_k if model_free else jnp.where(sel5, d_k, c.d_self_k),
            c.d_self_v if model_free else jnp.where(sel5, d_v, c.d_self_v),
            new_align,
            jnp.where(live, new_sum, c.sum_lp),
            jnp.where(sel, new_token_lp, c.token_lp),
            c.rounds + 1)

    init = _Carry(tokens, jnp.ones((b,), jnp.int32), done0,
                  t_self_k0, t_self_v0,
                  draft_cache.self_k, draft_cache.self_v,
                  align_buf, sum_lp0, token_lp0, jnp.int32(0))
    out = jax.lax.while_loop(cond, body, init)

    s_out = p + max_new_tokens
    toks = out.tokens[:, :s_out]
    gen = toks[:, p:]
    is_eot = gen == eot
    any_eot = jnp.any(is_eot, axis=1)
    first_eot = jnp.argmax(is_eot, axis=1)
    num_generated = jnp.where(
        any_eot, first_eot, max_new_tokens).astype(jnp.int32)
    # Greedy parity for the visible buffer: past the first EOT everything
    # is EOT (greedy keeps feeding EOT for finished rows).
    past = jnp.arange(max_new_tokens)[None, :] > jnp.where(
        any_eot, first_eot, max_new_tokens)[:, None]
    gen = jnp.where(past, eot, gen)
    toks = jnp.concatenate([toks[:, :p], gen], axis=1)
    align = (out.align[:, :, :s_out] if capture_alignment else out.align)
    return GreedyResult(toks, num_generated, out.sum_lp, align,
                        out.token_lp[:, :max_new_tokens], no_speech_prob,
                        rounds=out.rounds)

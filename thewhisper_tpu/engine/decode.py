"""On-device greedy decode loop with alignment capture.

The generation loop is a single ``lax.while_loop`` compiled into the same XLA
executable as the encoder: between tokens nothing crosses the host boundary.
This removes the reference's per-token cache conversion tax
(``apple/model.py:155-255``, SURVEY.md section 3.1 "hot loops").

Semantics mirror HF Whisper generation under the eval protocol
(greedy, ``num_beams=1``): ``suppress_tokens`` masked at every step,
``begin_suppress_tokens`` at the first sampled position only, prompt =
``[sot, lang, task, notimestamps]``, stop on EOT or ``max_new_tokens``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from thewhisper_tpu.config import WhisperArch
from thewhisper_tpu.models.whisper import (
    DecodeCache,
    decoder_prefill,
    decoder_step,
)

NEG_INF = jnp.float32(-1e9)


def suppress_mask(vocab_size: int, token_ids: Sequence[int]) -> np.ndarray:
    """(V,) additive mask: -1e9 at suppressed ids, 0 elsewhere."""
    mask = np.zeros((vocab_size,), dtype=np.float32)
    ids = [t for t in token_ids if 0 <= t < vocab_size]
    mask[ids] = -1e9
    return mask


class GreedyResult(NamedTuple):
    tokens: jnp.ndarray        # (B, P + max_new) int32; prompt + generated
    num_generated: jnp.ndarray  # (B,) int32, count before/including EOT
    sum_logprob: jnp.ndarray   # (B,) f32 over generated tokens (for filters)
    align: jnp.ndarray         # (B, A, P + max_new, T_enc) f32 (zeros if off)
    token_logprobs: jnp.ndarray  # (B, max_new) f32 per generated token
    no_speech_prob: jnp.ndarray  # (B,) f32 P(no_speech | sot) if id given
    # Diagnostic: while-loop iterations actually executed (speculative
    # decode sets this to its verify-round count; plain greedy leaves it
    # None). Lets probes measure TRUE per-round cost instead of inferring
    # round counts from a host-side simulation of the draft rule.
    rounds: Optional[jnp.ndarray] = None  # scalar int32 or None


def greedy_decode(
    params,
    arch: WhisperArch,
    prompt: jnp.ndarray,              # (B, P) int32
    cache: DecodeCache,
    max_new_tokens: int,
    eot: int,
    suppress: Optional[jnp.ndarray] = None,        # (V,) additive
    begin_suppress: Optional[jnp.ndarray] = None,  # (V,) additive
    capture_alignment: bool = False,
    compute_dtype: jnp.dtype = jnp.float32,
    no_speech_id: Optional[int] = None,
    temperature: float = 0.0,
    rng_seed: Optional[jnp.ndarray] = None,        # scalar uint32/int32
) -> GreedyResult:
    """Greedy (``temperature=0``) or sampled decode, fully on device.

    ``temperature > 0`` samples each step (the openai-whisper fallback
    ladder's re-decode mode); the step index is folded into ``rng_seed`` so
    every position draws an independent key inside the while_loop.
    """
    b, p = prompt.shape
    s_max = p + max_new_tokens
    ck = cache.cross_k
    t_enc = (ck["q"] if isinstance(ck, dict) else ck).shape[4]
    n_align = max(1, len(arch.alignment_heads))
    v = arch.vocab_size

    base_key = (jax.random.PRNGKey(rng_seed)
                if (temperature and rng_seed is not None) else None)

    logits_p, cache, align_p = decoder_prefill(
        params, prompt, cache, arch, compute_dtype)

    if capture_alignment:
        align_buf = jnp.zeros((b, n_align, s_max, t_enc), dtype=jnp.float32)
        # (B, P, A, T) -> (B, A, P, T)
        align_buf = jax.lax.dynamic_update_slice(
            align_buf, jnp.transpose(align_p, (0, 2, 1, 3)), (0, 0, 0, 0))
    else:
        align_buf = jnp.zeros((b, 1, 1, 1), dtype=jnp.float32)

    def pick(step_logits: jnp.ndarray, is_first: jnp.ndarray, step_idx):
        x = step_logits
        if suppress is not None:
            x = x + suppress
        if begin_suppress is not None:
            x = x + jnp.where(is_first, begin_suppress, jnp.zeros_like(begin_suppress))
        logprobs = jax.nn.log_softmax(x, axis=-1)
        if base_key is not None:
            key = jax.random.fold_in(base_key, step_idx)
            nxt = jax.random.categorical(key, x / temperature).astype(jnp.int32)
        else:
            nxt = jnp.argmax(x, axis=-1).astype(jnp.int32)
        lp = jnp.take_along_axis(logprobs, nxt[:, None], axis=-1)[:, 0]
        return nxt, lp

    first_tok, first_lp = pick(logits_p[:, -1], jnp.bool_(True), jnp.int32(0))

    # P(no_speech) read off the sot position, HF-style silence signal.
    if no_speech_id is not None:
        no_speech_prob = jax.nn.softmax(
            logits_p[:, 0], axis=-1)[:, no_speech_id]
    else:
        no_speech_prob = jnp.zeros((b,), jnp.float32)

    token_lp0 = jnp.zeros((b, max_new_tokens), jnp.float32)
    token_lp0 = token_lp0.at[:, 0].set(first_lp)

    tokens = jnp.zeros((b, s_max), dtype=jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt.astype(jnp.int32), (0, 0))
    tokens = tokens.at[:, p].set(first_tok)
    done0 = first_tok == eot
    sum_lp0 = jnp.where(done0, 0.0, first_lp)

    # The cross K/V never changes during decode: keep it OUT of the loop
    # carry (closure constants are loop invariants for XLA). Carrying it
    # made every iteration copy the full cross cache — ~2 GB/step at bs=32
    # per XLA cost analysis.
    cross_k, cross_v = cache.cross_k, cache.cross_v

    # bs=1 int8-S engines route the step through the decode megakernel
    # (ops/mega_step.py: the whole L-layer step + logits as ONE Pallas
    # kernel — the per-kernel-overhead fix measured in
    # tools/gemv_chain_probe.py). The loop then carries SLOT-MAJOR
    # (L, S, D) self K/V instead of feature-major; semantics identical.
    from thewhisper_tpu.ops.mega_step import (
        MEGA_KEY,
        mega_decoder_step,
        mega_enabled,
        mega_pays,
        prepare_mega_cache,
    )

    dec_tree = params.get("decoder") if isinstance(params, dict) else None
    use_mega = (b == 1
                and compute_dtype == jnp.bfloat16
                and isinstance(dec_tree, dict) and MEGA_KEY in dec_tree
                and isinstance(cache.cross_k, dict)
                and mega_pays(arch)
                and mega_enabled())
    if use_mega:
        self_k0, self_v0, mega_cross = prepare_mega_cache(cache)
    else:
        self_k0, self_v0, mega_cross = cache.self_k, cache.self_v, None

    class Carry(NamedTuple):
        step: jnp.ndarray
        tokens: jnp.ndarray
        done: jnp.ndarray
        self_k: jnp.ndarray
        self_v: jnp.ndarray
        align: jnp.ndarray
        sum_lp: jnp.ndarray
        token_lp: jnp.ndarray

    def cond(c: Carry):
        return (c.step < max_new_tokens) & ~jnp.all(c.done)

    def body(c: Carry):
        pos = p + c.step - 1          # cache slot of the token being fed
        tok = jax.lax.dynamic_slice(c.tokens, (0, pos), (b, 1))
        if use_mega:
            logits, (new_k, new_v), align_step = mega_decoder_step(
                params, tok, pos.astype(jnp.int32), c.self_k, c.self_v,
                mega_cross, arch, capture_alignment)
        else:
            step_cache = DecodeCache(c.self_k, c.self_v, cross_k, cross_v)
            logits, new_cache, align_step = decoder_step(
                params, tok, pos.astype(jnp.int32), step_cache, arch,
                compute_dtype)
            new_k, new_v = new_cache.self_k, new_cache.self_v
        nxt, lp = pick(logits, jnp.bool_(False), c.step)
        nxt = jnp.where(c.done, eot, nxt)
        new_tokens = jax.lax.dynamic_update_slice(
            c.tokens, nxt[:, None], (0, pos + 1))
        new_done = c.done | (nxt == eot)
        new_sum = c.sum_lp + jnp.where(c.done | (nxt == eot), 0.0, lp)
        new_token_lp = jax.lax.dynamic_update_slice(
            c.token_lp, jnp.where(c.done, 0.0, lp)[:, None], (0, c.step))
        if capture_alignment:
            new_align = jax.lax.dynamic_update_slice(
                c.align, align_step[:, :, None, :], (0, 0, pos, 0))
        else:
            new_align = c.align
        return Carry(c.step + 1, new_tokens, new_done,
                     new_k, new_v, new_align, new_sum,
                     new_token_lp)

    init = Carry(jnp.int32(1), tokens, done0, self_k0, self_v0,
                 align_buf, sum_lp0, token_lp0)
    out = jax.lax.while_loop(cond, body, init)

    # Count generated tokens per sequence (first EOT position, else max_new).
    gen = out.tokens[:, p:]
    is_eot = gen == eot
    any_eot = jnp.any(is_eot, axis=1)
    first_eot = jnp.argmax(is_eot, axis=1)
    num_generated = jnp.where(any_eot, first_eot, max_new_tokens).astype(jnp.int32)

    return GreedyResult(out.tokens, num_generated, out.sum_lp, out.align,
                        out.token_lp, no_speech_prob)


class BeamResult(NamedTuple):
    tokens: jnp.ndarray        # (B, P + max_new) int32: best beam per sample
    num_generated: jnp.ndarray  # (B,) int32
    sum_logprob: jnp.ndarray   # (B,) f32 of the selected beam
    all_tokens: jnp.ndarray    # (B, K, P + max_new) every beam (debug/nbest)
    align: jnp.ndarray         # (B, A, P + max_new, T_enc) best beam; zeros if off
    token_logprobs: jnp.ndarray  # (B, max_new) f32 per token of the best beam
    no_speech_prob: jnp.ndarray  # (B,) f32 P(no_speech | sot) if id given


def beam_decode(
    params,
    arch: WhisperArch,
    prompt: jnp.ndarray,              # (B, P) int32
    cache: DecodeCache,               # built with batch B*K (cross KV tiled)
    num_beams: int,
    max_new_tokens: int,
    eot: int,
    suppress: Optional[jnp.ndarray] = None,
    begin_suppress: Optional[jnp.ndarray] = None,
    length_penalty: float = 1.0,
    compute_dtype: jnp.dtype = jnp.float32,
    capture_alignment: bool = False,
    no_speech_id: Optional[int] = None,
) -> BeamResult:
    """Batched beam search fully on device (HF defaults: length_penalty 1.0).

    The cache carries B*K rows; each step gathers cache/token/alignment
    state by the selected parent beams (``jnp.take`` along the batch axis) —
    the on-device analog of HF's post-hoc ``beam_indices`` reindexing
    (reference ``apple/model.py:747-783``). Per-token logprobs ride the same
    gathers, so confidences exist under beams exactly as under greedy.
    """
    b, p = prompt.shape
    k = num_beams
    v = arch.vocab_size
    s_max = p + max_new_tokens
    ck = cache.cross_k
    t_enc = (ck["q"] if isinstance(ck, dict) else ck).shape[4]
    n_align = max(1, len(arch.alignment_heads))

    flat_prompt = jnp.tile(prompt[:, None, :], (1, k, 1)).reshape(b * k, p)
    logits_p, cache, align_p = decoder_prefill(
        params, flat_prompt, cache, arch, compute_dtype)

    if capture_alignment:
        # (B*K, A, S_max, T): gathered by parent beam alongside the cache.
        align_buf = jnp.zeros((b * k, n_align, s_max, t_enc), jnp.float32)
        align_buf = jax.lax.dynamic_update_slice(
            align_buf, jnp.transpose(align_p, (0, 2, 1, 3)), (0, 0, 0, 0))
    else:
        align_buf = jnp.zeros((b * k, 1, 1, 1), jnp.float32)

    def step_logprobs(step_logits, is_first, done):
        x = step_logits
        if suppress is not None:
            x = x + suppress
        if begin_suppress is not None:
            x = x + jnp.where(is_first, begin_suppress,
                              jnp.zeros_like(begin_suppress))
        logp = jax.nn.log_softmax(x, axis=-1).reshape(b, k, v)
        # Finished beams may only extend with EOT at zero cost.
        eot_only = jnp.full((v,), -1e9, jnp.float32).at[eot].set(0.0)
        return jnp.where(done[:, :, None], eot_only[None, None, :], logp)

    # P(no_speech) off the sot position of beam 0 (all beams identical here).
    if no_speech_id is not None:
        no_speech_prob = jax.nn.softmax(
            logits_p.reshape(b, k, p, v)[:, 0, 0], axis=-1)[:, no_speech_id]
    else:
        no_speech_prob = jnp.zeros((b,), jnp.float32)

    tokens = jnp.zeros((b, k, s_max), jnp.int32)
    tokens = tokens.at[:, :, :p].set(prompt[:, None, :])
    done0 = jnp.zeros((b, k), bool)
    # Beam 0 carries the probability mass at start so topk yields K distinct
    # continuations instead of K copies of the best token.
    sum_lp = jnp.where(jnp.arange(k)[None, :] == 0, 0.0, -1e9) * jnp.ones((b, 1))

    logp0 = step_logprobs(logits_p[:, -1], jnp.bool_(True), done0)
    cand = (sum_lp[:, :, None] + logp0).reshape(b, k * v)
    new_sum, idx = jax.lax.top_k(cand, k)
    parent = idx // v
    tok = (idx % v).astype(jnp.int32)
    rows = (jnp.arange(b)[:, None] * k + parent).reshape(-1)
    tokens = jnp.take(tokens.reshape(b * k, s_max), rows, axis=0).reshape(b, k, s_max)
    tokens = tokens.at[:, :, p].set(tok)
    cache = DecodeCache(
        jnp.take(cache.self_k, rows, axis=1),
        jnp.take(cache.self_v, rows, axis=1),
        cache.cross_k, cache.cross_v)
    align_buf = jnp.take(align_buf, rows, axis=0)
    done = tok == eot
    # Per-token logprob of each beam's chosen token: new total minus the
    # parent's total (0 for finished beams extending with free EOT).
    parent_sum = jnp.take_along_axis(sum_lp, parent, axis=1)
    token_lp = jnp.zeros((b, k, max_new_tokens), jnp.float32)
    token_lp = token_lp.at[:, :, 0].set(new_sum - parent_sum)
    sum_lp = new_sum

    cross_k_const, cross_v_const = cache.cross_k, cache.cross_v

    class Carry(NamedTuple):
        step: jnp.ndarray
        tokens: jnp.ndarray
        done: jnp.ndarray
        self_k: jnp.ndarray
        self_v: jnp.ndarray
        sum_lp: jnp.ndarray
        align: jnp.ndarray
        token_lp: jnp.ndarray

    def cond(c):
        return (c.step < max_new_tokens) & ~jnp.all(c.done)

    def body(c):
        pos = p + c.step - 1
        last = jax.lax.dynamic_slice(
            c.tokens.reshape(b * k, s_max), (0, pos), (b * k, 1))
        step_cache = DecodeCache(c.self_k, c.self_v, cross_k_const, cross_v_const)
        logits, new_cache, align_step = decoder_step(
            params, last, pos.astype(jnp.int32), step_cache, arch, compute_dtype)
        if capture_alignment:
            align1 = jax.lax.dynamic_update_slice(
                c.align, align_step[:, :, None, :], (0, 0, pos, 0))
        else:
            align1 = c.align
        logp = step_logprobs(logits, jnp.bool_(False), c.done)
        cand = (c.sum_lp[:, :, None] + logp).reshape(b, k * v)
        new_sum, idx = jax.lax.top_k(cand, k)
        parent = idx // v
        tok = (idx % v).astype(jnp.int32)
        rows = (jnp.arange(b)[:, None] * k + parent).reshape(-1)
        toks = jnp.take(c.tokens.reshape(b * k, s_max), rows, axis=0)
        toks = toks.reshape(b, k, s_max)
        toks = jax.lax.dynamic_update_slice(
            toks, tok[:, :, None], (0, 0, pos + 1))
        new_done = jnp.take(c.done.reshape(-1), rows).reshape(b, k) | (tok == eot)
        new_align = (jnp.take(align1, rows, axis=0) if capture_alignment
                     else align1)
        # Token logprobs follow their beam's parent chain, then record this
        # step's increment (0 for already-finished beams).
        parent_sum = jnp.take_along_axis(c.sum_lp, parent, axis=1)
        tlp = jnp.take(c.token_lp.reshape(b * k, max_new_tokens), rows,
                       axis=0).reshape(b, k, max_new_tokens)
        tlp = jax.lax.dynamic_update_slice(
            tlp, (new_sum - parent_sum)[:, :, None], (0, 0, c.step))
        return Carry(c.step + 1, toks, new_done,
                     jnp.take(new_cache.self_k, rows, axis=1),
                     jnp.take(new_cache.self_v, rows, axis=1), new_sum,
                     new_align, tlp)

    out = jax.lax.while_loop(
        cond, body,
        Carry(jnp.int32(1), tokens, done, cache.self_k, cache.self_v, sum_lp,
              align_buf, token_lp))

    # Per-beam generated length = first EOT position (or max_new).
    gen = out.tokens[:, :, p:]
    is_eot = gen == eot
    any_eot = jnp.any(is_eot, axis=-1)
    first_eot = jnp.argmax(is_eot, axis=-1)
    lengths = jnp.where(any_eot, first_eot, max_new_tokens)

    # HF parity: BeamHypotheses normalizes by the FULL hypothesis length
    # including the forced prompt (sum_logprobs / hyp_len ** penalty); the
    # forced tokens contribute 0 logprob, so only the denominator changes.
    score = out.sum_lp / (p + lengths).astype(jnp.float32) ** length_penalty
    best = jnp.argmax(score, axis=-1)                     # (B,)
    bidx = jnp.arange(b)
    best_tokens = out.tokens[bidx, best]
    if capture_alignment:
        best_align = jnp.take(
            out.align, bidx * k + best, axis=0)           # (B, A, S_max, T)
    else:
        best_align = jnp.zeros((b, 1, 1, 1), jnp.float32)
    return BeamResult(
        tokens=best_tokens,
        num_generated=lengths[bidx, best].astype(jnp.int32),
        sum_logprob=out.sum_lp[bidx, best],
        all_tokens=out.tokens,
        align=best_align,
        token_logprobs=out.token_lp[bidx, best],
        no_speech_prob=no_speech_prob,
    )

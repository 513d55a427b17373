"""Single-Pallas-kernel bs=1 decoder step — the decode "megakernel".

Why: the bs=1 decode step is PER-KERNEL-OVERHEAD bound, not bandwidth
bound. Evidence chain (all measured on v5e): int4 halved the weight bytes
for only 8-10% (tools/int4_native_probe.py); fusing self q/k/v removed 2
of 8 projection kernels for 4.5% (tools/qkv_fuse_probe.py); and a single
Pallas kernel running all 32 large-v3 decoder MLPs with double-buffered
HBM weight streaming hit 732 GB/s = 89% of the 819 GB/s HBM peak vs
XLA's 57%-of-floor rolled scan, while the same math split into per-layer
kernels reached only 0.719 ms vs 0.573 (tools/gemv_chain_probe.py) — the
win is eliminating kernel BOUNDARIES. This module is the adoption path
that probe names: the WHOLE decoder step (ln1 -> fused-qkv GEMV ->
self-attention over the KV cache -> out-proj -> cross-attention over the
int8 cross-KV -> MLP, for all L layers, plus the final LN and the tied-
embedding logits GEMV) as ONE kernel.

Scope (the flagship "S" decode config; everything else falls back to the
XLA step in models/whisper.py):
- batch == 1, compute bf16;
- weight-only int8 decoder leaves (models.quant), fused self-qkv
  (models.whisper.fuse_self_qkv_params), per-row int8 token embedding;
- int8 cross-KV (``WhisperEngine(cross_kv_int8=True)``).

Design notes (probe-backed):
- **Slot-major caches.** The kernel reads self K/V as (L, S, D) and
  cross K/V as (L, T_pad, D): whole-(S, D) DMAs per layer, no per-head
  gathers. Mosaic rejects sub-(8,128)-tile DMA shapes (the single-row
  cache write; tools/mega_caps_probe.py), so the kernel RETURNS each
  layer's fresh k/v rows and the caller applies the production
  where-iota single-slot update in XLA — measured in-place-cheap on a
  slot-major carry (same probe).
- **Per-head math via a head-segment selector.** Attention logits for
  all H heads in one MXU matmul: ``(K ⊙ q_scaled) @ Sel`` where
  ``Sel[d, h] = (d // dh == h)``; the weighted sum expands probs back
  with ``probs @ Sel^T`` and reduces against V elementwise. No batched
  dots, no in-kernel transposes (both are Mosaic weak spots).
- **Every weight streams HBM->VMEM double-buffered** through dedicated
  per-phase tile buffers, and each phase's LAST tile-wait first launches
  the NEXT phase's first DMA, so the HBM pipe never drains across
  phase or layer boundaries (the gemv_chain_probe pipelining rule).
- The extra-logit trick from models/whisper.py::_stack_step keeps the
  current token's k/v out of the cache read path, so attention is
  correct even though the cache write happens after the kernel.

Reference parity anchor: this replaces the reference's per-token MLX
decoder graph (``apple/model.py:155-255``, ``apple/mlx_modules.py``)
on the TPU hot path; numerics are pinned against the production XLA
step in tests/test_mega_step.py.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from thewhisper_tpu.config import WhisperArch

MEGA_KEY = "_mega"
_HP = 128          # head axis padded to one lane tile
_NEG = -1e30  # python scalar: a jnp constant would be captured by the kernel


def mega_enabled() -> bool:
    """Kernel path gate: compiled on TPU, interpret mode for CPU tests."""
    env = os.environ.get("WHISPER_MEGAKERNEL", "1")
    if env == "0":
        return False
    if jax.default_backend() == "tpu":
        return True
    return env == "interpret"


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def mega_pays(arch: "WhisperArch", batch: int = 1) -> bool:
    """Depth gate: the megakernel wins where the XLA alternative is the
    ROLLED layer scan (deep decoders are per-kernel-overhead-bound:
    2.204 -> 1.714 ms = 1.29x on large-v3). A fully-unrolled shallow
    decoder (turbo, 4 layers) already runs at the HBM floor and measured
    a slight LOSS through the kernel (0.974x at L=4,
    tools/mega_step_probe.py --layers 4) — so gate on the same
    full-unroll-or-roll policy the XLA step uses."""
    from thewhisper_tpu.models.whisper import _decoder_unroll

    return _decoder_unroll(arch, batch) == 1


def _pick_tile(n: int, cap: int) -> int:
    """Largest multiple of 128 that divides ``n`` and is <= cap."""
    for t in range(min(cap, n), 127, -128):
        if t % 128 == 0 and n % t == 0:
            return t
    raise ValueError(f"no 128-multiple tile divides {n}")


def _pad_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _is_q8(leaf) -> bool:
    return isinstance(leaf, dict) and set(leaf) == {"q", "s"}


# ---------------------------------------------------------------------------
# Parameter packing (once, at engine init)
# ---------------------------------------------------------------------------


def pack_mega_params(params: Dict[str, Any], arch: WhisperArch) -> Dict[str, Any]:
    """Attach the megakernel's auxiliary leaves under ``decoder._mega``.

    The big weights are used AS STORED (int8 (L, in, out) stacks — the
    kernel streams column/row tiles of them directly); this adds only:
    - ``smalls`` (L, NS) f32: every per-layer scale/bias/LN vector packed
      into one row, DMA'd once per layer (offsets are static & 128-aligned
      because d_model/d_ff are 128 multiples);
    - ``sel`` (D, 128) bf16 / ``selt`` (128, D) bf16: the head-segment
      selector and its transpose;
    - ``asel`` (L, 128, 128) f32: per-layer alignment-head selector
      (models.whisper._alignment_selector, head axis padded);
    - ``lnp`` (2, D) f32: final-LN scale/bias;
    - ``embt`` (D, V_pad) int8 + ``embs`` (1, V_pad) f32: the tied
      embedding transposed for the logits GEMV (the single biggest
      per-token read, 66 MB on large-v3 — worth the one-time HBM copy).

    Returns params unchanged when the decoder doesn't match the supported
    config (un-fused qkv, non-int8 leaves, mesh-sharded engines).
    """
    dec = params.get("decoder")
    if not isinstance(dec, dict) or MEGA_KEY in dec:
        return params
    layers = dec.get("layers", {})
    sa, ca, mlp = layers.get("self"), layers.get("cross"), layers.get("mlp")
    if not (sa and ca and mlp) or "qkv_w" not in sa:
        return params
    leaves = [sa.get("qkv_w"), sa.get("o_w"), ca.get("q_w"), ca.get("o_w"),
              mlp.get("fc1_w"), mlp.get("fc2_w")]
    if not all(_is_q8(w) and w["q"].dtype == jnp.int8 for w in leaves):
        return params
    if not _is_q8(dec.get("token_emb")):
        return params

    d, f = arch.d_model, arch.d_ff
    if d % 128 or f % 128:
        return params
    dh = arch.head_dim

    def v32(x):
        return x.astype(jnp.float32)

    smalls = jnp.concatenate([
        v32(layers["ln1"]["scale"]), v32(layers["ln1"]["bias"]),
        v32(sa["qkv_w"]["s"]), v32(sa["qkv_b"]),
        v32(sa["o_w"]["s"]), v32(sa["o_b"]),
        v32(layers["ln_cross"]["scale"]), v32(layers["ln_cross"]["bias"]),
        v32(ca["q_w"]["s"]), v32(ca["q_b"]),
        v32(ca["o_w"]["s"]), v32(ca["o_b"]),
        v32(layers["ln2"]["scale"]), v32(layers["ln2"]["bias"]),
        v32(mlp["fc1_w"]["s"]), v32(mlp["fc1_b"]),
        v32(mlp["fc2_w"]["s"]), v32(mlp["fc2_b"]),
    ], axis=1)[:, None, :]                         # (L, 1, 20D + 2F)
    # 3-D with a singleton row: Mosaic tiles the LAST TWO dims of HBM
    # memrefs (8, 128) and rejects size-1 slices of a tiled dim, so the
    # per-layer DMA must slice an untiled leading axis.

    sel = (np.arange(d)[:, None] // dh
           == np.arange(_HP)[None, :]).astype(np.float32)
    from thewhisper_tpu.models.whisper import _alignment_selector

    asel_hw = _alignment_selector(arch)            # (L, H, A)
    L, H, A = asel_hw.shape
    asel = np.zeros((L, _HP, _HP), np.float32)
    asel[:, :H, :A] = asel_hw

    emb_q, emb_s = dec["token_emb"]["q"], dec["token_emb"]["s"]
    v = emb_q.shape[0]
    v_pad = _pad_up(v, 512)
    embt = jnp.zeros((d, v_pad), jnp.int8)
    embt = jax.lax.dynamic_update_slice(embt, jnp.transpose(emb_q), (0, 0))
    embs = jnp.zeros((1, v_pad), jnp.float32)
    embs = jax.lax.dynamic_update_slice(
        embs, emb_s.astype(jnp.float32)[None], (0, 0))

    mega = {
        "smalls": smalls,
        # 8-row replicated copy for the W-row VERIFY kernel: Mosaic
        # rejects vector.broadcast of a LANE-OFFSET (1, width) slice to
        # (8, width) ("Invalid input layout"), and every seg() slice of
        # the packed row is lane-offset. Replicating host-side makes all
        # scale/bias applications same-shape elementwise ops (proven
        # supported at offset layouts by the step kernel). ~37 MB HBM on
        # large-v3; the step kernel keeps streaming the 1-row original.
        "smalls8": jnp.tile(smalls, (1, 8, 1)),
        "sel": jnp.asarray(sel, jnp.bfloat16),
        "selt": jnp.asarray(sel.T, jnp.bfloat16),
        "asel": jnp.asarray(asel),
        "lnp": jnp.stack([v32(dec["ln_post"]["scale"]),
                          v32(dec["ln_post"]["bias"])]),
        "embt": embt,
        "embs": embs,
    }
    out = dict(params)
    out["decoder"] = dict(dec)
    out["decoder"][MEGA_KEY] = mega
    return out


class MegaCrossKV(NamedTuple):
    """Slot-major int8 cross-KV + per-feature scales (loop invariants)."""

    k: jnp.ndarray      # (L, T_pad, D) int8
    v: jnp.ndarray      # (L, T_pad, D) int8
    ks: jnp.ndarray     # (L, D) f32
    vs: jnp.ndarray     # (L, D) f32
    t_enc: int          # valid rows (static)


def to_slot_major(fm: jnp.ndarray) -> jnp.ndarray:
    """Feature-major (L, 1, H, dh, S) -> slot-major (L, S, H*dh)."""
    l, b, h, dh, s = fm.shape
    assert b == 1, "megakernel path is bs=1"
    return jnp.transpose(fm, (0, 1, 4, 2, 3)).reshape(l, s, h * dh)


def from_slot_major(sm: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    """Slot-major (L, S, D) -> feature-major (L, 1, H, dh, S)."""
    l, s, d = sm.shape
    x = sm.reshape(l, 1, s, n_heads, d // n_heads)
    return jnp.transpose(x, (0, 1, 3, 4, 2))


def prepare_mega_cache(cache) -> Tuple[jnp.ndarray, jnp.ndarray, MegaCrossKV]:
    """Convert a freshly-prefilled DecodeCache (feature-major, int8 cross
    dicts) to the kernel layouts. Runs once per audio window inside the
    jitted program (a ~150 MB transpose, ~0.4 ms — amortized over the
    whole decode loop).

    The self-KV slot axis pads up to a sublane multiple (8): the kernel
    DMAs the whole (1, S, D) per-layer slice and Mosaic rejects HBM
    slices that aren't (8, 128)-tile-aligned — production programs size
    the cache to prompt + max_new (e.g. 5 for a TTFT program, 148 for a
    144-token window), none of which are 8-multiples. The pad rows stay
    zero and are masked by every consumer (``iota < pos`` in the step
    kernel, per-row causal masks in the verify kernel); the where-iota
    cache writes target positions < S so they are never written."""
    sk = to_slot_major(cache.self_k)
    sv = to_slot_major(cache.self_v)
    s = sk.shape[1]
    s_pad = _pad_up(s, 8)
    if s_pad != s:
        sk = jnp.pad(sk, ((0, 0), (0, s_pad - s), (0, 0)))
        sv = jnp.pad(sv, ((0, 0), (0, s_pad - s), (0, 0)))
    ck, cv = cache.cross_k, cache.cross_v
    assert isinstance(ck, dict), "megakernel needs int8 cross-KV"
    k_sm = to_slot_major(ck["q"])
    v_sm = to_slot_major(cv["q"])
    l, t, d = k_sm.shape
    t_pad = _pad_up(t, 256)
    if t_pad != t:
        k_sm = jnp.pad(k_sm, ((0, 0), (0, t_pad - t), (0, 0)))
        v_sm = jnp.pad(v_sm, ((0, 0), (0, t_pad - t), (0, 0)))
    # (L, 1, D): ref[l] reads want an untiled leading axis (see smalls).
    ks = ck["s"].reshape(l, 1, d).astype(jnp.float32)
    vs = cv["s"].reshape(l, 1, d).astype(jnp.float32)
    return sk, sv, MegaCrossKV(k_sm, v_sm, ks, vs, t)


def ensure_verify_smalls(params: Dict[str, Any], window: int) -> Dict[str, Any]:
    """Return ``params`` with the verify kernel's row-tiled scale copy
    (``smalls8``) matching a ``window``-token verify pass.

    mega_decoder_verify needs a physically (L, WP, NS)-tiled smalls
    (WP = window padded to 8 sublanes); the pack ships WP=8. Callers
    that verify inside a ``lax.while_loop`` MUST call this BEFORE the
    loop — the in-kernel fallback tile would otherwise materialize
    (L*WP*NS*4) bytes every round (ADVICE r4). Shallow-copies only the
    dicts on the path; a no-op when the shipped tile already fits."""
    wp = _pad_up(max(window, 2), 8)
    dec = params.get("decoder") if isinstance(params, dict) else None
    if not isinstance(dec, dict) or MEGA_KEY not in dec:
        return params
    mega = dec[MEGA_KEY]
    s8 = mega.get("smalls8")
    if s8 is not None and s8.shape[1] == wp:
        return params
    mega = dict(mega)
    mega["smalls8"] = jnp.tile(mega["smalls"], (1, wp, 1))
    return {**params, "decoder": {**dec, MEGA_KEY: mega}}


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _build_mega_fn(L: int, D: int, F: int, H: int, S: int, T_pad: int,
                   t_enc: int, V: int, V_pad: int, capture_align: bool,
                   interpret: bool):
    """Build+jit the megakernel for one static shape tuple."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dh = D // H
    scale = float(dh) ** -0.5
    D3 = 3 * D
    NS = 20 * D + 2 * F
    TQ = _pick_tile(D3, 512)        # fused-qkv column tiles
    TD = _pick_tile(D, 256)         # (D, D) projection column tiles
    TC = 256                        # cross-KV row tiles (T_pad % 256 == 0)
    TCF = _pick_tile(F, 256)        # fc2 row tiles
    TF = _pick_tile(F, 256)         # fc1 column tiles
    TV = 512                        # logits column tiles (V_pad % 512 == 0)
    assert T_pad % TC == 0 and V_pad % TV == 0
    NTC = T_pad // TC
    f32, bf16 = jnp.float32, jnp.bfloat16

    # Offsets into the packed smalls row (all 128-aligned: D, F are).
    offs = {}
    o = 0
    for name, width in (("ln1_s", D), ("ln1_b", D), ("qkv_s", D3),
                        ("qkv_b", D3), ("o_s", D), ("o_b", D),
                        ("lnc_s", D), ("lnc_b", D), ("cq_s", D),
                        ("cq_b", D), ("co_s", D), ("co_b", D),
                        ("ln2_s", D), ("ln2_b", D), ("fc1_s", F),
                        ("fc1_b", F), ("fc2_s", D), ("fc2_b", D)):
        offs[name] = (o, width)
        o += width
    assert o == NS

    def kernel(pos_ref, x_ref, sel_ref, selt_ref, lnp_ref, cks_ref, cvs_ref,
               smalls, qkvw, ow, cqw, cow, fc1w, fc2w, skc, svc, ckc, cvc,
               aselw, embt, embs,
               xo, ko, vo, alo, lgo,
               smb, asb, clg, skb, svb,
               bufA, bufO, bufQ, bufB, bufK, bufV, buf1, buf2, bufE, bufEs,
               semA, semO, semQ, semB, semK, semV, sem1, sem2, semE, semEs,
               semSK, semSV, semSM, semAS):
        pos = pos_ref[0]

        def ln(x, s, b):
            x32 = x.astype(f32)
            mu = jnp.mean(x32, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
            y = (x32 - mu) * jax.lax.rsqrt(var + 1e-5)
            return (y * s + b).astype(bf16)

        # --- DMA descriptor builders (wait() rebuilds the same copy) ----
        def cdma(w_ref, buf, sem, l, j, tile):
            return pltpu.make_async_copy(
                w_ref.at[l, :, pl.ds(j * tile, tile)],
                buf.at[j % 2], sem.at[j % 2])

        def rdma(w_ref, buf, sem, l, j, tile):
            return pltpu.make_async_copy(
                w_ref.at[l, pl.ds(j * tile, tile), :],
                buf.at[j % 2], sem.at[j % 2])

        def sm_dma(l):
            return pltpu.make_async_copy(
                smalls.at[l], smb.at[jax.lax.rem(l, 2)],
                semSM.at[jax.lax.rem(l, 2)])

        def as_dma(l):
            return pltpu.make_async_copy(
                aselw.at[l], asb.at[jax.lax.rem(l, 2)],
                semAS.at[jax.lax.rem(l, 2)])

        def sk_dma(l):
            return pltpu.make_async_copy(skc.at[l], skb, semSK)

        def sv_dma(l):
            return pltpu.make_async_copy(svc.at[l], svb, semSV)

        def edma(j):
            return pltpu.make_async_copy(
                embt.at[:, pl.ds(j * TV, TV)], bufE.at[j % 2],
                semE.at[j % 2])

        def esdma(j):
            return pltpu.make_async_copy(
                embs.at[:, pl.ds(j * TV, TV)], bufEs.at[j % 2],
                semEs.at[j % 2])

        # --- streamed GEMV over column tiles of an int8 (L, IN, OUT) ----
        def gemv_col(l, xin, w_ref, buf, sem, n_out, tile, s_seg, b_seg,
                     chain=None, at_first=None):
            nt = n_out // tile
            parts = []
            for j in range(nt):
                if j == 0 and at_first is not None:
                    at_first()
                if j + 1 < nt:
                    cdma(w_ref, buf, sem, l, j + 1, tile).start()
                elif chain is not None:
                    chain()
                cdma(w_ref, buf, sem, l, j, tile).wait()
                wt = buf[j % 2].astype(bf16)
                part = jax.lax.dot_general(
                    xin, wt, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)
                lo, hi = j * tile, (j + 1) * tile
                parts.append(part * s_seg[:, lo:hi] + b_seg[:, lo:hi])
            return jnp.concatenate(parts, axis=1)      # (1, n_out) f32

        alo[...] = jnp.zeros((T_pad, _HP), f32)

        # Prime layer 0: smalls, qkv tile 0, self K/V, align selector.
        sm_dma(jnp.int32(0)).start()
        cdma(qkvw, bufA, semA, jnp.int32(0), 0, TQ).start()
        sk_dma(jnp.int32(0)).start()
        sv_dma(jnp.int32(0)).start()
        if capture_align:
            as_dma(jnp.int32(0)).start()

        def layer_body(l, x):
            slot = jax.lax.rem(l, 2)
            sm_dma(l).wait()
            sm = smb[slot]                              # (1, NS) f32

            def seg(name):
                off, width = offs[name]
                return sm[:, off:off + width]

            # Phase 1: ln1 + fused qkv GEMV (bufA, tile 0 in flight).
            q_in = ln(x, seg("ln1_s"), seg("ln1_b"))
            qkv = gemv_col(
                l, q_in, qkvw, bufA, semA, D3, TQ, seg("qkv_s"),
                seg("qkv_b"),
                chain=lambda: cdma(ow, bufO, semO, l, 0, TD).start(),
            ).astype(bf16)
            q, kc, vc = qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:]
            ko[pl.ds(l, 1)] = kc[None]
            vo[pl.ds(l, 1)] = vc[None]

            # Phase 2: self-attention over the slot-major cache.
            sk_dma(l).wait()
            sv_dma(l).wait()
            qsc = (q.astype(f32) * scale).astype(bf16)  # (1, D)
            lgs = jax.lax.dot_general(                   # (S, HP) f32
                skb[...] * qsc, sel_ref[...],
                (((1,), (0,)), ((), ())), preferred_element_type=f32)
            lc = jax.lax.dot_general(                    # (1, HP)
                kc * qsc, sel_ref[...],
                (((1,), (0,)), ((), ())), preferred_element_type=f32)
            rmask = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0) < pos
            lgs = jnp.where(rmask, lgs, _NEG)
            m = jnp.maximum(jnp.max(lgs, axis=0, keepdims=True), lc)
            e = jnp.where(rmask, jnp.exp(lgs - m), 0.0)
            ec = jnp.exp(lc - m)
            z = jnp.sum(e, axis=0, keepdims=True) + ec
            pe = jax.lax.dot_general(                    # (S, D) f32
                (e / z).astype(bf16), selt_ref[...],
                (((1,), (0,)), ((), ())), preferred_element_type=f32)
            attn = jnp.sum(pe * svb[...].astype(f32), axis=0, keepdims=True)
            pce = jax.lax.dot_general(
                (ec / z).astype(bf16), selt_ref[...],
                (((1,), (0,)), ((), ())), preferred_element_type=f32)
            attn = (attn + pce * vc.astype(f32)).astype(bf16)

            # Phase 3: self out-projection.
            o_out = gemv_col(
                l, attn, ow, bufO, semO, D, TD, seg("o_s"), seg("o_b"),
                chain=lambda: cdma(cqw, bufQ, semQ, l, 0, TD).start())
            x = x + o_out.astype(bf16)

            # Phase 4: cross query projection.
            c_in = ln(x, seg("lnc_s"), seg("lnc_b"))
            cq = gemv_col(
                l, c_in, cqw, bufQ, semQ, D, TD, seg("cq_s"), seg("cq_b"),
                chain=lambda: rdma(ckc, bufK, semK, l, 0, TC).start())
            cqs = (cq * cks_ref[l] * scale).astype(bf16)

            # Phase 5: cross logits, streamed over K row tiles.
            for j in range(NTC):
                if j + 1 < NTC:
                    rdma(ckc, bufK, semK, l, j + 1, TC).start()
                else:
                    rdma(cvc, bufV, semV, l, 0, TC).start()
                rdma(ckc, bufK, semK, l, j, TC).wait()
                kt = bufK[j % 2].astype(bf16)            # (TC, D)
                clg[pl.ds(j * TC, TC), :] = jax.lax.dot_general(
                    kt * cqs, sel_ref[...],
                    (((1,), (0,)), ((), ())), preferred_element_type=f32)

            lg = clg[...]
            tmask = jax.lax.broadcasted_iota(
                jnp.int32, (T_pad, 1), 0) < t_enc
            lg = jnp.where(tmask, lg, _NEG)
            mC = jnp.max(lg, axis=0, keepdims=True)
            eC = jnp.where(tmask, jnp.exp(lg - mC), 0.0)
            zC = jnp.sum(eC, axis=0, keepdims=True)
            probs = eC / zC                              # (T_pad, HP) f32
            clg[...] = probs
            if capture_align:
                as_dma(l).wait()
                alo[...] += jax.lax.dot_general(
                    probs, asb[slot], (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)

            # Phase 6: cross weighted sum, streamed over V row tiles.
            cacc = jnp.zeros((1, D), f32)
            for j in range(NTC):
                if j + 1 < NTC:
                    rdma(cvc, bufV, semV, l, j + 1, TC).start()
                else:
                    cdma(cow, bufB, semB, l, 0, TD).start()
                rdma(cvc, bufV, semV, l, j, TC).wait()
                vt = bufV[j % 2].astype(bf16)            # (TC, D)
                pr = clg[pl.ds(j * TC, TC), :].astype(bf16)
                pex = jax.lax.dot_general(
                    pr, selt_ref[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)          # (TC, D)
                cacc = cacc + jnp.sum(pex * vt.astype(f32), axis=0,
                                      keepdims=True)
            c_mrg = (cacc * cvs_ref[l]).astype(bf16)

            # Phase 7: cross out-projection.
            co_out = gemv_col(
                l, c_mrg, cow, bufB, semB, D, TD, seg("co_s"), seg("co_b"),
                chain=lambda: cdma(fc1w, buf1, sem1, l, 0, TF).start())
            x = x + co_out.astype(bf16)

            # Phase 8: MLP fc1 (+ prefetch next layer's per-layer smalls
            # and self K/V — the earliest point skb/svb are reusable).
            def prefetch_next():
                @pl.when(l + 1 < L)
                def _():
                    sm_dma(l + 1).start()
                    sk_dma(l + 1).start()
                    sv_dma(l + 1).start()
                    if capture_align:
                        as_dma(l + 1).start()

            m_in = ln(x, seg("ln2_s"), seg("ln2_b"))
            h = gemv_col(
                l, m_in, fc1w, buf1, sem1, F, TF, seg("fc1_s"),
                seg("fc1_b"),
                chain=lambda: rdma(fc2w, buf2, sem2, l, 0, TCF).start(),
                at_first=prefetch_next)
            h = jax.nn.gelu(h.astype(bf16), approximate=True)

            # Phase 9: MLP fc2, row-tiled accumulation.
            nt2 = F // TCF
            acc = jnp.zeros((1, D), f32)
            for j in range(nt2):
                if j + 1 < nt2:
                    rdma(fc2w, buf2, sem2, l, j + 1, TCF).start()
                else:
                    @pl.when(l + 1 < L)
                    def _():
                        cdma(qkvw, bufA, semA, l + 1, 0, TQ).start()
                rdma(fc2w, buf2, sem2, l, j, TCF).wait()
                wt = buf2[j % 2].astype(bf16)            # (TCF, D)
                hj = h[:, j * TCF:(j + 1) * TCF]
                acc = acc + jax.lax.dot_general(
                    hj, wt, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)
            y = acc * seg("fc2_s") + seg("fc2_b")
            return x + y.astype(bf16)

        x = jax.lax.fori_loop(0, L, layer_body, x_ref[...])
        x = ln(x, lnp_ref[0:1], lnp_ref[1:2])
        xo[...] = x

        # Phase 10: tied-embedding logits GEMV over the transposed table.
        edma(0).start()
        esdma(0).start()
        ntv = V_pad // TV
        for j in range(ntv):
            if j + 1 < ntv:
                edma(j + 1).start()
                esdma(j + 1).start()
            edma(j).wait()
            esdma(j).wait()
            wt = bufE[j % 2].astype(bf16)
            part = jax.lax.dot_general(
                x, wt, (((1,), (0,)), ((), ())), preferred_element_type=f32)
            lgo[:, pl.ds(j * TV, TV)] = part * bufEs[j % 2]

    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    hbm = functools.partial(pl.BlockSpec, memory_space=pltpu.HBM)
    i8 = jnp.int8

    @jax.jit
    def run(x, pos, sel, selt, lnp, cks, cvs, smalls, qkvw, ow, cqw, cow,
            fc1w, fc2w, skc, svc, ckc, cvc, asel, embt, embs):
        out_shapes = [
            jax.ShapeDtypeStruct((1, D), bf16),          # xo
            jax.ShapeDtypeStruct((L, 1, D), bf16),       # ko
            jax.ShapeDtypeStruct((L, 1, D), bf16),       # vo
            jax.ShapeDtypeStruct((T_pad, _HP), f32),     # alo
            jax.ShapeDtypeStruct((1, V_pad), f32),       # lgo
        ]
        return pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # pos
                vmem(),                                  # x
                vmem(), vmem(), vmem(), vmem(), vmem(),  # sel/selt/lnp/cks/cvs
                hbm(), hbm(), hbm(), hbm(), hbm(),       # smalls..cow
                hbm(), hbm(),                            # fc1w, fc2w
                hbm(), hbm(), hbm(), hbm(),              # skc, svc, ckc, cvc
                hbm(),                                   # asel
                hbm(), hbm(),                            # embt, embs
            ],
            out_specs=[vmem(), vmem(), vmem(), vmem(), vmem()],
            scratch_shapes=[
                pltpu.VMEM((2, 1, NS), f32),             # smb
                pltpu.VMEM((2, _HP, _HP), f32),          # asb
                pltpu.VMEM((T_pad, _HP), f32),           # clg
                pltpu.VMEM((S, D), bf16),                # skb
                pltpu.VMEM((S, D), bf16),                # svb
                pltpu.VMEM((2, D, TQ), i8),              # bufA
                pltpu.VMEM((2, D, TD), i8),              # bufO
                pltpu.VMEM((2, D, TD), i8),              # bufQ
                pltpu.VMEM((2, D, TD), i8),              # bufB
                pltpu.VMEM((2, TC, D), i8),              # bufK
                pltpu.VMEM((2, TC, D), i8),              # bufV
                pltpu.VMEM((2, D, TF), i8),              # buf1
                pltpu.VMEM((2, TCF, D), i8),             # buf2
                pltpu.VMEM((2, D, TV), i8),              # bufE
                pltpu.VMEM((2, 1, TV), f32),             # bufEs
                pltpu.SemaphoreType.DMA((2,)),           # semA
                pltpu.SemaphoreType.DMA((2,)),           # semO
                pltpu.SemaphoreType.DMA((2,)),           # semQ
                pltpu.SemaphoreType.DMA((2,)),           # semB
                pltpu.SemaphoreType.DMA((2,)),           # semK
                pltpu.SemaphoreType.DMA((2,)),           # semV
                pltpu.SemaphoreType.DMA((2,)),           # sem1
                pltpu.SemaphoreType.DMA((2,)),           # sem2
                pltpu.SemaphoreType.DMA((2,)),           # semE
                pltpu.SemaphoreType.DMA((2,)),           # semEs
                pltpu.SemaphoreType.DMA,                 # semSK
                pltpu.SemaphoreType.DMA,                 # semSV
                pltpu.SemaphoreType.DMA((2,)),           # semSM
                pltpu.SemaphoreType.DMA((2,)),           # semAS
            ],
            interpret=interpret,
        )(jnp.reshape(pos, (1,)).astype(jnp.int32), x, sel, selt, lnp,
          cks, cvs, smalls, qkvw, ow, cqw, cow, fc1w, fc2w, skc, svc,
          ckc, cvc, asel, embt, embs)

    return run


# skb/svb are module-level names only inside the kernel closure; define
# them as scratch by position. (See _build_mega_fn scratch list: they are
# appended below to keep the signature readable.)


# ---------------------------------------------------------------------------
# Step wrapper (drop-in for models.whisper.decoder_step on the mega path)
# ---------------------------------------------------------------------------


def mega_decoder_step(
    params: Dict[str, Any],
    token: jnp.ndarray,            # (1, 1) int32
    position: jnp.ndarray,         # scalar int32
    self_k: jnp.ndarray,           # (L, S, D) slot-major
    self_v: jnp.ndarray,
    cross: MegaCrossKV,
    arch: WhisperArch,
    capture_align: bool,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """One decode step through the megakernel.

    Returns (logits (1, V) f32, (new_self_k, new_self_v) slot-major,
    align (1, A, T_enc) f32) — the same contract as
    ``models.whisper.decoder_step`` modulo the cache layout.
    """
    from thewhisper_tpu.models.whisper import _embed_tokens

    dec = params["decoder"]
    mega = dec[MEGA_KEY]
    L, S, D = self_k.shape
    T_pad = cross.k.shape[1]
    V = dec["token_emb"]["q"].shape[0]
    V_pad = mega["embt"].shape[1]
    n_align = max(1, len(arch.alignment_heads))

    x = _embed_tokens(dec, token, position, jnp.bfloat16)[:, 0]   # (1, D)
    fn = _build_mega_fn(L, D, arch.d_ff, arch.decoder_heads, S, T_pad,
                        cross.t_enc, V, V_pad, capture_align, _interpret())
    sa = dec["layers"]["self"]
    ca = dec["layers"]["cross"]
    mlp = dec["layers"]["mlp"]
    xo, ko, vo, alo, lgo = fn(
        x, position, mega["sel"], mega["selt"], mega["lnp"], cross.ks,
        cross.vs, mega["smalls"], sa["qkv_w"]["q"], sa["o_w"]["q"],
        ca["q_w"]["q"], ca["o_w"]["q"], mlp["fc1_w"]["q"],
        mlp["fc2_w"]["q"], self_k, self_v, cross.k, cross.v,
        mega["asel"], mega["embt"], mega["embs"])

    # Single-slot cache write in XLA (where-iota, the production pattern —
    # Mosaic can't express the sub-tile DMA; tools/mega_caps_probe.py).
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, S, 1), 1) == position
    new_k = jnp.where(slot, ko.astype(self_k.dtype), self_k)
    new_v = jnp.where(slot, vo.astype(self_v.dtype), self_v)

    logits = lgo[:, :V]                                      # (1, V) f32
    align = jnp.transpose(alo[:cross.t_enc, :n_align])[None]  # (1, A, T)
    return logits, (new_k, new_v), align


# ---------------------------------------------------------------------------
# The verify megakernel: the same single-kernel step generalized to a
# W-token speculative-verify window (models.whisper.decoder_verify at
# bs=1). The W extra query rows ride the SAME weight stream — every GEMV
# becomes a (W_pad, in) @ (in, out) matmul over identical tiles — so a
# whole verify round costs barely more HBM traffic than one step. Cross
# attention switches to a flash-style online softmax (running max / sum /
# accumulator per query row) because storing W full (T_pad, 128) prob
# maps would blow the ~16 MB VMEM budget that the step kernel already
# sits near.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _build_mega_verify_fn(L: int, D: int, F: int, H: int, S: int,
                          T_pad: int, t_enc: int, V: int, V_pad: int,
                          W: int, WP: int, interpret: bool):
    """Build+jit the W-row verify megakernel for one static shape tuple."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dh = D // H
    scale = float(dh) ** -0.5
    D3 = 3 * D
    NS = 20 * D + 2 * F
    # Tighter tile caps than the step kernel: the verify kernel spends
    # its VMEM headroom on the 8-row smalls copy, the W-row outputs and
    # the per-row attention transients (first attempt OOMed vmem).
    TQ = _pick_tile(D3, 256)
    TD = _pick_tile(D, 256)
    TC = 256
    TCF = _pick_tile(F, 256)
    TF = _pick_tile(F, 256)
    TV = 256
    assert T_pad % TC == 0 and V_pad % TV == 0
    NTC = T_pad // TC
    f32, bf16 = jnp.float32, jnp.bfloat16

    offs = {}
    o = 0
    for name, width in (("ln1_s", D), ("ln1_b", D), ("qkv_s", D3),
                        ("qkv_b", D3), ("o_s", D), ("o_b", D),
                        ("lnc_s", D), ("lnc_b", D), ("cq_s", D),
                        ("cq_b", D), ("co_s", D), ("co_b", D),
                        ("ln2_s", D), ("ln2_b", D), ("fc1_s", F),
                        ("fc1_b", F), ("fc2_s", D), ("fc2_b", D)):
        offs[name] = (o, width)
        o += width
    assert o == NS

    def kernel(pos_ref, x_ref, sel_ref, selt_ref, lnp_ref, cks_ref, cvs_ref,
               smalls, qkvw, ow, cqw, cow, fc1w, fc2w, skc, svc, ckc, cvc,
               embt, embs,
               xo, ko, vo, lgo,
               smb, skb, svb,
               bufA, bufO, bufQ, bufB, bufK, bufV, buf1, buf2, bufE, bufEs,
               semA, semO, semQ, semB, semK, semV, sem1, sem2, semE, semEs,
               semSK, semSV, semSM):
        pos = pos_ref[0]

        def ln(x, s, b):
            x32 = x.astype(f32)
            mu = jnp.mean(x32, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
            y = (x32 - mu) * jax.lax.rsqrt(var + 1e-5)
            return (y * s + b).astype(bf16)

        def cdma(w_ref, buf, sem, l, j, tile):
            return pltpu.make_async_copy(
                w_ref.at[l, :, pl.ds(j * tile, tile)],
                buf.at[j % 2], sem.at[j % 2])

        def rdma(w_ref, buf, sem, l, j, tile):
            return pltpu.make_async_copy(
                w_ref.at[l, pl.ds(j * tile, tile), :],
                buf.at[j % 2], sem.at[j % 2])

        def sm_dma(l):
            return pltpu.make_async_copy(
                smalls.at[l], smb.at[jax.lax.rem(l, 2)],
                semSM.at[jax.lax.rem(l, 2)])

        def sk_dma(l):
            return pltpu.make_async_copy(skc.at[l], skb, semSK)

        def sv_dma(l):
            return pltpu.make_async_copy(svc.at[l], svb, semSV)

        def edma(j):
            return pltpu.make_async_copy(
                embt.at[:, pl.ds(j * TV, TV)], bufE.at[j % 2],
                semE.at[j % 2])

        def esdma(j):
            return pltpu.make_async_copy(
                embs.at[:, pl.ds(j * TV, TV)], bufEs.at[j % 2],
                semEs.at[j % 2])

        # Streamed (WP, in) @ int8 (L, in, out) over column tiles — the
        # step kernel's gemv_col verbatim; xin now carries WP rows.
        def gemm_col(l, xin, w_ref, buf, sem, n_out, tile, s_seg, b_seg,
                     chain=None, at_first=None):
            nt = n_out // tile
            parts = []
            for j in range(nt):
                if j == 0 and at_first is not None:
                    at_first()
                if j + 1 < nt:
                    cdma(w_ref, buf, sem, l, j + 1, tile).start()
                elif chain is not None:
                    chain()
                cdma(w_ref, buf, sem, l, j, tile).wait()
                wt = buf[j % 2].astype(bf16)
                part = jax.lax.dot_general(
                    xin, wt, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)
                lo, hi = j * tile, (j + 1) * tile
                parts.append(part * s_seg[:, lo:hi] + b_seg[:, lo:hi])
            return jnp.concatenate(parts, axis=1)     # (WP, n_out) f32

        # Prime layer 0.
        sm_dma(jnp.int32(0)).start()
        cdma(qkvw, bufA, semA, jnp.int32(0), 0, TQ).start()
        sk_dma(jnp.int32(0)).start()
        sv_dma(jnp.int32(0)).start()

        smask = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0) < pos
        pad_rows = jnp.zeros((WP - W, D), f32) if WP > W else None

        # Canonical-layout copy of row r of a (WP, d) value: a one-hot
        # sublane reduction (exact — the mask is 0/1). Direct x[r:r+1]
        # slices carry a sublane-offset layout that Mosaic refuses to
        # broadcast ("Invalid input layout"), same class as the seg()
        # lane-offset issue smalls8 solves.
        def row1(x, r):
            oh = (jax.lax.broadcasted_iota(jnp.int32, (WP, 1), 0)
                  == r).astype(x.dtype)
            return jnp.sum(x * oh, axis=0, keepdims=True)

        def layer_body(l, x):
            slot = jax.lax.rem(l, 2)
            sm_dma(l).wait()
            sm = smb[slot]                              # (8, NS)

            def seg(name):
                off, width = offs[name]
                return sm[:, off:off + width]           # (8, width)

            # Phase 1: ln1 + fused qkv.
            q_in = ln(x, seg("ln1_s"), seg("ln1_b"))
            qkv = gemm_col(
                l, q_in, qkvw, bufA, semA, D3, TQ, seg("qkv_s"),
                seg("qkv_b"),
                chain=lambda: cdma(ow, bufO, semO, l, 0, TD).start(),
            ).astype(bf16)
            q, kc, vc = qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:]
            ko[pl.ds(l, 1)] = kc[None]
            vo[pl.ds(l, 1)] = vc[None]

            # Phase 2: self-attention. Each query row r sees cache slots
            # < pos (slots >= window start are stale — decoder_verify's
            # cache_mask) plus in-window keys j <= r. Rows are unrolled:
            # attention math is tiny next to the shared weight stream.
            sk_dma(l).wait()
            sv_dma(l).wait()
            qsc = (q.astype(f32) * scale).astype(bf16)   # (WP, D)
            vc32 = vc.astype(f32)
            sv32 = svb[...].astype(f32)
            rows = []
            for r in range(W):
                qr = row1(qsc, r)                         # (1, D)
                lgs = jax.lax.dot_general(                # (S, HP)
                    skb[...] * qr, sel_ref[...],
                    (((1,), (0,)), ((), ())), preferred_element_type=f32)
                lgs = jnp.where(smask, lgs, _NEG)
                lw = jax.lax.dot_general(                 # (WP, HP)
                    kc * qr, sel_ref[...],
                    (((1,), (0,)), ((), ())), preferred_element_type=f32)
                wmask = jax.lax.broadcasted_iota(
                    jnp.int32, (WP, 1), 0) <= r
                lw = jnp.where(wmask, lw, _NEG)
                m = jnp.maximum(jnp.max(lgs, axis=0, keepdims=True),
                                jnp.max(lw, axis=0, keepdims=True))
                e = jnp.where(smask, jnp.exp(lgs - m), 0.0)
                ew = jnp.where(wmask, jnp.exp(lw - m), 0.0)
                z = (jnp.sum(e, axis=0, keepdims=True)
                     + jnp.sum(ew, axis=0, keepdims=True))
                pe = jax.lax.dot_general(                 # (S, D)
                    (e / z).astype(bf16), selt_ref[...],
                    (((1,), (0,)), ((), ())), preferred_element_type=f32)
                a_r = jnp.sum(pe * sv32, axis=0, keepdims=True)
                pw = jax.lax.dot_general(                 # (WP, D)
                    (ew / z).astype(bf16), selt_ref[...],
                    (((1,), (0,)), ((), ())), preferred_element_type=f32)
                a_r = a_r + jnp.sum(pw * vc32, axis=0, keepdims=True)
                rows.append(a_r)
            if pad_rows is not None:
                rows.append(pad_rows)
            attn = jnp.concatenate(rows, axis=0).astype(bf16)

            # Phase 3: self out-projection.
            o_out = gemm_col(
                l, attn, ow, bufO, semO, D, TD, seg("o_s"), seg("o_b"),
                chain=lambda: cdma(cqw, bufQ, semQ, l, 0, TD).start())
            x = x + o_out.astype(bf16)

            # Phase 4: cross query projection; chain primes K AND V tile
            # 0 (flash streams them together).
            def start_kv0():
                rdma(ckc, bufK, semK, l, 0, TC).start()
                rdma(cvc, bufV, semV, l, 0, TC).start()

            c_in = ln(x, seg("lnc_s"), seg("lnc_b"))
            cq = gemm_col(
                l, c_in, cqw, bufQ, semQ, D, TD, seg("cq_s"), seg("cq_b"),
                chain=start_kv0)
            cqs = (cq * cks_ref[l] * scale).astype(bf16)  # (WP, D)
            cq_rows = [row1(cqs, r) for r in range(W)]

            # Phase 5: flash cross-attention — one pass over K/V row
            # tiles with per-row running (max, sum, accumulator).
            ms = [jnp.full((1, _HP), _NEG, f32) for _ in range(W)]
            zs = [jnp.zeros((1, _HP), f32) for _ in range(W)]
            accs = [jnp.zeros((1, D), f32) for _ in range(W)]
            for j in range(NTC):
                if j + 1 < NTC:
                    rdma(ckc, bufK, semK, l, j + 1, TC).start()
                    rdma(cvc, bufV, semV, l, j + 1, TC).start()
                else:
                    cdma(cow, bufB, semB, l, 0, TD).start()
                rdma(ckc, bufK, semK, l, j, TC).wait()
                rdma(cvc, bufV, semV, l, j, TC).wait()
                kt = bufK[j % 2].astype(bf16)             # (TC, D)
                vt32 = bufV[j % 2].astype(bf16).astype(f32)
                tmask = (jax.lax.broadcasted_iota(jnp.int32, (TC, 1), 0)
                         + j * TC) < t_enc
                for r in range(W):
                    lg = jax.lax.dot_general(             # (TC, HP)
                        kt * cq_rows[r], sel_ref[...],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=f32)
                    lg = jnp.where(tmask, lg, _NEG)
                    mn = jnp.maximum(ms[r],
                                     jnp.max(lg, axis=0, keepdims=True))
                    alpha = jnp.exp(ms[r] - mn)           # (1, HP)
                    e = jnp.where(tmask, jnp.exp(lg - mn), 0.0)
                    zs[r] = zs[r] * alpha + jnp.sum(e, axis=0,
                                                    keepdims=True)
                    pex = jax.lax.dot_general(            # (TC, D)
                        e.astype(bf16), selt_ref[...],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=f32)
                    contrib = jnp.sum(pex * vt32, axis=0, keepdims=True)
                    alpha_d = jax.lax.dot_general(        # (1, D)
                        alpha.astype(bf16), selt_ref[...],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=f32)
                    accs[r] = accs[r] * alpha_d + contrib
                    ms[r] = mn
            rows = []
            for r in range(W):
                inv_d = jax.lax.dot_general(              # (1, D)
                    (1.0 / zs[r]).astype(bf16), selt_ref[...],
                    (((1,), (0,)), ((), ())), preferred_element_type=f32)
                rows.append(accs[r] * inv_d)
            if pad_rows is not None:
                rows.append(pad_rows)
            c_mrg = (jnp.concatenate(rows, axis=0)
                     * cvs_ref[l]).astype(bf16)           # (WP, D)

            # Phase 6: cross out-projection.
            co_out = gemm_col(
                l, c_mrg, cow, bufB, semB, D, TD, seg("co_s"), seg("co_b"),
                chain=lambda: cdma(fc1w, buf1, sem1, l, 0, TF).start())
            x = x + co_out.astype(bf16)

            # Phase 7: MLP fc1 (+ prefetch next layer's smalls/self K/V).
            def prefetch_next():
                @pl.when(l + 1 < L)
                def _():
                    sm_dma(l + 1).start()
                    sk_dma(l + 1).start()
                    sv_dma(l + 1).start()

            m_in = ln(x, seg("ln2_s"), seg("ln2_b"))
            h = gemm_col(
                l, m_in, fc1w, buf1, sem1, F, TF, seg("fc1_s"),
                seg("fc1_b"),
                chain=lambda: rdma(fc2w, buf2, sem2, l, 0, TCF).start(),
                at_first=prefetch_next)
            h = jax.nn.gelu(h.astype(bf16), approximate=True)

            # Phase 8: MLP fc2, row-tiled accumulation.
            nt2 = F // TCF
            acc = jnp.zeros((WP, D), f32)
            for j in range(nt2):
                if j + 1 < nt2:
                    rdma(fc2w, buf2, sem2, l, j + 1, TCF).start()
                else:
                    @pl.when(l + 1 < L)
                    def _():
                        cdma(qkvw, bufA, semA, l + 1, 0, TQ).start()
                rdma(fc2w, buf2, sem2, l, j, TCF).wait()
                wt = buf2[j % 2].astype(bf16)
                hj = h[:, j * TCF:(j + 1) * TCF]
                acc = acc + jax.lax.dot_general(
                    hj, wt, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)
            y = acc * seg("fc2_s") + seg("fc2_b")
            return x + y.astype(bf16)

        x = jax.lax.fori_loop(0, L, layer_body, x_ref[...])
        # lnp arrives (2, 1, D): leading-axis indexing yields canonical
        # (1, D) rows (a [1:2] slice of (2, D) would carry a sublane
        # offset Mosaic can't broadcast over the W rows).
        x = ln(x, lnp_ref[0], lnp_ref[1])
        xo[...] = x

        # Phase 9: tied-embedding logits over the transposed table.
        edma(0).start()
        esdma(0).start()
        ntv = V_pad // TV
        for j in range(ntv):
            if j + 1 < ntv:
                edma(j + 1).start()
                esdma(j + 1).start()
            edma(j).wait()
            esdma(j).wait()
            wt = bufE[j % 2].astype(bf16)
            part = jax.lax.dot_general(
                x, wt, (((1,), (0,)), ((), ())), preferred_element_type=f32)
            lgo[:, pl.ds(j * TV, TV)] = part * bufEs[j % 2]

    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    hbm = functools.partial(pl.BlockSpec, memory_space=pltpu.HBM)
    i8 = jnp.int8

    @jax.jit
    def run(x, pos, sel, selt, lnp, cks, cvs, smalls, qkvw, ow, cqw, cow,
            fc1w, fc2w, skc, svc, ckc, cvc, embt, embs):
        out_shapes = [
            jax.ShapeDtypeStruct((WP, D), bf16),          # xo
            jax.ShapeDtypeStruct((L, WP, D), bf16),       # ko
            jax.ShapeDtypeStruct((L, WP, D), bf16),       # vo
            jax.ShapeDtypeStruct((WP, V_pad), f32),       # lgo
        ]
        return pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),    # pos
                vmem(),                                   # x
                vmem(), vmem(), vmem(), vmem(), vmem(),
                hbm(), hbm(), hbm(), hbm(), hbm(),
                hbm(), hbm(),
                hbm(), hbm(), hbm(), hbm(),
                hbm(), hbm(),                             # embt, embs
            ],
            out_specs=[vmem(), vmem(), vmem(), vmem()],
            scratch_shapes=[
                pltpu.VMEM((2, WP, NS), f32),             # smb
                pltpu.VMEM((S, D), bf16),                 # skb
                pltpu.VMEM((S, D), bf16),                 # svb
                pltpu.VMEM((2, D, TQ), i8),               # bufA
                pltpu.VMEM((2, D, TD), i8),               # bufO
                pltpu.VMEM((2, D, TD), i8),               # bufQ
                pltpu.VMEM((2, D, TD), i8),               # bufB
                pltpu.VMEM((2, TC, D), i8),               # bufK
                pltpu.VMEM((2, TC, D), i8),               # bufV
                pltpu.VMEM((2, D, TF), i8),               # buf1
                pltpu.VMEM((2, TCF, D), i8),              # buf2
                pltpu.VMEM((2, D, TV), i8),               # bufE
                pltpu.VMEM((2, 1, TV), f32),              # bufEs
                pltpu.SemaphoreType.DMA((2,)),            # semA
                pltpu.SemaphoreType.DMA((2,)),            # semO
                pltpu.SemaphoreType.DMA((2,)),            # semQ
                pltpu.SemaphoreType.DMA((2,)),            # semB
                pltpu.SemaphoreType.DMA((2,)),            # semK
                pltpu.SemaphoreType.DMA((2,)),            # semV
                pltpu.SemaphoreType.DMA((2,)),            # sem1
                pltpu.SemaphoreType.DMA((2,)),            # sem2
                pltpu.SemaphoreType.DMA((2,)),            # semE
                pltpu.SemaphoreType.DMA((2,)),            # semEs
                pltpu.SemaphoreType.DMA,                  # semSK
                pltpu.SemaphoreType.DMA,                  # semSV
                pltpu.SemaphoreType.DMA((2,)),            # semSM
            ],
            interpret=interpret,
        )(jnp.reshape(pos, (1,)).astype(jnp.int32), x, sel, selt, lnp,
          cks, cvs, smalls, qkvw, ow, cqw, cow, fc1w, fc2w, skc, svc,
          ckc, cvc, embt, embs)

    return run


def mega_decoder_verify(
    params: Dict[str, Any],
    tokens: jnp.ndarray,           # (1, W) int32 window
    position: jnp.ndarray,         # scalar int32: cache slot of tokens[0, 0]
    self_k: jnp.ndarray,           # (L, S, D) slot-major
    self_v: jnp.ndarray,
    cross: MegaCrossKV,
    arch: WhisperArch,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """One speculative-verify window through the verify megakernel.

    Same contract as ``models.whisper.decoder_verify`` at bs=1 modulo the
    slot-major cache layout: returns (logits (1, W, V) f32,
    (new_self_k, new_self_v), align). Alignment capture is NOT supported
    (the flash-style cross pass never materializes the full prob map);
    the returned align is zeros and callers must route alignment-needing
    decodes to the XLA verify.
    """
    from thewhisper_tpu.models.whisper import _token_table_lookup

    dec = params["decoder"]
    mega = dec[MEGA_KEY]
    L, S, D = self_k.shape
    W = tokens.shape[1]
    WP = _pad_up(max(W, 2), 8)
    T_pad = cross.k.shape[1]
    V = dec["token_emb"]["q"].shape[0]
    V_pad = mega["embt"].shape[1]
    n_align = max(1, len(arch.alignment_heads))

    emb = _token_table_lookup(dec["token_emb"], tokens, jnp.bfloat16)[0]
    rows = position + jnp.arange(W)                          # window slots
    emb_rows = jnp.clip(rows, 0, dec["pos_emb"].shape[0] - 1)
    x = emb + dec["pos_emb"][emb_rows].astype(jnp.bfloat16)  # (W, D)
    if WP > W:
        x = jnp.pad(x, ((0, WP - W), (0, 0)))

    fn = _build_mega_verify_fn(L, D, arch.d_ff, arch.decoder_heads, S,
                               T_pad, cross.t_enc, V, V_pad, W, WP,
                               _interpret())
    sa = dec["layers"]["self"]
    ca = dec["layers"]["cross"]
    mlp = dec["layers"]["mlp"]
    # The kernel broadcasts each per-layer scale row over the WP query
    # rows by carrying a physically tiled (L, WP, NS) copy (Mosaic can't
    # broadcast a lane-offset slice). pack_mega_params ships the WP=8
    # tile; wider windows (and pre-verify-kernel trees) tile here — a
    # caller inside a while_loop must hoist via ensure_verify_smalls or
    # this materializes ~(L*WP*NS*4) bytes per round (ADVICE r4).
    smalls8 = mega.get("smalls8")
    if smalls8 is None or smalls8.shape[1] != WP:
        smalls8 = jnp.tile(mega["smalls"], (1, WP, 1))
    xo, ko, vo, lgo = fn(
        x, position, mega["sel"], mega["selt"],
        mega["lnp"][:, None], cross.ks,
        cross.vs, smalls8, sa["qkv_w"]["q"], sa["o_w"]["q"],
        ca["q_w"]["q"], ca["o_w"]["q"], mlp["fc1_w"]["q"],
        mlp["fc2_w"]["q"], self_k, self_v, cross.k, cross.v,
        mega["embt"], mega["embs"])

    # Window cache write: one-hot contraction in XLA (exact select at
    # HIGHEST — the _stack_verify pattern; per-row slots pos..pos+W-1).
    oh = (rows[:, None] == jnp.arange(S)[None, :]).astype(self_k.dtype)
    kw = ko[:, :W].astype(self_k.dtype)                      # (L, W, D)
    vw = vo[:, :W].astype(self_v.dtype)
    upd_k = jnp.einsum("lwd,ws->lsd", kw, oh,
                       precision=jax.lax.Precision.HIGHEST)
    upd_v = jnp.einsum("lwd,ws->lsd", vw, oh,
                       precision=jax.lax.Precision.HIGHEST)
    written = jnp.any(oh > 0, axis=0)[None, :, None]         # (1, S, 1)
    new_k = jnp.where(written, upd_k.astype(self_k.dtype), self_k)
    new_v = jnp.where(written, upd_v.astype(self_v.dtype), self_v)

    logits = lgo[:W, :V][None]                               # (1, W, V)
    align = jnp.zeros((1, W, n_align, cross.t_enc), jnp.float32)
    return logits, (new_k, new_v), align

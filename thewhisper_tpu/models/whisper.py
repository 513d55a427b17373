"""Whisper encoder/decoder as pure-functional JAX on parameter pytrees.

TPU-first design decisions (vs the reference's MLX/torch graphs,
``apple/mlx_modules.py``):

- Per-layer weights are **stacked along a leading layer axis** and the
  transformer stack is a single ``lax.scan`` — one compiled layer body
  instead of L unrolled layers, which keeps XLA compile time flat in depth
  (the reference's 32-layer encoder would otherwise dominate compile).
- Attention is plain einsum + softmax; XLA fuses the elementwise tail and
  maps the contractions onto the MXU. bf16 activations, f32 layernorm and
  softmax accumulation.
- The decoder exposes two entry points: ``decoder_prefill`` (full forced
  prompt at once, builds the KV cache) and ``decoder_step`` (one token with
  an in-place-updated static cache). Both return cross-attention
  probabilities *pre-reduced over the checkpoint's alignment heads* — the
  DTW word-timestamp input — so the decode loop stores (B, A, T_enc) per
  step instead of all heads (the reference recomputes QK on a slow path for
  this, ``mlx_modules.py:97-119``).

Parameter layout (all linear weights stored (in, out), i.e. transposed from
HF's ``nn.Linear``): see ``models/load.py`` for the exact mapping.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from thewhisper_tpu.config import WhisperArch

# A params "pytree" is a nested dict of jnp arrays:
# {
#   "encoder": {
#     "conv1": {"w": (d, n_mels, 3), "b": (d,)},
#     "conv2": {"w": (d, d, 3), "b": (d,)},
#     "pos_emb": (T_src, d),
#     "layers": { ... each leaf has leading dim L_enc ... },
#     "ln_post": {"scale": (d,), "bias": (d,)},
#   },
#   "decoder": {
#     "token_emb": (vocab, d),
#     "pos_emb": (448, d),
#     "layers": { ... leading dim L_dec ... },
#     "ln_post": {"scale": (d,), "bias": (d,)},
#   },
# }
WhisperParams = Dict[str, Any]


class DecodeCache(NamedTuple):
    """Static-shape KV cache — the "flexi-static" analog (SURVEY 2.5).

    Feature-major layout (L, B, H, dh, S): the long sequence dim rides the
    128-lane axis, so cached reads waste nothing (head_dim=64 in the
    sequence-minor layout pads every tile to 128 lanes — a measured ~2x
    HBM inflation on the decode hot loop). self_k/self_v have S = S_max
    with the current slot updated in place; cross_k/cross_v have S = T_enc
    and are computed once per audio window.
    """

    self_k: jnp.ndarray
    self_v: jnp.ndarray
    cross_k: jnp.ndarray
    cross_v: jnp.ndarray


def _prec(dtype) -> Optional[jax.lax.Precision]:
    """Matmul/conv precision: true f32 when computing in f32.

    XLA's default precision for f32 contractions is reduced (bf16 passes on
    TPU, and a low-precision conv path on CPU, ~1e-1 abs error observed).
    bf16 compute keeps the fast MXU-native default.
    """
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


def _layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def _quantize_rows(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic per-row symmetric int8: x ~= q * s[..., None]."""
    x32 = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1), 1e-8) / 127.0
    q = jnp.clip(jnp.round(x32 / s[..., None]), -127, 127).astype(jnp.int8)
    return q, s


def _linear_int8(xq: jnp.ndarray, xs: jnp.ndarray, w: Dict[str, Any],
                 b: Optional[jnp.ndarray], dtype) -> jnp.ndarray:
    """int8 x int8 MXU matmul on pre-quantized activations (W8A8 path)."""
    acc = jnp.einsum(
        "...i,io->...o", xq, w["q8"], preferred_element_type=jnp.int32)
    y = (acc.astype(jnp.float32) * xs[..., None]
         * w["s8"].astype(jnp.float32)[..., None, :]).astype(dtype)
    if b is not None:
        y = y + b.astype(dtype)
    return y


def _linear(x: jnp.ndarray, w, b: Optional[jnp.ndarray]) -> jnp.ndarray:
    if isinstance(w, dict) and "q8" in w:
        # W8A8: per-row dynamic activation int8 + int8 x int8 MXU matmul
        # (measured ~1.3-1.4x bf16 end to end on v5e,
        # tools/int8_matmul_probe.py); scales fold back after the dot.
        xq, xs = _quantize_rows(x)
        return _linear_int8(xq, xs, w, b, x.dtype)
    if isinstance(w, dict):  # int8 weight-only leaf {"q", "s"} (models.quant)
        w = w["q"].astype(x.dtype) * w["s"].astype(x.dtype)[..., None, :]
    else:
        w = w.astype(x.dtype)
    y = jnp.einsum("...i,io->...o", x, w, precision=_prec(x.dtype))
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def _split_heads(x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    """(B, S, d) -> (B, S, H, dh)."""
    b, s, d = x.shape
    return x.reshape(b, s, n_heads, d // n_heads)


def _flash_enabled() -> bool:
    import os

    return (jax.default_backend() == "tpu"
            and os.environ.get("WHISPER_FLASH_ATTENTION", "1") != "0")


def _flash_blocks() -> Tuple[int, int]:
    """Flash-attention (block_q, block_k) — env-tunable for perf probes."""
    import os

    raw = os.environ.get("WHISPER_FLASH_BLOCK", "512,512")
    try:
        q, k = (int(x) for x in raw.split(","))
        return q, k
    except ValueError:
        return 512, 512


def _flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     valid_len: Optional[int] = None) -> jnp.ndarray:
    """Pallas TPU flash attention for long unmasked sequences.

    The naive path materializes (B, H, S, S) logits in HBM — at the 30 s
    bucket (S=1500, 20 heads) that is terabytes of traffic per batch and
    dominated the encoder (measured: bs=32 RTFx 245 without flash).

    Sequences pad to a 512 multiple. When the caller already padded
    (``valid_len`` set, the pad-once encoder), only the segment-id mask is
    built here — round-2 profiling showed the per-layer q/k/v pads +
    unpads cost ~100 ms of the 900 ms bs=32x30 s encoder.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    b, s, h, dh = q.shape
    s_pad = ((s + 511) // 512) * 512
    pad = s_pad - s
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    segment_ids = None
    if pad:
        qt, kt, vt = (
            jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0))) for x in (qt, kt, vt))
    if pad or (valid_len is not None and valid_len < s):
        n_valid = valid_len if valid_len is not None else s
        seg = jnp.where(
            jnp.arange(s_pad)[None, :] < n_valid, 0, 1
        ).astype(jnp.int32) * jnp.ones((b, 1), jnp.int32)
        segment_ids = SegmentIds(q=seg, kv=seg)
    bq, bk = _flash_blocks()
    bq, bk = min(bq, s_pad), min(bk, s_pad)
    out = flash_attention(
        qt, kt, vt, segment_ids=segment_ids, causal=False,
        sm_scale=float(dh) ** -0.5,
        block_sizes=BlockSizes(block_q=bq, block_k_major=bk,
                               block_k=bk, block_b=1),
    )
    out = out[:, :, :s, :].astype(q.dtype)
    return jnp.transpose(out, (0, 2, 1, 3))


def _attention(
    q: jnp.ndarray,     # (B, Sq, H, dh)
    k: jnp.ndarray,     # (B, Sk, H, dh)
    v: jnp.ndarray,     # (B, Sk, H, dh)
    mask: Optional[jnp.ndarray],  # broadcastable to (B, H, Sq, Sk), True=keep
    return_probs: bool = False,
    valid_len: Optional[int] = None,
    allow_flash: bool = True,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    dh = q.shape[-1]
    if (allow_flash and mask is None and not return_probs
            and q.shape[1] >= 256
            and q.shape[1] == k.shape[1] and _flash_enabled()):
        return _flash_attention(q, k, v, valid_len=valid_len), None
    scale = dh ** -0.5
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q * scale, k, preferred_element_type=jnp.float32,
        precision=_prec(q.dtype),
    )
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.float32(-1e9))
    probs32 = jax.nn.softmax(logits, axis=-1)
    probs = probs32.astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v, precision=_prec(v.dtype))
    return out, (probs32 if return_probs else None)


def _fuse_qkv_enabled() -> bool:
    import os

    # Measured SLOWER on v5e (971 vs 928 ms encoder): off by default.
    return os.environ.get("WHISPER_FUSE_QKV", "0") != "0"


def _mha(
    x: jnp.ndarray,
    kv: jnp.ndarray,
    p: Dict[str, Any],
    n_heads: int,
    mask: Optional[jnp.ndarray] = None,
    return_probs: bool = False,
    valid_len: Optional[int] = None,
    allow_flash: bool = True,
):
    """Full attention: project q from x, k/v from kv, combine heads."""
    if x is kv and not isinstance(p["q_w"], dict) and _fuse_qkv_enabled():
        # Self-attention: one (d, 3d) matmul instead of three (d, d) —
        # fewer, better-shaped MXU calls (k has no bias in Whisper).
        d = x.shape[-1]
        w = jnp.concatenate([p["q_w"], p["k_w"], p["v_w"]], axis=1)
        b_ = jnp.concatenate(
            [p["q_b"], jnp.zeros_like(p["q_b"]), p["v_b"]])
        qkv = _linear(x, w, b_)
        q = _split_heads(qkv[..., :d], n_heads)
        k = _split_heads(qkv[..., d: 2 * d], n_heads)
        v = _split_heads(qkv[..., 2 * d:], n_heads)
    elif x is kv and isinstance(p["q_w"], dict) and "q8" in p["q_w"]:
        # W8A8 self-attention: quantize the shared input once for q/k/v.
        xq, xs = _quantize_rows(x)
        q = _split_heads(_linear_int8(xq, xs, p["q_w"], p["q_b"], x.dtype), n_heads)
        k = _split_heads(_linear_int8(xq, xs, p["k_w"], None, x.dtype), n_heads)
        v = _split_heads(_linear_int8(xq, xs, p["v_w"], p["v_b"], x.dtype), n_heads)
    else:
        q = _split_heads(_linear(x, p["q_w"], p["q_b"]), n_heads)
        k = _split_heads(_linear(kv, p["k_w"], None), n_heads)
        v = _split_heads(_linear(kv, p["v_w"], p["v_b"]), n_heads)
    out, probs = _attention(q, k, v, mask, return_probs, valid_len=valid_len,
                            allow_flash=allow_flash)
    b, s, h, dh = out.shape
    out = _linear(out.reshape(b, s, h * dh), p["o_w"], p["o_b"])
    return out, probs


def _gelu(x: jnp.ndarray) -> jnp.ndarray:
    """GELU: exact erf in f32, tanh approximation in low precision.

    Measured on v5e (tools/gelu_probe.py): exact erf costs ~4.5 ms per
    MLP-volume application (bs=32 x 30 s) vs ~1.2 ms for tanh — ~105 ms
    across the 32-layer encoder. The tanh approximation's error (<= 3e-3
    absolute, at |x|~2.3 where the bf16 ULP is 1.6e-2) is below half an
    ULP of the bf16 activations, so bf16 outputs round identically almost
    everywhere; the f32 path keeps exact erf for HF parity tests.
    """
    exact = x.dtype == jnp.float32
    return jax.nn.gelu(x, approximate=not exact)


def _mlp(x: jnp.ndarray, p: Dict[str, Any]) -> jnp.ndarray:
    h = _linear(x, p["fc1_w"], p["fc1_b"])
    h = _gelu(h)
    return _linear(h, p["fc2_w"], p["fc2_b"])


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _conv_stem(mel: jnp.ndarray, enc: Dict[str, Any], dtype) -> jnp.ndarray:
    """Whisper's conv stem: k=3 conv1 + stride-2 conv2, GELU after each
    (reference ``mlx_modules.py:186-187``). Returns time-major (B, T//2, d).

    Measured on v5e (tools/conv_stem_probe.py, bs=32 x 30 s): XLA's native
    1-D conv lowering runs this in ~25 ms; re-expressing the convs as
    3-tap shifted matmuls measured *slower* (~32 ms) — the strided tap
    slices and f32 accumulator passes cost more than conv's internal
    im2col. Keep the native conv.
    """
    x = mel.astype(dtype)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, enc["conv1"]["w"].shape, ("NCH", "OIH", "NCH"))
    x = jax.lax.conv_general_dilated(
        x, enc["conv1"]["w"].astype(dtype), (1,), [(1, 1)],
        dimension_numbers=dn, preferred_element_type=jnp.float32,
        precision=_prec(dtype),
    ).astype(dtype) + enc["conv1"]["b"].astype(dtype)[None, :, None]
    x = _gelu(x)
    dn2 = jax.lax.conv_dimension_numbers(
        x.shape, enc["conv2"]["w"].shape, ("NCH", "OIH", "NCH"))
    x = jax.lax.conv_general_dilated(
        x, enc["conv2"]["w"].astype(dtype), (2,), [(1, 1)],
        dimension_numbers=dn2, preferred_element_type=jnp.float32,
        precision=_prec(dtype),
    ).astype(dtype) + enc["conv2"]["b"].astype(dtype)[None, :, None]
    x = _gelu(x)
    return jnp.transpose(x, (0, 2, 1))                    # (B, T//2, d)


@functools.partial(
    jax.jit,
    static_argnames=("arch", "compute_dtype", "act_sharding", "remat"))
def encoder_forward(
    params: WhisperParams,
    mel: jnp.ndarray,            # (B, n_mels, T_mel)
    arch: WhisperArch,
    compute_dtype: jnp.dtype = jnp.float32,
    act_sharding=None,
    remat: bool = False,
) -> jnp.ndarray:
    """Conv stem + transformer stack + final LN. Returns (B, T_mel//2, d).

    ``remat=True`` wraps each layer body in ``jax.checkpoint``: the
    backward pass recomputes layer internals instead of storing them, so
    training activation memory drops from O(layers x internals) to the
    layer-boundary residual stream (~8x for this block shape) at ~1/3 extra
    FLOPs — the standard trade for fitting large-v3 fine-tunes on one chip.
    Inference-only callers leave it off (no backward pass, no benefit).

    Flexible chunks: the caller supplies ``params["encoder"]["pos_emb"]``
    already truncated (flexible fine-tunes, ``mlx_modules.py:198-199``) or
    interpolated (HF weights, ``nvidia/asr_pipeline.py:15-27``) to
    ``T_mel // 2`` rows — both mechanisms live in ``models/load.py``.

    ``act_sharding``: optional ``NamedSharding`` for the (B, T, d)
    activations, re-asserted at every layer boundary. Sharding the T axis
    over a mesh axis gives **sequence parallelism** for long audio: LN /
    MLP / projections run fully sharded over time, and GSPMD all-gathers
    K/V per attention only (``parallel.mesh.seq_sharding``).
    """
    enc = params["encoder"]
    x = _conv_stem(mel, enc, compute_dtype)             # (B, T, d)
    t = x.shape[1]
    n_pos = enc["pos_emb"].shape[0]
    if t > n_pos:
        raise ValueError(
            f"mel input produces {t} encoder positions but the loaded "
            f"position table has {n_pos} — the featurizer chunk length "
            f"exceeds the checkpoint's (interpolated/truncated) "
            f"max_source_positions")
    x = x + enc["pos_emb"][:t].astype(compute_dtype)

    # Pad ONCE to the flash-attention block multiple and run every layer
    # pad-free (flash masks the pad rows via segment ids; LN/MLP on the
    # isolated garbage rows is 2% wasted compute). Round-2 profiling: the
    # per-layer q/k/v pad + output slice cost ~100 ms of the 900 ms
    # bs=32 x 30 s encoder.
    # Sequence parallelism disables the Pallas flash kernel: GSPMD has no
    # partitioning rule for the Mosaic custom call, so a time-sharded
    # input would be gathered/replicated per chip — the opposite of SP's
    # purpose. The einsum path partitions cleanly (logits sharded over the
    # q-time axis, K/V all-gathered per layer).
    use_flash = _flash_enabled() and t >= 256 and act_sharding is None
    valid_len = None
    if use_flash and t % 512:
        s_pad = ((t + 511) // 512) * 512
        x = jnp.pad(x, ((0, 0), (0, s_pad - t), (0, 0)))
        valid_len = t

    n_heads = arch.encoder_heads

    if act_sharding is not None:
        x = jax.lax.with_sharding_constraint(x, act_sharding)

    def layer(carry, lp):
        h = carry
        a_in = _layer_norm(h, lp["ln1"]["scale"], lp["ln1"]["bias"])
        a, _ = _mha(a_in, a_in, lp["attn"], n_heads, valid_len=valid_len,
                    allow_flash=use_flash)
        h = h + a
        m = _mlp(_layer_norm(h, lp["ln2"]["scale"], lp["ln2"]["bias"]), lp["mlp"])
        h = h + m
        if act_sharding is not None:
            h = jax.lax.with_sharding_constraint(h, act_sharding)
        return h, None

    import os

    if remat:
        layer = jax.checkpoint(layer)
    unroll = int(os.environ.get("WHISPER_ENCODER_UNROLL", "1"))
    x, _ = jax.lax.scan(layer, x, enc["layers"], unroll=unroll)
    if valid_len is not None:
        x = x[:, :t]
    x = _layer_norm(x, enc["ln_post"]["scale"], enc["ln_post"]["bias"])
    return x


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _alignment_selector(arch: WhisperArch) -> np.ndarray:
    """(L, H, A) one-hot selecting each alignment head's (layer, head).

    Contracting per-layer cross-attention probs with this tensor inside the
    layer scan accumulates exactly the alignment-head rows — no full
    (L, H, ...) attention ever materializes (cf. ``model.py:730-743``).
    """
    heads = arch.alignment_heads
    a = max(1, len(heads))
    sel = np.zeros((arch.decoder_layers, arch.decoder_heads, a), dtype=np.float32)
    for i, (layer, head) in enumerate(heads):
        sel[layer, head, i] = 1.0
    return sel


def compute_cross_kv(
    params: WhisperParams, enc_out: jnp.ndarray, arch: WhisperArch
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Precompute cross-attention K/V for all layers: (L, B, H, T, dh)."""
    n_heads = arch.decoder_heads

    def one_layer(lp):
        k = _split_heads(_linear(enc_out, lp["cross"]["k_w"], None), n_heads)
        v = _split_heads(_linear(enc_out, lp["cross"]["v_w"], lp["cross"]["v_b"]), n_heads)
        # (B, T, H, dh) -> feature-major (B, H, dh, T).
        return jnp.transpose(k, (0, 2, 3, 1)), jnp.transpose(v, (0, 2, 3, 1))

    k, v = jax.vmap(one_layer)(params["decoder"]["layers"])
    return k, v


def _attn_feature_major(q, k, v, mask, return_probs=False, extra_logit=None,
                        extra_v=None):
    """Attention with K/V cached feature-major: q (B, H, Sq, dh),
    k/v (B, H, dh, Skv).

    ``extra_logit`` (B, H, Sq, 1) / ``extra_v`` (B, H, Sq, dh) append one
    out-of-cache key per query (the token being decoded, whose K/V has not
    been written back yet).
    """
    dh = q.shape[-1]
    scale = dh ** -0.5
    logits = jnp.einsum(
        "bhqd,bhds->bhqs", q * scale, k, preferred_element_type=jnp.float32,
        precision=_prec(q.dtype),
    )
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.float32(-1e9))
    if extra_logit is not None:
        logits = jnp.concatenate([logits, extra_logit], axis=-1)
    probs32 = jax.nn.softmax(logits, axis=-1)
    if extra_logit is not None:
        pc, ps = probs32[..., :-1], probs32[..., -1:]
        out = (jnp.einsum("bhqs,bhds->bhqd", pc.astype(v.dtype), v,
                          precision=_prec(v.dtype))
               + ps.astype(v.dtype) * extra_v)
    else:
        out = jnp.einsum("bhqs,bhds->bhqd", probs32.astype(v.dtype), v,
                         precision=_prec(v.dtype))
    return out, (probs32 if return_probs else None)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, S, dh) -> (B, S, H*dh)."""
    b, h, sq, dh = x.shape
    return jnp.transpose(x, (0, 2, 1, 3)).reshape(b, sq, h * dh)


def _cross_and_mlp(h, lp, n_heads, cross_k, cross_v, align_sel):
    """Shared cross-attention + MLP tail of a decoder layer.

    ``cross_k``/``cross_v`` may be int8 dicts from ``models.quant
    .quantize_kv``: the K scale folds into the query and the V scale into
    the attention output, keeping the dots int8-fed.
    """
    b, sq, _ = h.shape
    c_in = _layer_norm(h, lp["ln_cross"]["scale"], lp["ln_cross"]["bias"])
    cq = jnp.transpose(
        _split_heads(_linear(c_in, lp["cross"]["q_w"], lp["cross"]["q_b"]),
                     n_heads), (0, 2, 1, 3))
    if isinstance(cross_k, dict):
        cq_eff = cq * cross_k["s"][:, :, None, :].astype(cq.dtype)
        c, probs = _attn_feature_major(
            cq_eff, cross_k["q"].astype(cq.dtype),
            cross_v["q"].astype(cq.dtype), None, return_probs=True)
        c = c * cross_v["s"][:, :, None, :].astype(c.dtype)
    else:
        c, probs = _attn_feature_major(
            cq, cross_k.astype(cq.dtype), cross_v.astype(cq.dtype), None,
            return_probs=True)
    align = jnp.einsum("bhqk,ha->bqak", probs, align_sel)
    h = h + _linear(_merge_heads(c), lp["cross"]["o_w"], lp["cross"]["o_b"])
    h = h + _mlp(_layer_norm(h, lp["ln2"]["scale"], lp["ln2"]["bias"]), lp["mlp"])
    return h, align


def _decoder_unroll(arch: WhisperArch, batch: int) -> int:
    """Layer-scan unroll policy shared by prefill/step/verify.

    FULLY unrolling a shallow decoder removes the scan's per-iteration
    overhead from the small-batch passes on TPU: turbo (4 layers) bs=1
    int8 3320 -> 4115 tok/s (tools/decode_bs1_probe.py). PARTIAL unroll
    of a deep decoder is the opposite — on large-v3 (32 layers) the
    int8 step measured 2.07 ms rolled vs 2.87 at unroll=4 and 4.82 at
    unroll=16 (bf16: 3.0 vs 5.2), i.e. bigger scan bodies scheduled
    WORSE than the rolled loop (tools/xl_unroll_probe.py) — so the
    policy is full-unroll-or-roll. At bs=32 the pass is cross-KV-bound
    and even turbo's full unroll measured a ~2% LOSS, so large batches
    stay rolled. On CPU (tests, dryrun) the win doesn't exist but the
    4x-larger loop bodies multiply XLA:CPU compile time across every
    bucketed program — default rolled there. WHISPER_DECODER_UNROLL
    overrides everything.
    """
    import os

    env = os.environ.get("WHISPER_DECODER_UNROLL")
    if env is not None:
        return int(env)
    if batch > 8 or jax.default_backend() != "tpu":
        return 1
    return arch.decoder_layers if arch.decoder_layers <= 4 else 1


def fuse_self_qkv_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Pre-concatenate each decoder layer's self q/k/v into one (in, 3d)
    projection leaf (``qkv_w``/``qkv_b``), dropping the separate leaves.

    The bs=1 decode step is per-kernel-overhead-bound (int4 halved the
    weight bytes for only 8-10%, models/quant.py); one fused GEMV per
    layer instead of three measured 1.045x on the large-v3 step
    (tools/qkv_fuse_probe.py: 2.13 -> 2.04 ms interleaved). Applied by
    ``WhisperEngine`` at init on single-chip engines — the fused out
    axis mixes q/k/v channels, which the TP pspecs don't describe, so
    meshed engines keep the separate leaves. Works on bf16 arrays and
    weight-only int8 ``{"q", "s"}`` leaves (per-out-channel scales
    concatenate right along); anything else (e.g. W8A8) is left alone.
    NOTE the trace-time concat variant of this fusion measured SLOWER
    on the ENCODER (``_fuse_qkv_enabled``) — compute-bound matmuls
    don't care, and the per-call concat costs; pre-fusing the scanned
    decode weights is the case that pays."""
    dec = params.get("decoder")
    if not dec:
        return params
    sa = dec["layers"].get("self")
    if not sa or "qkv_w" in sa:
        return params
    q_w, k_w, v_w = sa["q_w"], sa["k_w"], sa["v_w"]
    leaves = (q_w, k_w, v_w)
    if all(isinstance(w, dict) and set(w) == {"q", "s"} for w in leaves):
        qkv_w: Any = {
            "q": jnp.concatenate([q_w["q"], k_w["q"], v_w["q"]], axis=-1),
            "s": jnp.concatenate([q_w["s"], k_w["s"], v_w["s"]], axis=-1),
        }
    elif all(not isinstance(w, dict) for w in leaves):
        qkv_w = jnp.concatenate([q_w, k_w, v_w], axis=-1)
    else:
        return params
    qkv_b = jnp.concatenate(
        [sa["q_b"], jnp.zeros_like(sa["q_b"]), sa["v_b"]], axis=-1)
    new_sa = {k: v for k, v in sa.items()
              if k not in ("q_w", "k_w", "v_w", "q_b", "v_b")}
    new_sa["qkv_w"] = qkv_w
    new_sa["qkv_b"] = qkv_b
    new_layers = dict(dec["layers"])
    new_layers["self"] = new_sa
    new_dec = dict(dec)
    new_dec["layers"] = new_layers
    out = dict(params)
    out["decoder"] = new_dec
    return out


def _self_qkv(q_in: jnp.ndarray, sa: Dict[str, Any]):
    """Self-attention projections -> (q, k, v), each (B, S, d); one fused
    GEMV when the params carry ``qkv_w`` (see fuse_self_qkv_params)."""
    if "qkv_w" in sa:
        qkv = _linear(q_in, sa["qkv_w"], sa["qkv_b"])
        return jnp.split(qkv, 3, axis=-1)
    return (_linear(q_in, sa["q_w"], sa["q_b"]),
            _linear(q_in, sa["k_w"], None),
            _linear(q_in, sa["v_w"], sa["v_b"]))


def _stack_prefill(params, x, arch, self_mask, cache, cache_index, align_sel):
    """Prompt pass: fill cache slots [cache_index, cache_index + S).

    Rewrites the full per-layer cache (fine: once per audio window).
    """
    dec = params["decoder"]
    n_heads = arch.decoder_heads

    def layer(carry, xs):
        h = carry
        lp, cross_k, cross_v, self_k, self_v = xs
        q_in = _layer_norm(h, lp["ln1"]["scale"], lp["ln1"]["bias"])
        q_p, k_p, v_p = _self_qkv(q_in, lp["self"])
        q = jnp.transpose(_split_heads(q_p, n_heads), (0, 2, 1, 3))
        # K/V straight to feature-major (B, H, dh, P).
        k = jnp.transpose(_split_heads(k_p, n_heads), (0, 2, 3, 1))
        v = jnp.transpose(_split_heads(v_p, n_heads), (0, 2, 3, 1))
        self_k = jax.lax.dynamic_update_slice(
            self_k, k.astype(self_k.dtype), (0, 0, 0, cache_index))
        self_v = jax.lax.dynamic_update_slice(
            self_v, v.astype(self_v.dtype), (0, 0, 0, cache_index))
        a, _ = _attn_feature_major(
            q, self_k.astype(q.dtype), self_v.astype(q.dtype), self_mask)
        h = h + _linear(_merge_heads(a), lp["self"]["o_w"], lp["self"]["o_b"])
        h, align = _cross_and_mlp(h, lp, n_heads, cross_k, cross_v,
                                  xs[0]["_align_sel"])
        return h, (self_k, self_v, align)

    layers = dict(dec["layers"])
    layers["_align_sel"] = jnp.asarray(align_sel)
    xs = (layers, cache.cross_k, cache.cross_v, cache.self_k, cache.self_v)
    # Prefill is once per call but sits on the TTFT path; same unroll
    # policy as _stack_step/_stack_verify.
    x, (new_k, new_v, aligns) = jax.lax.scan(
        layer, x, xs, unroll=_decoder_unroll(arch, x.shape[0]))
    new_cache = DecodeCache(new_k, new_v, cache.cross_k, cache.cross_v)
    x = _layer_norm(x, dec["ln_post"]["scale"], dec["ln_post"]["bias"])
    return x, new_cache, jnp.sum(aligns, axis=0)


def _stack_step(params, x, arch, cache, position, align_sel):
    """Single-token pass: attend over cache slots < position plus the
    current token's fresh K/V, writing back only one slot per layer.

    The naive alternative (rewriting the stacked cache through scan ys)
    copies the whole self cache every token — measured ~2.4 ms/step at
    bs=32 with a 228-slot cache.
    """
    dec = params["decoder"]
    n_heads = arch.decoder_heads
    s_max = cache.self_k.shape[4]
    # Keys strictly below `position`: the slot at `position` is stale.
    mask = (jnp.arange(s_max) < position)[None, None, None, :]

    def layer(carry, xs):
        h = carry
        lp, cross_k, cross_v, self_k, self_v = xs
        q_in = _layer_norm(h, lp["ln1"]["scale"], lp["ln1"]["bias"])
        q_p, k_p, v_p = _self_qkv(q_in, lp["self"])
        q = jnp.transpose(_split_heads(q_p, n_heads), (0, 2, 1, 3))  # (B, H, 1, dh)
        k = jnp.transpose(_split_heads(k_p, n_heads), (0, 2, 1, 3))
        v = jnp.transpose(_split_heads(v_p, n_heads), (0, 2, 1, 3))
        dh = q.shape[-1]
        self_logit = jnp.sum(
            (q * dh ** -0.5).astype(jnp.float32) * k.astype(jnp.float32),
            axis=-1, keepdims=True)                        # (B, H, 1, 1)
        a, _ = _attn_feature_major(
            q, self_k.astype(q.dtype), self_v.astype(q.dtype), mask,
            extra_logit=self_logit, extra_v=v.astype(q.dtype))
        h = h + _linear(_merge_heads(a), lp["self"]["o_w"], lp["self"]["o_b"])
        h, align = _cross_and_mlp(h, lp, n_heads, cross_k, cross_v,
                                  xs[0]["_align_sel"])
        # Feature-major (B, H, dh, 1) slices for the post-scan cache write.
        return h, (jnp.transpose(k, (0, 1, 3, 2)).astype(self_k.dtype),
                   jnp.transpose(v, (0, 1, 3, 2)).astype(self_v.dtype), align)

    layers = dict(dec["layers"])
    layers["_align_sel"] = jnp.asarray(align_sel)
    xs = (layers, cache.cross_k, cache.cross_v, cache.self_k, cache.self_v)
    x, (k_new, v_new, aligns) = jax.lax.scan(
        layer, x, xs, unroll=_decoder_unroll(arch, x.shape[0]))
    # Cache write as a fused elementwise select, NOT dynamic_update_slice:
    # XLA's DUS on a while-loop carry lowers to a pathological strided
    # kernel (~850 us for this 24 MB buffer on v5e); where(iota==pos, ...)
    # is one clean bandwidth-bound pass (~320 us, equal to the read+write
    # yardstick). Measured in round 2's decode-step profile.
    slot = jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, 1, 1, cache.self_k.shape[4]), 4) == position
    new_cache = DecodeCache(
        jnp.where(slot, k_new, cache.self_k),
        jnp.where(slot, v_new, cache.self_v),
        cache.cross_k, cache.cross_v)
    x = _layer_norm(x, dec["ln_post"]["scale"], dec["ln_post"]["bias"])
    return x, new_cache, jnp.sum(aligns, axis=0)


def _token_table_lookup(emb_w, tokens: jnp.ndarray, dtype) -> jnp.ndarray:
    """(B, S) ids -> (B, S, d); handles the per-row int8 table."""
    if isinstance(emb_w, dict):  # per-row int8 table (models.quant)
        return (emb_w["q"][tokens].astype(dtype)
                * emb_w["s"][tokens].astype(dtype)[..., None])
    return emb_w.astype(dtype)[tokens]


def _embed_tokens(dec: Dict[str, Any], tokens: jnp.ndarray, offset, dtype) -> jnp.ndarray:
    emb = _token_table_lookup(dec["token_emb"], tokens, dtype)
    s = tokens.shape[1]
    pos = jax.lax.dynamic_slice_in_dim(dec["pos_emb"], offset, s, axis=0)
    return emb + pos.astype(dtype)


def _logits(dec: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    emb_w = dec["token_emb"]
    if isinstance(emb_w, dict):
        # Row scales commute with the contraction: (x @ q^T) * s.
        raw = jnp.einsum(
            "bsd,vd->bsv", x, emb_w["q"].astype(x.dtype),
            preferred_element_type=jnp.float32, precision=_prec(x.dtype),
        )
        return raw * emb_w["s"].astype(jnp.float32)[None, None, :]
    return jnp.einsum(
        "bsd,vd->bsv", x, emb_w.astype(x.dtype),
        preferred_element_type=jnp.float32, precision=_prec(x.dtype),
    )


def decoder_prefill(
    params: WhisperParams,
    tokens: jnp.ndarray,          # (B, P) forced prompt
    cache: DecodeCache,
    arch: WhisperArch,
    compute_dtype: jnp.dtype = jnp.float32,
) -> Tuple[jnp.ndarray, DecodeCache, jnp.ndarray]:
    """Run the forced prompt in one pass, filling cache slots [0, P).

    Returns (logits (B, P, V) f32, cache, align_probs (B, P, A, T_enc)).
    """
    b, p = tokens.shape
    x = _embed_tokens(params["decoder"], tokens, 0, compute_dtype)
    s_max = cache.self_k.shape[4]
    q_pos = jnp.arange(p)[:, None]
    k_pos = jnp.arange(s_max)[None, :]
    mask = (k_pos <= q_pos)[None, None, :, :]           # causal over cache slots
    x, new_cache, align = _stack_prefill(
        params, x, arch, mask, cache, jnp.int32(0), _alignment_selector(arch))
    return _logits(params["decoder"], x), new_cache, align


def decoder_step(
    params: WhisperParams,
    token: jnp.ndarray,           # (B, 1)
    position: jnp.ndarray,        # scalar int32: index of this token
    cache: DecodeCache,
    arch: WhisperArch,
    compute_dtype: jnp.dtype = jnp.float32,
) -> Tuple[jnp.ndarray, DecodeCache, jnp.ndarray]:
    """One on-device decode step. Returns (logits (B, V) f32, cache, align).

    This is the hot loop the reference pays a host round trip for on every
    token (``apple/model.py:155-255``); here it stays inside
    ``lax.while_loop`` in the engine.
    """
    x = _embed_tokens(params["decoder"], token, position, compute_dtype)
    x, new_cache, align = _stack_step(
        params, x, arch, cache, position, _alignment_selector(arch))
    return _logits(params["decoder"], x)[:, 0], new_cache, align[:, 0]


def _embed_tokens_at(dec: Dict[str, Any], tokens: jnp.ndarray,
                     positions: jnp.ndarray, dtype) -> jnp.ndarray:
    """Embed a (B, W) token window at per-sample start ``positions`` (B,)."""
    emb = _token_table_lookup(dec["token_emb"], tokens, dtype)
    w = tokens.shape[1]
    rows = positions[:, None] + jnp.arange(w)[None, :]  # (B, W)
    rows = jnp.clip(rows, 0, dec["pos_emb"].shape[0] - 1)
    return emb + dec["pos_emb"][rows].astype(dtype)


def _stack_verify(params, x, arch, cache, positions, align_sel):
    """Window pass at per-sample offsets — the speculative-decoding verify.

    ``x`` (B, W, d) is a window of W tokens whose first token sits at cache
    slot ``positions[b]`` for sample b. Each query attends cache slots
    strictly below its sample's window start (slots >= start are stale)
    plus the in-window keys causally — the W-key generalization of
    ``_stack_step``'s extra-logit trick, so no garbage slot is ever read
    and nothing needs to be written before attention. The window K/V land
    in the cache afterwards through a per-sample one-hot contraction (the
    same fused-select philosophy as the where-iota single-slot write;
    ``dynamic_update_slice`` cannot express per-sample starts at all).
    """
    dec = params["decoder"]
    n_heads = arch.decoder_heads
    s_max = cache.self_k.shape[4]
    b, w, _ = x.shape
    # (B, 1, 1, S): every window query may see slots < its window start.
    cache_mask = (jnp.arange(s_max)[None, :]
                  < positions[:, None])[:, None, None, :]
    win_causal = (jnp.arange(w)[None, :]
                  <= jnp.arange(w)[:, None])[None, None, :, :]

    def layer(carry, xs):
        h = carry
        lp, cross_k, cross_v, self_k, self_v = xs
        q_in = _layer_norm(h, lp["ln1"]["scale"], lp["ln1"]["bias"])
        q_p, k_p, v_p = _self_qkv(q_in, lp["self"])
        q = jnp.transpose(_split_heads(q_p, n_heads), (0, 2, 1, 3))  # (B, H, W, dh)
        k_win = jnp.transpose(_split_heads(k_p, n_heads), (0, 2, 1, 3))
        v_win = jnp.transpose(_split_heads(v_p, n_heads), (0, 2, 1, 3))
        dh = q.shape[-1]
        qs = (q * dh ** -0.5)
        logit_c = jnp.einsum(
            "bhqd,bhds->bhqs", qs, self_k.astype(q.dtype),
            preferred_element_type=jnp.float32, precision=_prec(q.dtype))
        logit_c = jnp.where(cache_mask, logit_c, jnp.float32(-1e9))
        logit_w = jnp.einsum(
            "bhqd,bhkd->bhqk", qs, k_win,
            preferred_element_type=jnp.float32, precision=_prec(q.dtype))
        logit_w = jnp.where(win_causal, logit_w, jnp.float32(-1e9))
        probs = jax.nn.softmax(
            jnp.concatenate([logit_c, logit_w], axis=-1), axis=-1)
        pc, pw = probs[..., :s_max], probs[..., s_max:]
        a = (jnp.einsum("bhqs,bhds->bhqd", pc.astype(q.dtype),
                        self_v.astype(q.dtype), precision=_prec(q.dtype))
             + jnp.einsum("bhqk,bhkd->bhqd", pw.astype(q.dtype), v_win,
                          precision=_prec(q.dtype)))
        h = h + _linear(_merge_heads(a), lp["self"]["o_w"], lp["self"]["o_b"])
        h, align = _cross_and_mlp(h, lp, n_heads, cross_k, cross_v,
                                  xs[0]["_align_sel"])
        # Feature-major (B, H, dh, W) for the post-scan one-hot write.
        return h, (jnp.transpose(k_win, (0, 1, 3, 2)),
                   jnp.transpose(v_win, (0, 1, 3, 2)), align)

    layers = dict(dec["layers"])
    layers["_align_sel"] = jnp.asarray(align_sel)
    xs = (layers, cache.cross_k, cache.cross_v, cache.self_k, cache.self_v)
    # Same policy as _stack_step: the verify pass is the speculative
    # round's hot body and equally loop-overhead-bound at small batch
    # (the W extra query rows ride the same weight read).
    x, (k_new, v_new, aligns) = jax.lax.scan(
        layer, x, xs, unroll=_decoder_unroll(arch, b))
    # Scatter window slots per sample: onehot[b, w, s] = (s == pos_b + w).
    slot_rows = positions[:, None] + jnp.arange(w)[None, :]      # (B, W)
    onehot = (slot_rows[:, :, None]
              == jnp.arange(s_max)[None, None, :])               # (B, W, S)
    written = jnp.any(onehot, axis=1)[None, :, None, None, :]    # (1,B,1,1,S)
    # HIGHEST precision makes the one-hot contraction an EXACT select in
    # any dtype (the default TPU f32 path would round operands to bf16,
    # silently breaking the verify-vs-step cache equivalence in f32 —
    # CLAUDE.md precision invariant).
    oh = onehot.astype(cache.self_k.dtype)
    upd_k = jnp.einsum("lbhdw,bws->lbhds", k_new.astype(cache.self_k.dtype),
                       oh, precision=jax.lax.Precision.HIGHEST)
    upd_v = jnp.einsum("lbhdw,bws->lbhds", v_new.astype(cache.self_v.dtype),
                       oh, precision=jax.lax.Precision.HIGHEST)
    new_cache = DecodeCache(
        jnp.where(written, upd_k, cache.self_k),
        jnp.where(written, upd_v, cache.self_v),
        cache.cross_k, cache.cross_v)
    x = _layer_norm(x, dec["ln_post"]["scale"], dec["ln_post"]["bias"])
    return x, new_cache, jnp.sum(aligns, axis=0)


def decoder_verify(
    params: WhisperParams,
    tokens: jnp.ndarray,          # (B, W) window
    positions: jnp.ndarray,       # (B,) int32: cache slot of tokens[:, 0]
    cache: DecodeCache,
    arch: WhisperArch,
    compute_dtype: jnp.dtype = jnp.float32,
) -> Tuple[jnp.ndarray, DecodeCache, jnp.ndarray]:
    """Multi-token decode pass at per-sample positions (speculative verify).

    Computes logits for every window position in ONE weight read — the
    speculative-decoding primitive: the decoder is weight-bandwidth-bound
    at small batch, so verifying W draft tokens costs barely more than one
    token. Also serves as the draft's stepper with W=1 (per-sample
    positions, which ``decoder_step``'s scalar-position fast path cannot
    express once samples accept different draft counts).

    Returns (logits (B, W, V) f32, cache, align (B, W, A, T_enc)).
    """
    x = _embed_tokens_at(params["decoder"], tokens,
                         positions.astype(jnp.int32), compute_dtype)
    x, new_cache, align = _stack_verify(
        params, x, arch, cache, positions.astype(jnp.int32),
        _alignment_selector(arch))
    return _logits(params["decoder"], x), new_cache, align


def decoder_train_forward(
    params: WhisperParams,
    tokens: jnp.ndarray,          # (B, S)
    enc_out: jnp.ndarray,         # (B, T, d)
    arch: WhisperArch,
    compute_dtype: jnp.dtype = jnp.float32,
    remat: bool = False,
) -> jnp.ndarray:
    """Teacher-forced full-sequence decoder (training / parity tests).

    Returns logits (B, S, V) in f32. ``remat``: see ``encoder_forward``.
    """
    dec = params["decoder"]
    n_heads = arch.decoder_heads
    b, s = tokens.shape
    x = _embed_tokens(dec, tokens, 0, compute_dtype)
    causal = (jnp.arange(s)[None, :] <= jnp.arange(s)[:, None])[None, None, :, :]
    enc_out = enc_out.astype(compute_dtype)

    def layer(carry, lp):
        h = carry
        q_in = _layer_norm(h, lp["ln1"]["scale"], lp["ln1"]["bias"])
        a, _ = _mha(q_in, q_in, lp["self"], n_heads, causal)
        h = h + a
        c_in = _layer_norm(h, lp["ln_cross"]["scale"], lp["ln_cross"]["bias"])
        c, _ = _mha(c_in, enc_out, lp["cross"], n_heads)
        h = h + c
        h = h + _mlp(_layer_norm(h, lp["ln2"]["scale"], lp["ln2"]["bias"]), lp["mlp"])
        return h, None

    if remat:
        layer = jax.checkpoint(layer)
    x, _ = jax.lax.scan(layer, x, dec["layers"])
    x = _layer_norm(x, dec["ln_post"]["scale"], dec["ln_post"]["bias"])
    return _logits(dec, x)


def make_cache(
    arch: WhisperArch,
    batch: int,
    max_len: int,
    cross_k: jnp.ndarray,
    cross_v: jnp.ndarray,
    dtype: jnp.dtype = jnp.float32,
) -> DecodeCache:
    l, h, dh = arch.decoder_layers, arch.decoder_heads, arch.head_dim
    zeros = jnp.zeros((l, batch, h, dh, max_len), dtype=dtype)
    return DecodeCache(zeros, zeros, cross_k, cross_v)


# ---------------------------------------------------------------------------
# Random init (tests, benchmarks; real weights come from models/load.py)
# ---------------------------------------------------------------------------


def _sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's fixed sinusoidal encoder positions (mlx_modules.py:27-33)."""
    log_timescale = np.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


def init_params(
    arch: WhisperArch, seed: int = 0, dtype: jnp.dtype = jnp.float32
) -> WhisperParams:
    rng = np.random.default_rng(seed)
    d, ff = arch.d_model, arch.d_ff

    def lin(i, o):
        return rng.standard_normal((i, o), dtype=np.float32) * np.float32(0.02)

    def vec(n, val=0.0):
        return np.full((n,), val, dtype=np.float32)

    def attn_params(with_cross=False):
        p = {
            "q_w": lin(d, d), "q_b": vec(d), "k_w": lin(d, d),
            "v_w": lin(d, d), "v_b": vec(d), "o_w": lin(d, d), "o_b": vec(d),
        }
        return p

    def ln():
        return {"scale": vec(d, 1.0), "bias": vec(d)}

    def mlp():
        return {"fc1_w": lin(d, ff), "fc1_b": vec(ff),
                "fc2_w": lin(ff, d), "fc2_b": vec(d)}

    def stack(n, make):
        trees = [make() for _ in range(n)]
        # Cast on HOST before transfer: halves bytes over the wire for bf16 and
        # avoids a device-side cast pass (matters on tunneled TPUs).
        return jax.tree.map(
            lambda *xs: jnp.asarray(np.stack(xs).astype(dtype)), *trees)

    enc_layer = lambda: {"attn": attn_params(), "ln1": ln(), "ln2": ln(), "mlp": mlp()}
    dec_layer = lambda: {
        "self": attn_params(), "cross": attn_params(),
        "ln1": ln(), "ln_cross": ln(), "ln2": ln(), "mlp": mlp(),
    }

    params = {
        "encoder": {
            "conv1": {"w": jnp.asarray(rng.standard_normal((d, arch.n_mels, 3), dtype=np.float32) * np.float32(0.02), dtype),
                      "b": jnp.zeros((d,), dtype)},
            "conv2": {"w": jnp.asarray(rng.standard_normal((d, d, 3), dtype=np.float32) * np.float32(0.02), dtype),
                      "b": jnp.zeros((d,), dtype)},
            "pos_emb": jnp.asarray(_sinusoids(arch.max_source_positions, d), dtype),
            "layers": stack(arch.encoder_layers, enc_layer),
            "ln_post": jax.tree.map(lambda x: jnp.asarray(x, dtype), ln()),
        },
        "decoder": {
            "token_emb": jnp.asarray(rng.standard_normal((arch.vocab_size, d), dtype=np.float32) * np.float32(0.02), dtype),
            "pos_emb": jnp.asarray(rng.standard_normal((arch.max_target_positions, d), dtype=np.float32) * np.float32(0.02), dtype),
            "layers": stack(arch.decoder_layers, dec_layer),
            "ln_post": jax.tree.map(lambda x: jnp.asarray(x, dtype), ln()),
        },
    }
    return params


def init_params_device(
    arch: WhisperArch, seed: int = 0, dtype: jnp.dtype = jnp.float32
) -> WhisperParams:
    """:func:`init_params`, generated ON DEVICE with ``jax.random``.

    Same tree schema and 0.02-scaled-normal statistics, different RNG
    stream (numpy vs threefry) — use wherever the VALUES don't matter
    (benchmarks, probes, compile warming). Rationale: host init of
    large-v3 costs ~13 min over the tunneled chip (3.1 GB generated on
    host + transferred); on-device generation is seconds.
    """
    import jax.random as jr

    d, ff = arch.d_model, arch.d_ff
    key = iter(jr.split(jr.PRNGKey(seed), 64))

    def mat(*shape):
        return 0.02 * jr.normal(next(key), shape, jnp.float32).astype(dtype)

    def attn(L):
        return {"q_w": mat(L, d, d), "q_b": jnp.zeros((L, d), dtype),
                "k_w": mat(L, d, d),
                "v_w": mat(L, d, d), "v_b": jnp.zeros((L, d), dtype),
                "o_w": mat(L, d, d), "o_b": jnp.zeros((L, d), dtype)}

    def ln(L=None):
        shape = (d,) if L is None else (L, d)
        return {"scale": jnp.ones(shape, dtype),
                "bias": jnp.zeros(shape, dtype)}

    def mlp(L):
        return {"fc1_w": mat(L, d, ff), "fc1_b": jnp.zeros((L, ff), dtype),
                "fc2_w": mat(L, ff, d), "fc2_b": jnp.zeros((L, d), dtype)}

    Le, Ld = arch.encoder_layers, arch.decoder_layers
    return {
        "encoder": {
            "conv1": {"w": mat(d, arch.n_mels, 3), "b": jnp.zeros((d,), dtype)},
            "conv2": {"w": mat(d, d, 3), "b": jnp.zeros((d,), dtype)},
            "pos_emb": jnp.asarray(
                _sinusoids(arch.max_source_positions, d), dtype),
            "layers": {"attn": attn(Le), "ln1": ln(Le), "ln2": ln(Le),
                       "mlp": mlp(Le)},
            "ln_post": ln(),
        },
        "decoder": {
            "token_emb": mat(arch.vocab_size, d),
            "pos_emb": mat(arch.max_target_positions, d),
            "layers": {"self": attn(Ld), "cross": attn(Ld), "ln1": ln(Ld),
                       "ln_cross": ln(Ld), "ln2": ln(Ld), "mlp": mlp(Ld)},
            "ln_post": ln(),
        },
    }

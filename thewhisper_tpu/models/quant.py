"""Weight-only int8 quantization — the "S" engine mode.

Parity target: the reference's "S" checkpoints run int8-quantized decoders
(MLX ``quantize_mlx_model``, ``apple/quantization_utils.py:5-13``; TensorRT
int8 engines on NVIDIA, ``benchmark/README.md:92-94``). Here linear weights
become ``{"q": int8 (in, out), "s": f32 (out,)}`` with symmetric
per-output-channel scales; ``models.whisper._linear`` dequantizes on the
fly inside the matmul (XLA fuses convert+scale into the contraction), so
HBM holds 1 byte/weight — the decode loop is weight-bandwidth-bound, which
is exactly where int8 pays on TPU.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# Linear-weight leaf names eligible for quantization (matmul weights only;
# biases, norms, embeddings, convs stay high precision).
_QUANT_KEYS = {"q_w", "k_w", "v_w", "o_w", "fc1_w", "fc2_w"}


def quantize_weight(w: np.ndarray, bits: int = 8) -> Dict[str, Any]:
    """Symmetric per-output-channel int8/int4: w ~= q * s.

    The contraction axis of a linear weight is -2 ("...i,io->...o"), so the
    scale reduces over it only — layer-stacked (L, in, out) weights get one
    scale per (layer, out channel). ``bits=4`` stores ``jnp.int4`` (XLA
    packs two nibbles per byte in HBM) — half the weight bandwidth of int8
    at ~16x the rounding error; experimental "S4" decode mode. Measured
    (tools/int4_native_probe.py, v5e round 3): only ~8-10% faster than
    int8 at bs=1 (the step's residual is per-kernel overhead, not weight
    bandwidth), and S4 arrays cannot cross a jit boundary on the axon
    plugin — not worth default adoption.
    """
    if bits not in (8, 4):
        raise ValueError(f"bits must be 4 or 8, got {bits}")
    qmax = 127 if bits == 8 else 7
    dtype = jnp.int8 if bits == 8 else jnp.int4
    if isinstance(w, jax.Array):
        # Device path: no host round trip (a tunneled chip pays ~25 ms
        # RTT + the full bf16 download PER LEAF via np.asarray — 3 GB of
        # large-v3 params cost ~7 minutes that way). Same math as below.
        wf = w.astype(jnp.float32)
        scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=-2), 1e-8) / qmax
        q = jnp.clip(jnp.round(wf / scale[..., None, :]), -qmax, qmax)
        return {"q": q.astype(dtype), "s": scale}
    w = np.asarray(w, dtype=np.float32)
    scale = np.max(np.abs(w), axis=-2)            # (..., out)
    scale = np.maximum(scale, 1e-8) / qmax
    q = np.clip(np.round(w / scale[..., None, :]), -qmax, qmax)
    return {"q": jnp.asarray(q.astype(np.int8), dtype=dtype),
            "s": jnp.asarray(scale.astype(np.float32))}


def dequantize_weight(leaf: Dict[str, Any], dtype=jnp.float32) -> jnp.ndarray:
    return leaf["q"].astype(dtype) * leaf["s"].astype(dtype)[..., None, :]


def is_quantized(leaf: Any) -> bool:
    return isinstance(leaf, dict) and set(leaf) == {"q", "s"}


def quantize_embedding(w: np.ndarray, bits: int = 8) -> Dict[str, Any]:
    """Per-row int8/int4 for the (V, d) token table: w ~= q * s[:, None].

    Row scales let the tied logits matmul run as (x @ q^T) * s — the scale
    applies AFTER the contraction, so nothing dequantized materializes.
    The table is read in FULL every decode step by the tied logits matmul
    (the single biggest per-token HBM read), so ``bits=4`` halves that
    traffic at ~16x the rounding error of int8 (experimental, probe-only
    until WER impact is measured on real weights).
    """
    if bits not in (8, 4):
        raise ValueError(f"bits must be 4 or 8, got {bits}")
    qmax = 127 if bits == 8 else 7
    dtype = jnp.int8 if bits == 8 else jnp.int4
    if isinstance(w, jax.Array):
        wf = w.astype(jnp.float32)
        scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=-1), 1e-8) / qmax
        q = jnp.clip(jnp.round(wf / scale[:, None]), -qmax, qmax)
        return {"q": q.astype(dtype), "s": scale}
    w = np.asarray(w, dtype=np.float32)
    scale = np.maximum(np.max(np.abs(w), axis=-1), 1e-8) / qmax    # (V,)
    q = np.clip(np.round(w / scale[:, None]), -qmax, qmax).astype(np.int8)
    return {"q": jnp.asarray(q, dtype=dtype),
            "s": jnp.asarray(scale.astype(np.float32))}


def quantize_weight_w8a8(w: np.ndarray) -> Dict[str, Any]:
    """Like :func:`quantize_weight`, but marked for the **W8A8** compute
    path: ``models.whisper._linear`` quantizes the activations per row on
    the fly and runs a true int8 x int8 MXU contraction (measured
    ~1.3-1.4x bf16 end to end on v5e) instead of dequantize-into-bf16-
    matmul.

    Intended for the compute-bound encoder (the reference's TensorRT "S"
    engines are int8 end to end, ``benchmark/README.md:92-94``); the
    bandwidth-bound decoder gains nothing over weight-only int8.
    """
    leaf = quantize_weight(w)
    return {"q8": leaf["q"], "s8": leaf["s"]}


def is_quantized_w8a8(leaf: Any) -> bool:
    return isinstance(leaf, dict) and set(leaf) == {"q8", "s8"}


def quantize_params(
    params: Dict[str, Any],
    components: Sequence[str] = ("decoder",),
    quantize_embedding_table: bool = True,
    activation_int8: bool = False,
    bits: int = 8,
) -> Dict[str, Any]:
    """Quantize the linear weights of the given top-level components.

    Default quantizes the decoder, like the reference "S" checkpoints
    (the encoder runs once per window; the decoder's weights are re-read
    every generated token). The tied token embedding — the single biggest
    per-token HBM read through the logits matmul — quantizes per-row
    unless disabled.

    ``activation_int8=True`` marks the converted weights for the W8A8
    compute path (int8 activations quantized on the fly, int8 MXU matmul)
    — use for the encoder, where matmuls are compute-bound.
    """
    if activation_int8:
        make = quantize_weight_w8a8
    else:
        import functools

        make = functools.partial(quantize_weight, bits=bits)

    def convert(tree):
        if isinstance(tree, dict):
            return {
                # Device arrays quantize on device (bit-identical math;
                # np.asarray here would download every leaf through the
                # tunnel), host arrays on host.
                k: (make(v if isinstance(v, jax.Array) else np.asarray(v))
                    if k in _QUANT_KEYS and not (
                        is_quantized(v) or is_quantized_w8a8(v))
                    else convert(v))
                for k, v in tree.items()
            }
        return tree

    out = dict(params)
    for comp in components:
        out[comp] = convert(params[comp])
        if comp == "decoder" and quantize_embedding_table:
            dec = dict(out["decoder"])
            if not is_quantized(dec.get("token_emb")):
                emb = params["decoder"]["token_emb"]
                dec["token_emb"] = quantize_embedding(
                    emb if isinstance(emb, jax.Array) else np.asarray(emb))
            out["decoder"] = dec
    return out


def quantized_bytes(params: Dict[str, Any]) -> int:
    """Total parameter bytes (for memory accounting in logs/tests).

    Bit-accurate for sub-byte dtypes: ``jnp.int4`` counts as half a byte
    (XLA packs two nibbles per byte in HBM even though the host-side
    ``itemsize`` is 1).
    """
    total = 0
    for leaf in jax.tree.leaves(params):
        try:
            bits = jnp.iinfo(leaf.dtype).bits
        except ValueError:           # floating dtypes
            bits = leaf.dtype.itemsize * 8
        total += leaf.size * bits // 8
    return total


def quantize_kv(x: "jnp.ndarray") -> Dict[str, Any]:
    """On-device per-(layer, batch, head, channel) int8 for a feature-major
    KV cache (L, B, H, dh, T).

    The scale reduces over the sequence axis only, so it folds OUT of the
    attention contractions: for K, into the query (``q * s_k``); for V,
    into the attention output (``out * s_v``) — nothing dequantized ever
    materializes in HBM if XLA fuses the int8->bf16 convert into the dot.
    Computed once per audio window at prefill; at bs=32 the cross KV is the
    largest per-token HBM read (983 MB bf16 -> 492 MB int8). NOTE: measured
    speedups are environment-dependent (convert fusion is not guaranteed);
    this stays opt-in (``WhisperEngine(cross_kv_int8=True)``) until
    profiled on directly-attached hardware.
    """
    s = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1), 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s[..., None]),
                 -127, 127).astype(jnp.int8)
    return {"q": q, "s": s}

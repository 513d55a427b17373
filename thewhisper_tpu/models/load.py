"""HF checkpoint -> JAX pytree conversion (torch-free hot path).

Checkpoint layout parity (reference ``apple/model.py:453-616`` /
``nvidia/asr_pipeline.py:44-69``): an HF Whisper directory with
``config.json``, ``generation_config.json`` and ``model.safetensors`` (or a
sharded index). Weights are read with ``safetensors.numpy`` — torch never
touches the inference path.

Flexible chunk lengths (<30 s) support both reference mechanisms:

- ``truncate``: keep the first ``1500 * s/30`` rows of the encoder position
  table — what the flexible fine-tunes expect (``mlx_modules.py:198-199``).
- ``interpolate``: linear interpolation of the 1500-row table, matching
  ``F.interpolate(mode="linear", align_corners=False)`` exactly
  (``nvidia/asr_pipeline.py:15-27``) — correct for stock HF weights.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from thewhisper_tpu.config import WhisperArch, source_positions_for_seconds

Array = np.ndarray


def arch_from_hf_config(cfg: Mapping[str, Any],
                        alignment_heads: Tuple[Tuple[int, int], ...] = ()) -> WhisperArch:
    return WhisperArch(
        d_model=cfg["d_model"],
        encoder_layers=cfg["encoder_layers"],
        encoder_heads=cfg["encoder_attention_heads"],
        decoder_layers=cfg["decoder_layers"],
        decoder_heads=cfg["decoder_attention_heads"],
        d_ff=cfg.get("encoder_ffn_dim", 4 * cfg["d_model"]),
        n_mels=cfg.get("num_mel_bins", 80),
        vocab_size=cfg["vocab_size"],
        max_source_positions=cfg.get("max_source_positions", 1500),
        max_target_positions=cfg.get("max_target_positions", 448),
        median_filter_width=cfg.get("median_filter_width", 7),
        alignment_heads=alignment_heads,
    )


def interpolate_positions(pos: Array, new_len: int) -> Array:
    """Linear resize of (T, d) position table along T.

    Matches ``torch.nn.functional.interpolate(mode="linear",
    align_corners=False)``: sample at (i + 0.5) * T/new_len - 0.5, clamped.
    """
    t = pos.shape[0]
    scale = t / new_len
    coords = np.clip((np.arange(new_len) + 0.5) * scale - 0.5, 0, t - 1)
    lo = np.floor(coords).astype(np.int64)
    hi = np.minimum(lo + 1, t - 1)
    w = (coords - lo)[:, None].astype(pos.dtype)
    return pos[lo] * (1 - w) + pos[hi] * w


def _t(x: Array) -> Array:
    """HF nn.Linear stores (out, in); we store (in, out)."""
    return np.ascontiguousarray(x.T)


def params_from_hf_state_dict(
    state: Mapping[str, Array],
    arch: WhisperArch,
    dtype: jnp.dtype = jnp.float32,
    chunk_length_s: float = 30.0,
    position_mode: str = "truncate",
) -> Dict[str, Any]:
    """Convert an HF ``WhisperForConditionalGeneration`` state dict.

    ``state`` values must be numpy arrays. Keys follow the HF naming
    (``model.encoder.layers.N.self_attn.q_proj.weight`` ...).
    """
    g = lambda k: np.asarray(state[k], dtype=np.float32)

    def enc_layer(i: int) -> Dict[str, Any]:
        p = f"model.encoder.layers.{i}."
        return {
            "attn": {
                "q_w": _t(g(p + "self_attn.q_proj.weight")),
                "q_b": g(p + "self_attn.q_proj.bias"),
                "k_w": _t(g(p + "self_attn.k_proj.weight")),
                "v_w": _t(g(p + "self_attn.v_proj.weight")),
                "v_b": g(p + "self_attn.v_proj.bias"),
                "o_w": _t(g(p + "self_attn.out_proj.weight")),
                "o_b": g(p + "self_attn.out_proj.bias"),
            },
            "ln1": {"scale": g(p + "self_attn_layer_norm.weight"),
                    "bias": g(p + "self_attn_layer_norm.bias")},
            "ln2": {"scale": g(p + "final_layer_norm.weight"),
                    "bias": g(p + "final_layer_norm.bias")},
            "mlp": {"fc1_w": _t(g(p + "fc1.weight")), "fc1_b": g(p + "fc1.bias"),
                    "fc2_w": _t(g(p + "fc2.weight")), "fc2_b": g(p + "fc2.bias")},
        }

    def dec_layer(i: int) -> Dict[str, Any]:
        p = f"model.decoder.layers.{i}."

        def attn(prefix: str) -> Dict[str, Any]:
            return {
                "q_w": _t(g(p + prefix + ".q_proj.weight")),
                "q_b": g(p + prefix + ".q_proj.bias"),
                "k_w": _t(g(p + prefix + ".k_proj.weight")),
                "v_w": _t(g(p + prefix + ".v_proj.weight")),
                "v_b": g(p + prefix + ".v_proj.bias"),
                "o_w": _t(g(p + prefix + ".out_proj.weight")),
                "o_b": g(p + prefix + ".out_proj.bias"),
            }

        return {
            "self": attn("self_attn"),
            "cross": attn("encoder_attn"),
            "ln1": {"scale": g(p + "self_attn_layer_norm.weight"),
                    "bias": g(p + "self_attn_layer_norm.bias")},
            "ln_cross": {"scale": g(p + "encoder_attn_layer_norm.weight"),
                         "bias": g(p + "encoder_attn_layer_norm.bias")},
            "ln2": {"scale": g(p + "final_layer_norm.weight"),
                    "bias": g(p + "final_layer_norm.bias")},
            "mlp": {"fc1_w": _t(g(p + "fc1.weight")), "fc1_b": g(p + "fc1.bias"),
                    "fc2_w": _t(g(p + "fc2.weight")), "fc2_b": g(p + "fc2.bias")},
        }

    def stack(trees):
        return jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs), dtype), *trees)

    pos_emb = g("model.encoder.embed_positions.weight")
    n_pos = source_positions_for_seconds(chunk_length_s)
    if n_pos < pos_emb.shape[0]:
        if position_mode == "interpolate":
            pos_emb = interpolate_positions(pos_emb, n_pos)
        elif position_mode == "truncate":
            pos_emb = pos_emb[:n_pos]
        else:
            raise ValueError(f"position_mode must be truncate|interpolate, got {position_mode}")

    params = {
        "encoder": {
            "conv1": {"w": jnp.asarray(g("model.encoder.conv1.weight"), dtype),
                      "b": jnp.asarray(g("model.encoder.conv1.bias"), dtype)},
            "conv2": {"w": jnp.asarray(g("model.encoder.conv2.weight"), dtype),
                      "b": jnp.asarray(g("model.encoder.conv2.bias"), dtype)},
            "pos_emb": jnp.asarray(pos_emb, dtype),
            "layers": stack([enc_layer(i) for i in range(arch.encoder_layers)]),
            "ln_post": {"scale": jnp.asarray(g("model.encoder.layer_norm.weight"), dtype),
                        "bias": jnp.asarray(g("model.encoder.layer_norm.bias"), dtype)},
        },
        "decoder": {
            "token_emb": jnp.asarray(g("model.decoder.embed_tokens.weight"), dtype),
            "pos_emb": jnp.asarray(g("model.decoder.embed_positions.weight"), dtype),
            "layers": stack([dec_layer(i) for i in range(arch.decoder_layers)]),
            "ln_post": {"scale": jnp.asarray(g("model.decoder.layer_norm.weight"), dtype),
                        "bias": jnp.asarray(g("model.decoder.layer_norm.bias"), dtype)},
        },
    }
    return params


def _read_safetensors_dir(path: str) -> Dict[str, Array]:
    from safetensors import numpy as st_numpy

    index_path = os.path.join(path, "model.safetensors.index.json")
    single_path = os.path.join(path, "model.safetensors")
    state: Dict[str, Array] = {}
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        for shard in sorted(set(index["weight_map"].values())):
            state.update(st_numpy.load_file(os.path.join(path, shard)))
    elif os.path.exists(single_path):
        state = st_numpy.load_file(single_path)
    else:
        raise FileNotFoundError(f"no model.safetensors[.index.json] in {path}")
    return state


def detect_flexible_checkpoint(path: str, cfg: Mapping[str, Any],
                               gen_cfg: Mapping[str, Any]) -> bool:
    """True if the checkpoint is a flexible-chunk fine-tune.

    The reference encodes chunk length in its checkpoint layout
    (``free/macos_15_ios_18/{mode}/{chunk_length}sec``, reference
    ``apple/model.py:497-514``); HF-format exports of those fine-tunes carry
    a ``chunk_length`` marker in config/generation_config (our
    ``models/checkpoint.py`` writes one too). Either signal means the model
    was *trained* with truncated positions (``mlx_modules.py:198-199``) —
    interpolation would be the wrong mechanism for it.
    """
    for c in (cfg, gen_cfg):
        if any(k in c for k in ("chunk_length", "chunk_length_s", "flexible_chunks")):
            return True
    # Directory-scheme marker: any path component like "10sec" / "30sec".
    parts = os.path.normpath(os.path.abspath(path)).split(os.sep)
    return any(re.fullmatch(r"\d+sec", p) for p in parts)


def load_checkpoint(
    path: str,
    dtype: jnp.dtype = jnp.float32,
    chunk_length_s: float = 30.0,
    position_mode: Optional[str] = None,
) -> Tuple[Dict[str, Any], WhisperArch]:
    """Load an HF Whisper checkpoint directory into (params, arch).

    ``position_mode`` defaults to "truncate" for checkpoints that
    :func:`detect_flexible_checkpoint` marks as flexible fine-tunes, else
    "interpolate" (reference behavior split between the apple path,
    ``mlx_modules.py:198-199``, and the nvidia path,
    ``nvidia/asr_pipeline.py:15-27``).
    """
    with open(os.path.join(path, "config.json")) as f:
        cfg = json.load(f)

    alignment_heads: Tuple[Tuple[int, int], ...] = ()
    gen_cfg: Dict[str, Any] = {}
    gen_cfg_path = os.path.join(path, "generation_config.json")
    if os.path.exists(gen_cfg_path):
        with open(gen_cfg_path) as f:
            gen_cfg = json.load(f)
        alignment_heads = tuple(tuple(h) for h in gen_cfg.get("alignment_heads", []))

    arch = arch_from_hf_config(cfg, alignment_heads)
    state = _read_safetensors_dir(path)
    if position_mode is None:
        position_mode = ("truncate"
                         if detect_flexible_checkpoint(path, cfg, gen_cfg)
                         else "interpolate")
    params = params_from_hf_state_dict(
        state, arch, dtype=dtype, chunk_length_s=chunk_length_s,
        position_mode=position_mode,
    )
    return params, arch

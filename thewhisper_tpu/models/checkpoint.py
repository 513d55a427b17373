"""Checkpoint save/export: params -> HF safetensors, train states -> orbax.

The reference's "checkpointing" is model loading only (SURVEY section 5);
this build also *writes* checkpoints because it can fine-tune:

- ``save_hf_checkpoint`` inverts ``models/load.py``: a param pytree becomes
  an HF-layout ``model.safetensors`` + ``config.json`` +
  ``generation_config.json`` directory that both this framework and
  ``transformers.WhisperForConditionalGeneration.from_pretrained`` load.
- ``save_train_state`` / ``load_train_state`` persist full fine-tuning
  states (params + optimizer moments + step) via orbax.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

from thewhisper_tpu.config import WhisperArch


def _hf_state_dict(params: Dict[str, Any], arch: WhisperArch) -> Dict[str, np.ndarray]:
    """Invert the loader's name mapping; weights back to HF (out, in)."""
    state: Dict[str, np.ndarray] = {}

    def t(x):
        return np.ascontiguousarray(np.asarray(x, dtype=np.float32).T)

    def a(x):
        return np.asarray(x, dtype=np.float32)

    enc, dec = params["encoder"], params["decoder"]
    state["model.encoder.conv1.weight"] = a(enc["conv1"]["w"])
    state["model.encoder.conv1.bias"] = a(enc["conv1"]["b"])
    state["model.encoder.conv2.weight"] = a(enc["conv2"]["w"])
    state["model.encoder.conv2.bias"] = a(enc["conv2"]["b"])
    state["model.encoder.embed_positions.weight"] = a(enc["pos_emb"])
    state["model.encoder.layer_norm.weight"] = a(enc["ln_post"]["scale"])
    state["model.encoder.layer_norm.bias"] = a(enc["ln_post"]["bias"])

    def unstack_attn(group, prefix, i):
        state[f"{prefix}.q_proj.weight"] = t(group["q_w"][i])
        state[f"{prefix}.q_proj.bias"] = a(group["q_b"][i])
        state[f"{prefix}.k_proj.weight"] = t(group["k_w"][i])
        state[f"{prefix}.v_proj.weight"] = t(group["v_w"][i])
        state[f"{prefix}.v_proj.bias"] = a(group["v_b"][i])
        state[f"{prefix}.out_proj.weight"] = t(group["o_w"][i])
        state[f"{prefix}.out_proj.bias"] = a(group["o_b"][i])

    for i in range(arch.encoder_layers):
        p = f"model.encoder.layers.{i}"
        lay = enc["layers"]
        unstack_attn(lay["attn"], f"{p}.self_attn", i)
        state[f"{p}.self_attn_layer_norm.weight"] = a(lay["ln1"]["scale"][i])
        state[f"{p}.self_attn_layer_norm.bias"] = a(lay["ln1"]["bias"][i])
        state[f"{p}.final_layer_norm.weight"] = a(lay["ln2"]["scale"][i])
        state[f"{p}.final_layer_norm.bias"] = a(lay["ln2"]["bias"][i])
        state[f"{p}.fc1.weight"] = t(lay["mlp"]["fc1_w"][i])
        state[f"{p}.fc1.bias"] = a(lay["mlp"]["fc1_b"][i])
        state[f"{p}.fc2.weight"] = t(lay["mlp"]["fc2_w"][i])
        state[f"{p}.fc2.bias"] = a(lay["mlp"]["fc2_b"][i])

    state["model.decoder.embed_tokens.weight"] = a(dec["token_emb"])
    state["model.decoder.embed_positions.weight"] = a(dec["pos_emb"])
    state["model.decoder.layer_norm.weight"] = a(dec["ln_post"]["scale"])
    state["model.decoder.layer_norm.bias"] = a(dec["ln_post"]["bias"])
    for i in range(arch.decoder_layers):
        p = f"model.decoder.layers.{i}"
        lay = dec["layers"]
        unstack_attn(lay["self"], f"{p}.self_attn", i)
        unstack_attn(lay["cross"], f"{p}.encoder_attn", i)
        state[f"{p}.self_attn_layer_norm.weight"] = a(lay["ln1"]["scale"][i])
        state[f"{p}.self_attn_layer_norm.bias"] = a(lay["ln1"]["bias"][i])
        state[f"{p}.encoder_attn_layer_norm.weight"] = a(lay["ln_cross"]["scale"][i])
        state[f"{p}.encoder_attn_layer_norm.bias"] = a(lay["ln_cross"]["bias"][i])
        state[f"{p}.final_layer_norm.weight"] = a(lay["ln2"]["scale"][i])
        state[f"{p}.final_layer_norm.bias"] = a(lay["ln2"]["bias"][i])
        state[f"{p}.fc1.weight"] = t(lay["mlp"]["fc1_w"][i])
        state[f"{p}.fc1.bias"] = a(lay["mlp"]["fc1_b"][i])
        state[f"{p}.fc2.weight"] = t(lay["mlp"]["fc2_w"][i])
        state[f"{p}.fc2.bias"] = a(lay["mlp"]["fc2_b"][i])
    # Tied LM head.
    state["proj_out.weight"] = a(dec["token_emb"])
    return state


def save_hf_checkpoint(
    params: Dict[str, Any],
    arch: WhisperArch,
    path: str,
    generation_config: Optional[Dict[str, Any]] = None,
    chunk_length_s: Optional[float] = None,
) -> str:
    """Write an HF-compatible Whisper checkpoint directory.

    Note: the encoder position table must be full-length (1500 rows) for a
    faithful HF checkpoint; flexible-chunk params export with however many
    rows they carry and ``max_source_positions`` set to match. Pass
    ``chunk_length_s`` for flexible-chunk fine-tunes: it writes a
    ``chunk_length`` marker into generation_config.json so
    ``models.load.detect_flexible_checkpoint`` picks ``truncate`` positions
    on reload (the reference encodes the same fact in its directory scheme,
    ``apple/model.py:497-514``).
    """
    from safetensors import numpy as st_numpy

    os.makedirs(path, exist_ok=True)
    state = _hf_state_dict(params, arch)
    n_pos = int(np.asarray(params["encoder"]["pos_emb"]).shape[0])
    st_numpy.save_file(state, os.path.join(path, "model.safetensors"),
                       metadata={"format": "pt"})
    config = {
        "architectures": ["WhisperForConditionalGeneration"],
        "model_type": "whisper",
        "vocab_size": arch.vocab_size,
        "num_mel_bins": arch.n_mels,
        "d_model": arch.d_model,
        "encoder_layers": arch.encoder_layers,
        "encoder_attention_heads": arch.encoder_heads,
        "decoder_layers": arch.decoder_layers,
        "decoder_attention_heads": arch.decoder_heads,
        "encoder_ffn_dim": arch.d_ff,
        "decoder_ffn_dim": arch.d_ff,
        "max_source_positions": n_pos,
        "max_target_positions": arch.max_target_positions,
        "median_filter_width": arch.median_filter_width,
    }
    # Whisper-layout special ids only fit the real vocab; tiny test vocabs
    # get in-range placeholders so torch can instantiate the model.
    if arch.vocab_size >= 51865:
        config.update({"eos_token_id": 50257, "bos_token_id": 50257,
                       "pad_token_id": 50256,
                       "decoder_start_token_id": 50258})
    else:
        config.update({"eos_token_id": 1, "bos_token_id": 0,
                       "pad_token_id": 0, "decoder_start_token_id": 2})
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(config, f, indent=2)
    gen_cfg = dict(generation_config or {})
    gen_cfg.setdefault("alignment_heads",
                       [list(h) for h in arch.alignment_heads])
    if chunk_length_s is not None:
        gen_cfg.setdefault("chunk_length", float(chunk_length_s))
    with open(os.path.join(path, "generation_config.json"), "w") as f:
        json.dump(gen_cfg, f, indent=2)
    return path


# ---------------------------------------------------------------------------
# Training-state persistence (orbax)
# ---------------------------------------------------------------------------


def save_train_state(state, path: str) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    return path


def load_train_state(path: str, template):
    """Restore a train state; ``template`` is a matching abstract/real tree."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=template)

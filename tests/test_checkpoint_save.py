"""Checkpoint export round trip + orbax train-state persistence."""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from thewhisper_tpu.config import ARCH_PRESETS
from thewhisper_tpu.models.checkpoint import (
    load_train_state,
    save_hf_checkpoint,
    save_train_state,
)
from thewhisper_tpu.models.load import load_checkpoint, params_from_hf_state_dict
from thewhisper_tpu.models.whisper import init_params


@pytest.fixture(scope="module")
def tiny_arch():
    return dataclasses.replace(
        ARCH_PRESETS["tiny"],
        d_model=64, encoder_layers=2, encoder_heads=4, decoder_layers=2,
        decoder_heads=4, d_ff=128, vocab_size=300, n_mels=80,
        max_source_positions=60, max_target_positions=32,
        alignment_heads=((1, 0),),
    )


def test_save_then_load_roundtrip(tmp_path, tiny_arch):
    params = init_params(tiny_arch, seed=11)
    path = save_hf_checkpoint(params, tiny_arch, str(tmp_path / "ckpt"))
    params2, arch2 = load_checkpoint(path, dtype=jnp.float32)
    assert arch2.d_model == tiny_arch.d_model
    assert arch2.alignment_heads == tiny_arch.alignment_heads

    import jax

    leaves1 = jax.tree.leaves(params)
    leaves2 = jax.tree.leaves(params2)
    assert len(leaves1) == len(leaves2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_exported_checkpoint_loads_in_transformers(tmp_path, tiny_arch):
    import torch
    from transformers import WhisperForConditionalGeneration

    params = init_params(tiny_arch, seed=12)
    path = save_hf_checkpoint(params, tiny_arch, str(tmp_path / "hf"))
    model = WhisperForConditionalGeneration.from_pretrained(path)
    w = model.model.decoder.embed_tokens.weight.detach().numpy()
    np.testing.assert_allclose(
        w, np.asarray(params["decoder"]["token_emb"]), atol=1e-6)


def test_train_state_roundtrip(tmp_path, tiny_arch):
    from thewhisper_tpu.training import init_train_state

    params = init_params(tiny_arch, seed=13)
    state, _ = init_train_state(params)
    path = save_train_state(state, str(tmp_path / "state"))

    import jax

    template = jax.tree.map(np.zeros_like, state)
    restored = load_train_state(path, template)
    np.testing.assert_allclose(
        np.asarray(restored.params["decoder"]["token_emb"]),
        np.asarray(state.params["decoder"]["token_emb"]), atol=1e-7)
    assert int(restored.step) == 0


def test_stopwatch_and_cache_helpers(tmp_path):
    from thewhisper_tpu.utils.profiling import Stopwatch, enable_compilation_cache

    sw = Stopwatch()
    with sw.measure("x"):
        pass
    with sw.measure("x"):
        pass
    s = sw.summary()
    assert s["x"]["count"] == 2 and s["x"]["total_s"] >= 0

    d = enable_compilation_cache(str(tmp_path / "cache"))
    assert d == str(tmp_path / "cache")

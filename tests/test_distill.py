"""Draft distillation: KL drops, draft/target greedy agreement rises,
and the distilled draft still yields exactly-greedy speculative output.
"""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from thewhisper_tpu.config import ARCH_PRESETS, GenerationOptions, SpecialTokens
from thewhisper_tpu.engine import WhisperEngine, make_layer_skip_draft
from thewhisper_tpu.models.whisper import init_params
from thewhisper_tpu.training import (
    greedy_agreement,
    init_distill_state,
    make_distill_step,
)


@pytest.fixture(scope="module")
def setup():
    arch = dataclasses.replace(
        ARCH_PRESETS["tiny"],
        d_model=64, encoder_layers=2, encoder_heads=4, decoder_layers=4,
        decoder_heads=4, d_ff=128, vocab_size=120, n_mels=80,
        max_source_positions=50, max_target_positions=48,
        alignment_heads=((1, 0),),
    )
    teacher = init_params(arch, seed=21)
    draft_full, draft_arch = make_layer_skip_draft(teacher, arch, 2)
    student = {"decoder": draft_full["decoder"]}
    rng = np.random.default_rng(0)

    def batch(seed, b=4, s=24):
        r = np.random.default_rng(seed)
        return {
            "mel": jnp.asarray(r.standard_normal(
                (b, arch.n_mels, 100)).astype(np.float32)),
            "tokens": jnp.asarray(
                r.integers(0, arch.vocab_size, (b, s)).astype(np.int32)),
        }

    return arch, teacher, student, draft_arch, batch


def test_distill_improves_agreement(setup):
    arch, teacher, student, draft_arch, batch = setup
    eval_b = batch(999)
    agree0 = float(greedy_agreement(
        student, teacher, eval_b, draft_arch, arch))

    state, tx = init_distill_state(student, learning_rate=1e-3)
    step = make_distill_step(draft_arch, arch, tx, temperature=1.0)
    losses = []
    for i in range(60):
        state, loss = step(state, teacher, batch(i))
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.9, losses[:3] + losses[-3:]

    agree1 = float(greedy_agreement(
        state.student, teacher, eval_b, draft_arch, arch))
    # The layer-skip init disagrees with the 4-layer teacher on a random
    # model; distillation must raise held-out greedy agreement.
    assert agree1 > agree0 + 0.1, (agree0, agree1)


def test_draft_save_load_roundtrip(setup, tmp_path):
    from thewhisper_tpu.engine.speculative import load_draft, save_draft

    arch, teacher, student, draft_arch, batch = setup
    path = str(tmp_path / "draft")
    save_draft(path, student, draft_arch)
    loaded, loaded_arch = load_draft(path)
    assert loaded_arch == draft_arch
    import jax

    for a, b in zip(jax.tree.leaves(loaded),
                    jax.tree.leaves({"decoder": student["decoder"]})):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_distilled_draft_stays_greedy_exact(setup):
    """A trained draft changes SPEED only: engine output == plain."""
    arch, teacher, student, draft_arch, batch = setup
    state, tx = init_distill_state(student, learning_rate=1e-3)
    step = make_distill_step(draft_arch, arch, tx, temperature=1.0)
    for i in range(10):
        state, _ = step(state, teacher, batch(100 + i))

    sp = SpecialTokens(eot=1, sot=2, first_language=10, n_languages=5,
                       translate=20, transcribe=21, no_speech=22,
                       no_timestamps=23, timestamp_begin=24)
    plain = WhisperEngine(teacher, arch, special=sp, batch_buckets=(2,))
    spec = WhisperEngine(teacher, arch, special=sp, batch_buckets=(2,),
                         draft_params=state.student, draft_arch=draft_arch,
                         spec_window=3)
    mel = np.random.default_rng(7).standard_normal(
        (2, arch.n_mels, 100)).astype(np.float32)
    opts = GenerationOptions(max_new_tokens=10, language="en")
    a = plain.transcribe_features(mel, opts)
    b = spec.transcribe_features(mel, opts)
    np.testing.assert_array_equal(a.num_generated, b.num_generated)
    for i, n in enumerate(a.num_generated):
        upto = a.prompt_len + int(n)
        np.testing.assert_array_equal(b.tokens[i, :upto], a.tokens[i, :upto])

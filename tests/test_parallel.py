"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from thewhisper_tpu.config import ARCH_PRESETS
from thewhisper_tpu.models.whisper import encoder_forward, init_params
from thewhisper_tpu.parallel import (
    batch_sharding,
    make_mesh,
    param_pspecs,
    shard_params,
)
from thewhisper_tpu.training import init_train_state, make_train_step
from thewhisper_tpu.training.train import place_batch


@pytest.fixture(scope="module")
def tiny_arch():
    return dataclasses.replace(
        ARCH_PRESETS["large-v3-turbo"],
        d_model=128, encoder_layers=2, encoder_heads=4, decoder_layers=2,
        decoder_heads=4, d_ff=256, vocab_size=512, n_mels=128,
        max_source_positions=50, max_target_positions=32,
        alignment_heads=((1, 0),),
    )


def test_mesh_shapes():
    assert len(jax.devices()) >= 8
    mesh = make_mesh(8)
    assert mesh.devices.shape == (4, 2)
    mesh = make_mesh(8, dp=2, tp=4)
    assert mesh.devices.shape == (2, 4)
    # Pure-DP request: dp alone derives tp (a tp=2 default used to reject
    # valid dp=n factorizations — round-2 review finding).
    mesh = make_mesh(8, dp=8)
    assert mesh.devices.shape == (8, 1)
    with pytest.raises(ValueError):
        make_mesh(8, dp=3, tp=3)


def test_pspecs_match_param_tree(tiny_arch):
    params = init_params(tiny_arch, seed=0)
    specs = param_pspecs()
    assert jax.tree.structure(params) == jax.tree.structure(
        specs, is_leaf=lambda x: not isinstance(x, dict))


def test_sharded_encoder_matches_single_device(tiny_arch):
    mesh = make_mesh(8)
    params = init_params(tiny_arch, seed=0)
    mel = np.random.default_rng(0).standard_normal(
        (8, tiny_arch.n_mels, 100)).astype(np.float32)

    ref = np.asarray(encoder_forward(params, jnp.asarray(mel), tiny_arch))

    sharded = shard_params(params, mesh)
    mel_s = jax.device_put(jnp.asarray(mel), batch_sharding(mesh, 3))
    out = np.asarray(encoder_forward(sharded, mel_s, tiny_arch))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_sequence_parallel_encoder_matches(tiny_arch):
    """SP: time axis sharded over tp; output must match the unsharded run."""
    from thewhisper_tpu.parallel import seq_sharding

    mesh = make_mesh(8)
    params = init_params(tiny_arch, seed=0)
    mel = np.random.default_rng(2).standard_normal(
        (4, tiny_arch.n_mels, 100)).astype(np.float32)

    ref = np.asarray(encoder_forward(params, jnp.asarray(mel), tiny_arch))

    sharded = shard_params(params, mesh)
    mel_s = jax.device_put(jnp.asarray(mel), batch_sharding(mesh, 3))
    out = encoder_forward(
        sharded, mel_s, tiny_arch, act_sharding=seq_sharding(mesh))
    # The activations really are laid out time-sharded over tp
    # (PartitionSpec drops trailing Nones).
    spec = tuple(out.sharding.spec)
    assert spec[:2] == ("dp", "tp") and all(s is None for s in spec[2:]), spec
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


def test_sharded_train_step_decreases_loss(tiny_arch):
    mesh = make_mesh(8)
    params = shard_params(init_params(tiny_arch, seed=0), mesh)
    state, tx = init_train_state(params, learning_rate=1e-3)
    step = make_train_step(tiny_arch, tx)

    rng = np.random.default_rng(1)
    batch = place_batch({
        "mel": rng.standard_normal((8, tiny_arch.n_mels, 100),
                                   dtype=np.float32),
        "tokens": rng.integers(0, tiny_arch.vocab_size, (8, 16)).astype(np.int32),
        "loss_mask": np.ones((8, 16), np.float32),
    }, mesh)

    losses = []
    for _ in range(5):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 5


def test_remat_gradients_match(tiny_arch):
    """jax.checkpoint changes memory, not math: grads must agree."""
    from thewhisper_tpu.training.train import loss_fn

    params = init_params(tiny_arch, seed=3)
    rng = np.random.default_rng(4)
    batch = {
        "mel": jnp.asarray(rng.standard_normal(
            (2, tiny_arch.n_mels, 100), dtype=np.float32)),
        "tokens": jnp.asarray(
            rng.integers(0, tiny_arch.vocab_size, (2, 12)).astype(np.int32)),
        "loss_mask": jnp.ones((2, 12), jnp.float32),
    }
    grad = jax.jit(jax.value_and_grad(loss_fn),
                   static_argnums=(2, 3, 4))
    l_ref, g_ref = grad(params, batch, tiny_arch, jnp.float32, False)
    l_rm, g_rm = grad(params, batch, tiny_arch, jnp.float32, True)
    assert np.isclose(float(l_ref), float(l_rm), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_rm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_remat_sharded_train_step(tiny_arch):
    """Remat composes with the (dp, tp) sharded step."""
    mesh = make_mesh(8)
    params = shard_params(init_params(tiny_arch, seed=5), mesh)
    state, tx = init_train_state(params, learning_rate=1e-3)
    step = make_train_step(tiny_arch, tx, remat=True)
    rng = np.random.default_rng(6)
    batch = place_batch({
        "mel": rng.standard_normal((8, tiny_arch.n_mels, 100),
                                   dtype=np.float32),
        "tokens": rng.integers(0, tiny_arch.vocab_size, (8, 16)).astype(np.int32),
        "loss_mask": np.ones((8, 16), np.float32),
    }, mesh)
    losses = []
    for _ in range(3):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert all(np.isfinite(losses)) and losses[-1] < losses[0], losses


def test_dryrun_multichip_entrypoint():
    import sys

    sys.path.insert(0, ".")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_entry_lowers():
    import sys

    sys.path.insert(0, ".")
    from __graft_entry__ import entry

    fn, args = entry()
    jax.jit(fn).lower(*args)  # trace + lower only (compile is the driver's job)


def test_sharded_full_engine_generate_parity(tiny_arch):
    """Token parity of the COMPLETE bucketed generate program — KV cache,
    suppress masks, alignment capture, speculation off — between a
    dp=4 x tp=2 mesh and a single device (round-2 review weak #6)."""
    from thewhisper_tpu.config import GenerationOptions, SpecialTokens
    from thewhisper_tpu.engine import WhisperEngine

    sp = SpecialTokens(
        eot=1, sot=2, first_language=10, n_languages=5, translate=20,
        transcribe=21, no_speech=22, no_timestamps=23, timestamp_begin=24)
    params = init_params(tiny_arch, seed=3)
    mesh = make_mesh(8)

    eng_single = WhisperEngine(
        params, tiny_arch, special=sp, batch_buckets=(8,),
        suppress_tokens=[5, 6], begin_suppress_tokens=[7])
    eng_sharded = WhisperEngine(
        shard_params(params, mesh), tiny_arch, special=sp,
        batch_buckets=(8,), suppress_tokens=[5, 6],
        begin_suppress_tokens=[7], mesh=mesh)

    rng = np.random.default_rng(11)
    mel = rng.standard_normal((8, tiny_arch.n_mels, 100), dtype=np.float32)
    opts = GenerationOptions(max_new_tokens=6, language="en",
                             return_timestamps=True)
    a = eng_single.transcribe_features(mel, opts)
    b = eng_sharded.transcribe_features(mel, opts)
    np.testing.assert_array_equal(a.tokens, b.tokens)
    np.testing.assert_array_equal(a.num_generated, b.num_generated)
    np.testing.assert_allclose(a.sum_logprob, b.sum_logprob,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(a.align, b.align, rtol=1e-3, atol=1e-3)


def test_sharded_pipelined_longform_matches_single(tiny_arch):
    """The pipelined long-form path (device-sliced windows + async
    dispatch) over a dp x tp mesh engine produces the same transcript as
    the single-device engine — the round-3 dispatch path composes with
    GSPMD sharding."""
    from thewhisper_tpu.config import GenerationOptions, SpecialTokens
    from thewhisper_tpu.engine import WhisperEngine
    import thewhisper_tpu.pipeline as pl

    sp = SpecialTokens(
        eot=1, sot=2, first_language=10, n_languages=5, translate=20,
        transcribe=21, no_speech=22, no_timestamps=23, timestamp_begin=24)
    params = init_params(tiny_arch, seed=4)
    mesh = make_mesh(8)
    # 50 encoder positions -> 1 s model chunk.
    eng_single = WhisperEngine(params, tiny_arch, special=sp,
                               batch_buckets=(1,))
    eng_sharded = WhisperEngine(shard_params(params, mesh), tiny_arch,
                                special=sp, batch_buckets=(1,), mesh=mesh)

    class Tok:
        def decode(self, ids, skip_special_tokens=True):
            return "".join(f" t{int(i)}" for i in ids if int(i) < 500)

    audio = (0.1 * np.random.default_rng(5).standard_normal(4 * 16000)
             ).astype(np.float32)
    kw = {"max_new_tokens": 5, "language": "en"}
    old = pl.PIPELINE_DEPTH
    try:
        pl.PIPELINE_DEPTH = 2
        p_single = pl.ASRPipeline(eng_single, tokenizer=Tok(),
                                  chunk_length_s=1, batch_size=1)
        p_sharded = pl.ASRPipeline(eng_sharded, tokenizer=Tok(),
                                   chunk_length_s=1, batch_size=1)
        a = p_single(audio, chunk_length_s=1, return_timestamps=False,
                     generate_kwargs=dict(kw), batch_size=1)
        b = p_sharded(audio, chunk_length_s=1, return_timestamps=False,
                      generate_kwargs=dict(kw), batch_size=1)
    finally:
        pl.PIPELINE_DEPTH = old
    assert a["text"] == b["text"]

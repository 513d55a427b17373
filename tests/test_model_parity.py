"""Numerical parity of the JAX Whisper graph vs HF torch (CPU, fp32).

Strategy per SURVEY.md section 4: golden-value tests on a tiny random
HF ``WhisperForConditionalGeneration`` — encoder outputs, teacher-forced
logits, and the cached prefill/step path against the uncached path.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import thewhisper_tpu.models as M
from thewhisper_tpu.models.whisper import (
    DecodeCache,
    decoder_prefill,
    decoder_step,
    decoder_train_forward,
    compute_cross_kv,
    make_cache,
)


@pytest.fixture(scope="module")
def tiny_hf():
    import torch
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    torch.manual_seed(0)
    cfg = WhisperConfig(
        vocab_size=1000,
        num_mel_bins=80,
        d_model=64,
        encoder_layers=2,
        encoder_attention_heads=4,
        decoder_layers=2,
        decoder_attention_heads=4,
        encoder_ffn_dim=128,
        decoder_ffn_dim=128,
        max_source_positions=100,
        max_target_positions=50,
        pad_token_id=0,
        bos_token_id=0,
        eos_token_id=1,
        decoder_start_token_id=2,
    )
    model = WhisperForConditionalGeneration(cfg).eval()
    # eager attention so output_attentions=True returns real tensors
    model.config._attn_implementation = "eager"
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    arch = M.arch_from_hf_config(cfg.to_dict(), alignment_heads=((0, 1), (1, 2)))
    params = M.params_from_hf_state_dict(state, arch)
    return model, arch, params


def _mel(batch=2, n_mels=80, frames=200, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((batch, n_mels, frames)).astype(np.float32)


def test_encoder_parity(tiny_hf):
    import torch

    model, arch, params = tiny_hf
    mel = _mel()
    with torch.no_grad():
        ref = model.model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
    ours = np.asarray(M.encoder_forward(params, jnp.asarray(mel), arch))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_decoder_teacher_forced_parity(tiny_hf):
    import torch

    model, arch, params = tiny_hf
    mel = _mel(seed=1)
    tokens = np.array([[1, 5, 9, 12, 40], [3, 7, 2, 0, 11]], dtype=np.int64)
    with torch.no_grad():
        ref = model(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(tokens),
        ).logits.numpy()
    enc = M.encoder_forward(params, jnp.asarray(mel), arch)
    ours = np.asarray(decoder_train_forward(params, jnp.asarray(tokens), enc, arch))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=3e-4)


def test_cached_decode_matches_uncached(tiny_hf):
    _, arch, params = tiny_hf
    mel = _mel(seed=2)
    tokens = np.array([[1, 5, 9, 12, 40, 8], [3, 7, 2, 0, 11, 23]], dtype=np.int64)
    enc = M.encoder_forward(params, jnp.asarray(mel), arch)
    full = np.asarray(decoder_train_forward(params, jnp.asarray(tokens), enc, arch))

    ck, cv = compute_cross_kv(params, enc, arch)
    cache = make_cache(arch, batch=2, max_len=16, cross_k=ck, cross_v=cv)

    prefill_len = 3
    logits_p, cache, align_p = decoder_prefill(
        params, jnp.asarray(tokens[:, :prefill_len]), cache, arch)
    np.testing.assert_allclose(np.asarray(logits_p), full[:, :prefill_len], atol=3e-4)

    for i in range(prefill_len, tokens.shape[1]):
        logits_i, cache, align_i = decoder_step(
            params, jnp.asarray(tokens[:, i: i + 1]), jnp.int32(i), cache, arch)
        np.testing.assert_allclose(np.asarray(logits_i), full[:, i], atol=3e-4)
        assert align_i.shape == (2, 2, enc.shape[1])  # (B, n_align_heads, T_enc)

    # Alignment probs from prefill: (B, P, A, T_enc), rows sum to 1.
    assert align_p.shape == (2, prefill_len, 2, enc.shape[1])
    np.testing.assert_allclose(np.asarray(align_p).sum(-1), 1.0, atol=2e-3)


def test_cross_attention_probs_match_hf(tiny_hf):
    import torch

    model, arch, params = tiny_hf
    mel = _mel(seed=3)
    tokens = np.array([[1, 5, 9, 12]], dtype=np.int64)
    with torch.no_grad():
        out = model(
            input_features=torch.from_numpy(mel[:1]),
            decoder_input_ids=torch.from_numpy(tokens),
            output_attentions=True,
        )
    # HF cross_attentions: tuple per layer of (B, H, S, T_enc)
    ref_sel = np.stack(
        [out.cross_attentions[l][0, h].numpy() for (l, h) in arch.alignment_heads],
        axis=0,
    )  # (A, S, T)

    enc = M.encoder_forward(params, jnp.asarray(mel[:1]), arch)
    ck, cv = compute_cross_kv(params, enc, arch)
    cache = make_cache(arch, batch=1, max_len=8, cross_k=ck, cross_v=cv)
    _, _, align = decoder_prefill(params, jnp.asarray(tokens), cache, arch)
    ours = np.asarray(align)[0].transpose(1, 0, 2)  # (A, S, T)
    np.testing.assert_allclose(ours, ref_sel, atol=2e-4)


def test_interpolate_positions_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    pos = rng.standard_normal((100, 16)).astype(np.float32)
    for new_len in (33, 50, 77):
        ref = (
            F.interpolate(
                torch.from_numpy(pos).unsqueeze(0).transpose(1, 2),
                size=new_len, mode="linear", align_corners=False,
            ).transpose(1, 2).squeeze(0).numpy()
        )
        from thewhisper_tpu.models.load import interpolate_positions

        ours = interpolate_positions(pos, new_len)
        np.testing.assert_allclose(ours, ref, atol=5e-5)

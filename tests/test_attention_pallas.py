"""Custom encoder flash attention vs naive einsum attention (interpret mode)."""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def _naive(q, k, v, valid_len=None):
    dh = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * dh ** -0.5, k,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
    if valid_len is not None:
        mask = jnp.arange(q.shape[2])[None, None, None, :] < valid_len
        logits = jnp.where(mask, logits, -1e9)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      precision=jax.lax.Precision.HIGHEST)


def _interp_attention(**kw):
    """Run the kernel in interpret mode (no TPU in CI)."""
    from unittest import mock

    from jax.experimental import pallas as pl

    from thewhisper_tpu.ops import attention_pallas as A

    real_call = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return real_call(*args, **kwargs)

    with mock.patch.object(A.pl, "pallas_call", patched):
        return A.encoder_flash_attention.__wrapped__(**kw)


@pytest.mark.parametrize("valid_len", [None, 200])
def test_matches_naive_f32(valid_len):
    rng = np.random.default_rng(0)
    b, h, s, dh = 2, 3, 256, 64
    q = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    ref = np.asarray(_naive(q, k, v, valid_len))
    out = np.asarray(_interp_attention(
        q=q, k=k, v=v, valid_len=valid_len, block_q=128, block_k=128,
        exp_dtype=jnp.float32))
    if valid_len is not None:
        ref, out = ref[:, :, :valid_len], out[:, :, :valid_len]
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_bf16_exp_close():
    rng = np.random.default_rng(1)
    b, h, s, dh = 1, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.bfloat16)
    ref = np.asarray(_naive(q, k, v).astype(jnp.float32))
    out = np.asarray(_interp_attention(
        q=q, k=k, v=v, valid_len=None, block_q=128, block_k=128,
        exp_dtype=jnp.bfloat16).astype(jnp.float32))
    # bf16 exp: probs lose <=1 ULP; outputs stay within bf16 noise of ref.
    assert np.abs(out - ref).max() < 0.05, np.abs(out - ref).max()
    cc = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert cc > 0.999


def test_rejects_non_divisible():
    q = jnp.zeros((1, 1, 200, 64))
    with pytest.raises(ValueError):
        from thewhisper_tpu.ops.attention_pallas import encoder_flash_attention

        encoder_flash_attention(q, q, q, block_q=128, block_k=128)

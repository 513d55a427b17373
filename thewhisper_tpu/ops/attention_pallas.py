"""Custom non-causal flash attention — a measured NEGATIVE result.

**Production uses the generic
``jax.experimental.pallas.ops.tpu.flash_attention``** (models/whisper.py).
This file is the specialized alternative that was built to try to beat it,
kept because the experiment and its numbers answer "why not a custom
kernel?" for future perf work.

Measured at the encoder shape (B=32, H=20, S=1536, dh=64, 32 layers,
v5e; ``tools/attention_probe.py``):

- generic kernel (segment-id masking and all): **270 ms**
- this kernel, exp in f32:                      434 ms
- this kernel, exp in bf16:                     451 ms (bf16 exp is NOT
  faster on this VPU)
- this kernel with exp REMOVED (wrong math):    315 ms

i.e. the generic kernel with full softmax beats this one with softmax
deleted — its DMA/MXU pipelining dominates anything saved here by folding
the scale into q, masking only the pad-straddling k-block, or skipping
segment ids. The pure-matmul floor at dh=64 (half-MXU) is ~126 ms, so the
generic kernel runs at ~47% of that bound with the softmax VPU work
included; headroom exists only for a much more serious kernel (manual
double-buffered DMA + MXU/VPU overlap), not for block-level tweaks.

Numerics (tests/test_attention_pallas.py): matches the naive einsum to
2e-5 in f32; bf16-exp stays within ~2e-3 of the generic kernel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                 *, block_k: int, n_k: int, valid_len: int, s_total: int,
                 exp_dtype):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                                   # (block_q, dh)
    k = k_ref[0]                                   # (block_k, dh)
    # CLAUDE.md invariant: f32 contractions force HIGHEST (XLA's default
    # f32 precision is reduced); bf16 keeps the MXU-native default.
    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec)                            # (block_q, block_k) f32

    if valid_len < s_total:
        # Mask only the k-blocks that overlap the pad tail; clean blocks
        # (the common case) skip the compare+select entirely.
        def masked(s):
            col = jax.lax.broadcasted_iota(
                jnp.int32, s.shape, 1) + ik * block_k
            return jnp.where(col < valid_len, s, NEG_INF)

        s = jax.lax.cond(
            (ik + 1) * block_k > valid_len, masked, lambda s: s, s)

    m_prev = m_ref[:]                              # (block_q, 1) f32
    l_prev = l_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    corr = jnp.exp(m_prev - m_new)                 # (block_q, 1)
    p = jnp.exp((s - m_new).astype(exp_dtype))     # (block_q, block_k)
    l_ref[:] = l_prev * corr + jnp.sum(
        p.astype(jnp.float32), axis=1, keepdims=True)
    m_ref[:] = m_new
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec)                            # (block_q, dh) f32
    acc_ref[:] = acc_ref[:] * corr + pv

    @pl.when(ik == n_k - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("valid_len", "block_q", "block_k", "exp_dtype"))
def encoder_flash_attention(
    q: jnp.ndarray,                   # (B, H, S, dh), scale NOT yet applied
    k: jnp.ndarray,
    v: jnp.ndarray,
    valid_len: Optional[int] = None,  # keys >= valid_len are masked out
    block_q: int = 512,
    block_k: int = 512,
    exp_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Flash attention over (B, H, S, dh); S must divide by the blocks."""
    b, h, s, dh = q.shape
    if s % block_q or s % block_k:
        raise ValueError(f"S={s} must be a multiple of the blocks "
                         f"({block_q}, {block_k})")
    valid = s if valid_len is None else int(valid_len)
    n_k = s // block_k
    scale = jnp.asarray(dh ** -0.5, q.dtype)
    q = q * scale                                   # folded once, not per block

    kernel = functools.partial(
        _attn_kernel, block_k=block_k, n_k=n_k, valid_len=valid,
        s_total=s, exp_dtype=exp_dtype)

    bh = b * h
    qf = q.reshape(bh, s, dh)
    kf = k.reshape(bh, s, dh)
    vf = v.reshape(bh, s, dh)

    out = pl.pallas_call(
        kernel,
        grid=(bh, s // block_q, n_k),
        in_specs=[
            pl.BlockSpec((1, block_q, dh), lambda g, iq, ik: (g, iq, 0)),
            pl.BlockSpec((1, block_k, dh), lambda g, iq, ik: (g, ik, 0)),
            pl.BlockSpec((1, block_k, dh), lambda g, iq, ik: (g, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, dh), lambda g, iq, ik: (g, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, s, dh), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),   # running max
            pltpu.VMEM((block_q, 1), jnp.float32),   # running sum
            pltpu.VMEM((block_q, dh), jnp.float32),  # output accumulator
        ],
    )(qf, kf, vf)
    return out.reshape(b, h, s, dh)

"""Encoder-attention core A/B at (B=32, H=20, S=1536, dh=64), 32 layers.

Variants:
- generic: jax.experimental.pallas.ops.tpu.flash_attention (current prod)
- custom_f32 / custom_bf16: ops/attention_pallas.py with exp in f32/bf16
- control_noexp: custom kernel with exp replaced by identity — WRONG math,
  establishes the matmul+bookkeeping floor (how much the exp costs).

Each variant runs as a 32-iteration lax.scan whose carry feeds the next
iteration's q (realistic dependency chain; one dispatch per timing).
"""

import functools
import json
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from thewhisper_tpu.ops import attention_pallas as A

    log(f"backend={jax.default_backend()}")
    b, h, s, dh = 32, 20, 1536, 64
    valid = 1500
    rng = np.random.default_rng(0)
    q0 = jax.device_put(jnp.asarray(
        rng.standard_normal((b, h, s, dh), dtype=np.float32)
        ).astype(jnp.bfloat16))
    k0 = jax.device_put(jnp.asarray(
        rng.standard_normal((b, h, s, dh), dtype=np.float32)
        ).astype(jnp.bfloat16))
    v0 = jax.device_put(jnp.asarray(
        rng.standard_normal((b, h, s, dh), dtype=np.float32)
        ).astype(jnp.bfloat16))

    def scan32(attn):
        @jax.jit
        def fn(q, k, v):
            def body(carry, _):
                o = attn(carry, k, v)
                return o, None
            out, _ = jax.lax.scan(body, q, None, length=32)
            return jnp.mean(out.astype(jnp.float32))
        return fn

    # --- generic kernel (what prod uses today) ------------------------------
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)

    seg = jnp.where(jnp.arange(s)[None, :] < valid, 0, 1
                    ).astype(jnp.int32) * jnp.ones((b, 1), jnp.int32)

    def generic(q, k, v):
        return flash_attention(
            q, k, v, segment_ids=SegmentIds(q=seg, kv=seg), causal=False,
            sm_scale=float(dh) ** -0.5,
            block_sizes=BlockSizes(block_q=512, block_k_major=512,
                                   block_k=512, block_b=1)).astype(q.dtype)

    def custom(exp_dtype, bq=512, bk=512):
        def attn(q, k, v):
            return A.encoder_flash_attention(
                q, k, v, valid_len=valid, block_q=bq, block_k=bk,
                exp_dtype=exp_dtype)
        return attn

    # --- control: exp -> identity (wrong math, timing floor) ----------------
    def control_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                       *, n_k):
        ik = pl.program_id(2)

        @pl.when(ik == 0)
        def _():
            m_ref[:] = jnp.full_like(m_ref, -1e9)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        sij = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_new = jnp.maximum(m_ref[:], jnp.max(sij, axis=1, keepdims=True))
        p = (sij - m_new)                       # NO exp
        l_ref[:] = l_ref[:] + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:] = m_new
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] + pv

        @pl.when(ik == n_k - 1)
        def _():
            o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1.0)
                        ).astype(o_ref.dtype)

    def control(q, k, v):
        bq = bk = 512
        qf = q.reshape(b * h, s, dh)
        out = pl.pallas_call(
            functools.partial(control_kernel, n_k=s // bk),
            grid=(b * h, s // bq, s // bk),
            in_specs=[
                pl.BlockSpec((1, bq, dh), lambda g, iq, ik: (g, iq, 0)),
                pl.BlockSpec((1, bk, dh), lambda g, iq, ik: (g, ik, 0)),
                pl.BlockSpec((1, bk, dh), lambda g, iq, ik: (g, ik, 0)),
            ],
            out_specs=pl.BlockSpec((1, bq, dh), lambda g, iq, ik: (g, iq, 0)),
            out_shape=jax.ShapeDtypeStruct((b * h, s, dh), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, dh), jnp.float32),
            ],
        )(qf, k.reshape(b * h, s, dh), v.reshape(b * h, s, dh))
        return out.reshape(b, h, s, dh)

    cases = [
        ("generic", scan32(generic)),
        ("custom_f32", scan32(custom(jnp.float32))),
        ("custom_bf16", scan32(custom(jnp.bfloat16))),
        ("custom_bf16_1536q", scan32(custom(jnp.bfloat16, bq=1536))),
        ("control_noexp", scan32(control)),
    ]
    out = {}
    for name, fn in cases:
        log(f"[{name}] compiling...")
        t0 = time.time()
        float(fn(q0, k0, v0))
        log(f"  compiled+first in {time.time() - t0:.0f}s")
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            float(fn(q0, k0, v0))
            ts.append(time.perf_counter() - t0)
        ms = statistics.median(ts) * 1e3
        log(f"[{name}] {ms:.1f} ms / 32 layers")
        out[name] = round(ms, 1)

    # numerics sanity: custom vs generic single call
    g = np.asarray(generic(q0, k0, v0).astype(jnp.float32))[:, :, :valid]
    c = np.asarray(custom(jnp.float32)(q0, k0, v0).astype(jnp.float32))[:, :, :valid]
    cb = np.asarray(custom(jnp.bfloat16)(q0, k0, v0).astype(jnp.float32))[:, :, :valid]
    out["max_err_f32_vs_generic"] = float(np.abs(g - c).max())
    out["max_err_bf16_vs_generic"] = float(np.abs(g - cb).max())
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Analytic FLOP counts for MFU reporting (round-3 review #6).

MFU = achieved FLOP/s divided by the chip's peak (v5e bf16 peak is
197 TFLOP/s) — the chip-normalized form of every perf claim in
``bench.py``. Counts are the standard 2*MACs convention over the matmuls
and convolutions; elementwise/LN/softmax work is excluded (sub-percent
at these shapes).

The decode step is HBM-bandwidth-bound, not FLOP-bound — its "MFU" is
reported for normalization, not as an optimization target; the companion
``decode_step_bytes`` gives the bandwidth-side utilization (v5e HBM peak
is ~819 GB/s).
"""

from __future__ import annotations

from thewhisper_tpu.config import WhisperArch

V5E_PEAK_BF16 = 197e12        # FLOP/s
V5E_PEAK_HBM = 819e9          # bytes/s


def encoder_flops(arch: WhisperArch, t_mel: int, batch: int = 1) -> float:
    """Forward FLOPs of the conv stem + encoder stack at ``t_mel`` input
    frames (output length is ``t_mel // 2``)."""
    d, dff = arch.d_model, arch.d_ff
    t = t_mel // 2
    conv1 = 2 * t_mel * 3 * arch.n_mels * d
    conv2 = 2 * t * 3 * d * d
    per_layer = (
        8 * t * d * d          # q/k/v/o projections (2*MACs each)
        + 4 * t * t * d        # scores + values
        + 4 * t * d * dff      # fc1 + fc2
    )
    return batch * (conv1 + conv2 + arch.encoder_layers * per_layer)


def decode_step_flops(arch: WhisperArch, cache_len: int, t_enc: int,
                      batch: int = 1) -> float:
    """FLOPs of ONE incremental decoder step (single query position)."""
    d, dff, v = arch.d_model, arch.d_ff, arch.vocab_size
    per_layer = (
        8 * d * d                   # self q/k/v/o
        + 4 * cache_len * d         # self scores + values over the cache
        + 4 * d * d                 # cross q + o
        + 4 * t_enc * d             # cross scores + values
        + 4 * d * dff               # mlp
    )
    logits = 2 * d * v              # tied-embedding readout
    return batch * (arch.decoder_layers * per_layer + logits)


def decode_step_bytes(arch: WhisperArch, cache_len: int, t_enc: int,
                      batch: int = 1, weight_bytes: int = 1,
                      cache_bytes: int = 2, cross_bytes: int = 1) -> float:
    """HBM bytes read by ONE decoder step (weights + caches; activations
    are negligible at step shapes). Defaults match the "S" engine: int8
    weights/embedding, bf16 self-cache, int8 cross-KV."""
    d, dff, v = arch.d_model, arch.d_ff, arch.vocab_size
    weights_per_layer = (4 * d * d) + (2 * d * d) + (2 * d * dff)
    weights = arch.decoder_layers * weights_per_layer * weight_bytes
    emb = v * d * weight_bytes      # tied readout reads the full table
    self_cache = (arch.decoder_layers * 2 * batch * cache_len * d
                  * cache_bytes)
    cross = arch.decoder_layers * 2 * batch * t_enc * d * cross_bytes
    return weights + emb + self_cache + cross

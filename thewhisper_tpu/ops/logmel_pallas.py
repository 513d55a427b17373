"""Fused Pallas log-mel front-end kernel (the BASELINE.json north-star op).

Replaces the reference's CPU-numpy ``WhisperFeatureExtractor`` STFT
(SURVEY 2.5 "native components") with a TPU-native pipeline:

- **Gather-free framing in XLA**: the reflect-padded audio is turned into
  overlapping 400-sample frames with three phase-shifted reshapes and a
  concat — pure layout ops, no gather — then zero-padded to 512 lanes so
  every downstream shape is MXU/tiling aligned. (A first cut DMA'd raw
  audio rows into the kernel, but Mosaic tiles even HBM memrefs in (8, 128)
  lanes, so a 160-sample hop dimension cannot be sliced; framing is a
  layout problem and XLA's copy engine is the right tool for it.)
- **One Pallas kernel for all the math**: windowed DFT as a single MXU
  matmul against a (512, 512) matrix holding the Re/Im banks side by side
  (the Hann window is folded in), power spectrum, mel projection (second
  matmul), and log10 — fused in VMEM, one HBM round trip for the frames.
  ``jnp.fft`` never appears: XLA's TPU FFT is far slower than the MXU for
  a 400-point transform.
- The per-sample dynamic-range normalization (global max) runs as fused
  XLA afterwards.

Numerics match ``audio.features.log_mel_spectrogram`` (and therefore HF)
to ~1e-4: both matmuls request ``Precision.HIGHEST`` because bf16 MXU
passes would cost ~1e-2 relative error in the power spectrum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from thewhisper_tpu.config import HOP_LENGTH, N_FFT

# Preferred frames per kernel invocation (10 s of audio). Mosaic requires
# the block's second-to-last dim to be a multiple of 8 OR the full array
# dim, so frame counts not divisible by 1000 (e.g. the 15 s bucket's 1500)
# run as one full-length block instead.
BLOCK_F = 1000
DFT_K = 512              # padded contraction dim (>= N_FFT)
DFT_OUT = 512            # Re bank [0:256) + Im bank [256:512)
N_BINS = N_FFT // 2 + 1  # 201 real rfft bins
MEL_PAD = 128            # padded mel output width


def _dft_matrix(window: np.ndarray) -> np.ndarray:
    """(DFT_K, DFT_OUT) windowed DFT: cols [0:201) Re, [256:457) Im."""
    s = np.arange(N_FFT)[:, None].astype(np.float64)
    k = np.arange(N_BINS)[None, :].astype(np.float64)
    ang = 2.0 * np.pi * s * k / N_FFT
    re = (window[:, None] * np.cos(ang)).astype(np.float32)
    im = (window[:, None] * np.sin(ang)).astype(np.float32)
    out = np.zeros((DFT_K, DFT_OUT), dtype=np.float32)
    out[:N_FFT, :N_BINS] = re
    out[:N_FFT, 256: 256 + N_BINS] = im
    return out


def _mel_matrix(mel_fb: np.ndarray) -> np.ndarray:
    """(256, MEL_PAD): mel filter bank zero-padded on both axes."""
    n_bins, n_mels = mel_fb.shape
    out = np.zeros((256, MEL_PAD), dtype=np.float32)
    out[:n_bins, :n_mels] = mel_fb
    return out


def _logmel_kernel(frames_ref, dft_ref, mel_ref, out_ref):
    # Windowed DFT as one MXU matmul; HIGHEST keeps true-f32 accuracy.
    spec = jnp.dot(frames_ref[0], dft_ref[:, :],
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    power = spec[:, :256] ** 2 + spec[:, 256:] ** 2
    mel = jnp.dot(power, mel_ref[:, :],
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    out_ref[0, :, :] = jnp.log10(jnp.maximum(mel, 1e-10))


def _pick_block(f_total: int) -> int:
    if f_total % BLOCK_F == 0:
        return BLOCK_F
    return f_total  # full-dim block satisfies Mosaic for any size


@jax.jit
def _frame(audio: jnp.ndarray) -> jnp.ndarray:
    """(B, N) -> (B, N // 160, 512) zero-padded overlapping frames."""
    b, n = audio.shape
    f_total = n // HOP_LENGTH
    pad = N_FFT // 2
    padded = jnp.pad(audio.astype(jnp.float32), ((0, 0), (pad, pad)),
                     mode="reflect")
    m = f_total * HOP_LENGTH
    b0 = padded[:, 0:m].reshape(b, f_total, HOP_LENGTH)
    b1 = padded[:, HOP_LENGTH:HOP_LENGTH + m].reshape(b, f_total, HOP_LENGTH)
    b2 = padded[:, 2 * HOP_LENGTH:2 * HOP_LENGTH + m].reshape(
        b, f_total, HOP_LENGTH)[..., : N_FFT - 2 * HOP_LENGTH]
    zeros = jnp.zeros((b, f_total, DFT_K - N_FFT), jnp.float32)
    return jnp.concatenate([b0, b1, b2, zeros], axis=-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _logmel_raw(frames: jnp.ndarray, dft: jnp.ndarray, mel: jnp.ndarray,
                interpret: bool = False) -> jnp.ndarray:
    """(B, F, 512) frames -> (B, F, MEL_PAD) log10-mel."""
    b, f_total, _ = frames.shape
    block_f = _pick_block(f_total)
    grid = (b, f_total // block_f)
    return pl.pallas_call(
        _logmel_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_f, DFT_K), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((DFT_K, DFT_OUT), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, MEL_PAD), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_f, MEL_PAD), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, f_total, MEL_PAD), jnp.float32),
        interpret=interpret,
    )(frames, dft, mel)


class _Banks:
    """Cached constant matrices keyed by (mel_fb, window) OBJECT identity.

    Cached as NUMPY arrays: ``log_mel_pallas`` may run inside an outer jit
    trace (the engine's fused audio program), where a ``jnp.asarray``
    result is a tracer — caching one leaks it into later traces
    (UnexpectedTracerError). The jnp conversion happens fresh at each use.

    Identity keying (not content keying) for two reasons found in round-2
    review: a content hash ignored the window (a different window hit the
    stale DFT matrix silently), and hashing a device-resident mel_fb paid
    a blocking device->host fetch — one tunnel RTT — on EVERY eager call.
    Entries hold strong references to the keyed arrays so their ids can't
    be recycled while cached; featurizers keep one (mel_fb, window) pair
    alive, so the cache stays tiny.
    """

    _cache = {}

    @classmethod
    def get(cls, mel_fb, window):
        key = (id(mel_fb), id(window))
        hit = cls._cache.get(key)
        if hit is None or hit[0] is not mel_fb or hit[1] is not window:
            if len(cls._cache) > 16:    # pathological per-call arrays
                cls._cache.clear()
            hit = (mel_fb, window,
                   _dft_matrix(np.asarray(window, np.float64)),
                   _mel_matrix(np.asarray(mel_fb)))
            cls._cache[key] = hit
        return hit[2], hit[3]


def log_mel_pallas(audio: jnp.ndarray, mel_fb: jnp.ndarray,
                   window: jnp.ndarray, interpret: bool = None) -> jnp.ndarray:
    """(B, N) float32 audio -> (B, n_mels, N // 160), HF-parity features.

    Drop-in for ``audio.features.log_mel_spectrogram``. N must be a
    multiple of 160 with at least 8 frames; other sizes fall back to the
    XLA path.
    """
    from thewhisper_tpu.audio.features import log_mel_spectrogram

    if audio.ndim == 1:
        audio = audio[None, :]
    n = audio.shape[-1]
    f_total = n // HOP_LENGTH
    if n % HOP_LENGTH or f_total < 8:
        return log_mel_spectrogram(audio, mel_fb, window)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    n_mels = mel_fb.shape[1]
    dft, mel = _Banks.get(mel_fb, window)

    frames = _frame(audio)
    log_spec = _logmel_raw(frames, dft, mel, interpret=interpret)
    log_spec = log_spec[:, :, :n_mels]
    max_val = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, max_val - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return jnp.transpose(log_spec, (0, 2, 1))

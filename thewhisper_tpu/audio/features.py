"""Log-mel spectrogram front end, numerically matched to HF Whisper.

Reference behavior (HF ``WhisperFeatureExtractor``, used at
``apple/asr_pipeline.py:40-43`` / ``nvidia/asr_pipeline.py:62-65``):

- pad/truncate audio to ``chunk_length_s * 16000`` samples (zeros on the right),
- STFT: n_fft=400, hop=160, periodic Hann, center=True with reflect padding,
  power spectrum, drop the final frame,
- 128 (or 80) slaney-scale / slaney-norm mel filters, ``log10(clip(., 1e-10))``,
- dynamic-range clamp to ``max - 8`` then ``(x + 4) / 4``.

This module is the *reference* implementation in plain JAX (XLA maps the mel
matmul to the MXU and fuses the elementwise tail). ``thewhisper_tpu.ops``
carries the fused Pallas kernel validated against this one.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from thewhisper_tpu.config import HOP_LENGTH, N_FFT, SAMPLE_RATE


def _hertz_to_mel_slaney(freq: np.ndarray) -> np.ndarray:
    """Slaney mel scale: linear below 1 kHz, log above."""
    freq = np.asarray(freq, dtype=np.float64)
    min_log_hertz = 1000.0
    min_log_mel = 15.0
    logstep = 27.0 / np.log(6.4)
    mels = 3.0 * freq / 200.0
    return np.where(
        freq >= min_log_hertz,
        min_log_mel + np.log(np.maximum(freq, min_log_hertz) / min_log_hertz) * logstep,
        mels,
    )


def _mel_to_hertz_slaney(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    freq = 200.0 * mels / 3.0
    return np.where(
        mels >= min_log_mel,
        1000.0 * np.exp(logstep * (np.maximum(mels, min_log_mel) - min_log_mel)),
        freq,
    )


def mel_filter_bank(
    num_frequency_bins: int = N_FFT // 2 + 1,
    num_mel_filters: int = 128,
    min_frequency: float = 0.0,
    max_frequency: float = 8000.0,
    sampling_rate: int = SAMPLE_RATE,
) -> np.ndarray:
    """Triangular slaney-normed mel filter bank, shape (n_freq, n_mel).

    Matches ``transformers.audio_utils.mel_filter_bank(norm="slaney",
    mel_scale="slaney")`` which the HF feature extractor uses.
    """
    fft_freqs = np.linspace(0.0, sampling_rate / 2.0, num_frequency_bins)
    mel_min = _hertz_to_mel_slaney(np.array(min_frequency))
    mel_max = _hertz_to_mel_slaney(np.array(max_frequency))
    mel_points = np.linspace(mel_min, mel_max, num_mel_filters + 2)
    filter_freqs = _mel_to_hertz_slaney(mel_points)

    fdiff = np.diff(filter_freqs)
    ramps = filter_freqs[:, None] - fft_freqs[None, :]      # (n_mel+2, n_freq)
    down = -ramps[:-2] / fdiff[:-1, None]
    up = ramps[2:] / fdiff[1:, None]
    fb = np.maximum(0.0, np.minimum(down, up))              # (n_mel, n_freq)

    enorm = 2.0 / (filter_freqs[2:] - filter_freqs[:-2])
    fb *= enorm[:, None]
    return fb.T.astype(np.float32)                          # (n_freq, n_mel)


def hann_window(n: int = N_FFT) -> np.ndarray:
    """Periodic Hann window (matches ``window_function(400, "hann")``)."""
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))).astype(np.float32)


def frame_audio(padded: jnp.ndarray, num_frames: int) -> jnp.ndarray:
    """Overlapping 400-sample frames at hop 160 from center-padded audio.

    ``padded`` has shape (..., num_frames*160 + 400). Implemented with three
    phase-shifted reshapes instead of a gather, so XLA lowers it to cheap
    reshapes/concats (the same trick keeps the Pallas kernel gather-free).
    """
    n = num_frames * HOP_LENGTH
    b0 = padded[..., 0:n].reshape(*padded.shape[:-1], num_frames, HOP_LENGTH)
    b1 = padded[..., HOP_LENGTH:HOP_LENGTH + n].reshape(
        *padded.shape[:-1], num_frames, HOP_LENGTH)
    b2 = padded[..., 2 * HOP_LENGTH:2 * HOP_LENGTH + n].reshape(
        *padded.shape[:-1], num_frames, HOP_LENGTH)
    return jnp.concatenate([b0, b1, b2[..., : N_FFT - 2 * HOP_LENGTH]], axis=-1)


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def log_mel_spectrogram(
    audio: jnp.ndarray,
    mel_fb: jnp.ndarray,
    window: jnp.ndarray,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """(B, N) float32 audio -> (B, n_mels, N // 160) log-mel features.

    N must be a multiple of ``HOP_LENGTH``. Parity target: HF
    ``WhisperFeatureExtractor.__call__`` (power STFT -> mel -> log10 ->
    max-8 clamp -> (x+4)/4).
    """
    if audio.ndim == 1:
        audio = audio[None, :]
    num_frames = audio.shape[-1] // HOP_LENGTH
    pad = N_FFT // 2
    padded = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    frames = frame_audio(padded, num_frames)                  # (B, F, 400)
    frames = frames.astype(compute_dtype) * window.astype(compute_dtype)
    spec = jnp.fft.rfft(frames, n=N_FFT, axis=-1)             # (B, F, 201)
    power = (spec.real ** 2 + spec.imag ** 2).astype(jnp.float32)
    # HIGHEST: TPU's default f32 einsum runs bf16 passes (CLAUDE.md
    # precision invariant) — this path is the parity reference the Pallas
    # kernel (which itself forces HIGHEST) is validated against.
    mel = jnp.einsum(
        "bfk,km->bfm", power, mel_fb, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    max_val = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, max_val - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return jnp.transpose(log_spec, (0, 2, 1))                 # (B, n_mels, F)


class LogMelFeaturizer:
    """Featurizer with HF-compatible padding semantics and shape bucketing.

    ``__call__`` pads/truncates to ``chunk_length_s`` seconds and returns
    (B, n_mels, chunk_length_s*100) features — one jit cache entry per
    (batch, chunk_length) bucket, which is exactly the shape discipline the
    TPU path needs (SURVEY.md section 7 "Hard parts").
    """

    def __init__(
        self,
        n_mels: int = 128,
        chunk_length_s: float = 30.0,
        sample_rate: int = SAMPLE_RATE,
        use_pallas: Optional[bool] = None,
    ):
        self.n_mels = n_mels
        self.chunk_length_s = float(chunk_length_s)
        self.sample_rate = sample_rate
        self.n_samples = int(self.chunk_length_s * sample_rate)
        self.mel_fb = jnp.asarray(mel_filter_bank(num_mel_filters=n_mels))
        self.window = jnp.asarray(hann_window())
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas

    def _impl(self, audio: jnp.ndarray) -> jnp.ndarray:
        if self.use_pallas:
            from thewhisper_tpu.ops.logmel_pallas import log_mel_pallas

            return log_mel_pallas(audio, self.mel_fb, self.window)
        return log_mel_spectrogram(audio, self.mel_fb, self.window)

    def __call__(self, audio: np.ndarray) -> jnp.ndarray:
        audio = np.asarray(audio, dtype=np.float32)
        if audio.ndim == 1:
            audio = audio[None, :]
        n = audio.shape[-1]
        if n < self.n_samples:
            audio = np.pad(audio, ((0, 0), (0, self.n_samples - n)))
        elif n > self.n_samples:
            audio = audio[:, : self.n_samples]
        return self._impl(jnp.asarray(audio))

    def num_mel_frames(self) -> int:
        return self.n_samples // HOP_LENGTH

"""Fused Pallas log-mel kernel vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

from thewhisper_tpu.audio.features import (
    LogMelFeaturizer,
    hann_window,
    log_mel_spectrogram,
    mel_filter_bank,
)
from thewhisper_tpu.ops.logmel_pallas import log_mel_pallas


def _sig(seconds, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * 16000)) / 16000
    return (0.4 * np.sin(2 * np.pi * (180 + 80 * t) * t)
            + 0.05 * rng.standard_normal(len(t))).astype(np.float32)


@pytest.mark.parametrize("n_mels,seconds", [(128, 10.0), (80, 10.0), (128, 30.0)])
def test_pallas_matches_reference(n_mels, seconds):
    fb = mel_filter_bank(num_mel_filters=n_mels)
    win = hann_window()
    audio = _sig(seconds)
    ref = np.asarray(log_mel_spectrogram(audio, fb, win))
    ours = np.asarray(log_mel_pallas(audio, fb, win, interpret=True))
    assert ours.shape == ref.shape == (1, n_mels, int(seconds * 100))
    np.testing.assert_allclose(ours, ref, atol=5e-4)


def test_pallas_batched():
    fb = mel_filter_bank(num_mel_filters=128)
    win = hann_window()
    batch = np.stack([_sig(10.0, seed=1), _sig(10.0, seed=2)])
    ref = np.asarray(log_mel_spectrogram(batch, fb, win))
    ours = np.asarray(log_mel_pallas(batch, fb, win, interpret=True))
    np.testing.assert_allclose(ours, ref, atol=5e-4)


def test_pallas_odd_sizes_and_fallback():
    fb = mel_filter_bank(num_mel_filters=128)
    win = hann_window()
    # 130 frames: not divisible by the preferred block -> one full-dim block.
    audio = _sig(1.3)
    ref = np.asarray(log_mel_spectrogram(audio, fb, win))
    ours = np.asarray(log_mel_pallas(audio, fb, win, interpret=True))
    np.testing.assert_allclose(ours, ref, atol=5e-4)
    # Sub-8-frame audio falls back to the XLA path (bitwise equal).
    tiny = _sig(0.05)
    ref = np.asarray(log_mel_spectrogram(tiny, fb, win))
    ours = np.asarray(log_mel_pallas(tiny, fb, win, interpret=True))
    np.testing.assert_allclose(ours, ref, atol=1e-7)


def test_featurizer_uses_pallas_flag():
    feat = LogMelFeaturizer(n_mels=128, chunk_length_s=10.0, use_pallas=True)
    out = np.asarray(feat(_sig(4.0)))
    ref = np.asarray(
        LogMelFeaturizer(n_mels=128, chunk_length_s=10.0, use_pallas=False)(_sig(4.0)))
    np.testing.assert_allclose(out, ref, atol=5e-4)


def test_pallas_inside_outer_jit_no_tracer_leak():
    """log_mel_pallas must be callable inside an enclosing jit (the
    engine's fused audio program) across MULTIPLE trace events: the
    constant-bank cache must never capture a tracer from one trace and
    reuse it in the next (regression for an UnexpectedTracerError)."""
    import jax
    import jax.numpy as jnp

    fb = jnp.asarray(mel_filter_bank(num_mel_filters=128))
    win = jnp.asarray(hann_window())

    def make(fn_len):
        @jax.jit
        def prog(audio):
            return log_mel_pallas(audio, fb, win, interpret=True)
        return prog

    a10 = jnp.asarray(_sig(10.0)[None])
    a30 = jnp.asarray(_sig(30.0)[None])
    m10 = np.asarray(make(10)(a10))       # first trace fills the cache
    m30 = np.asarray(make(30)(a30))       # second, different-shape trace
    ref10 = np.asarray(log_mel_spectrogram(a10, fb, win))
    ref30 = np.asarray(log_mel_spectrogram(a30, fb, win))
    np.testing.assert_allclose(m10, ref10, atol=2e-4)
    np.testing.assert_allclose(m30, ref30, atol=2e-4)

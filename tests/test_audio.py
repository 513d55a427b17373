"""Audio front-end tests: WAV I/O round trip and log-mel parity with HF."""

import numpy as np
import pytest

from thewhisper_tpu.audio import (
    LogMelFeaturizer,
    load_audio,
    log_mel_spectrogram,
    mel_filter_bank,
    save_wav,
)
from thewhisper_tpu.audio.features import hann_window


def _test_signal(seconds=3.0, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    chirp = 0.5 * np.sin(2 * np.pi * (200 + 150 * t) * t)
    noise = 0.05 * rng.standard_normal(len(t))
    return (chirp + noise).astype(np.float32)


def test_wav_roundtrip(tmp_path):
    x = _test_signal(1.0)
    path = str(tmp_path / "a.wav")
    save_wav(path, x, 16000)
    y = load_audio(path, sr=16000)
    assert y.shape == x.shape
    assert np.max(np.abs(x - y)) < 2.0 / 32768.0


def _extensible_wav_bytes(payload: bytes, bits: int, subformat: int,
                          rate: int = 16000, channels: int = 1) -> bytes:
    """Hand-build a WAVE_FORMAT_EXTENSIBLE (0xFFFE) file."""
    import struct

    # {code-0000-0010-8000-00AA00389B71}: 2-byte code + 14-byte tail.
    guid = struct.pack("<H", subformat) + bytes.fromhex(
        "0000" "0000" "1000" "800000aa00389b71")
    fmt = struct.pack(
        "<HHIIHH", 0xFFFE, channels, rate, rate * channels * bits // 8,
        channels * bits // 8, bits)
    fmt += struct.pack("<HHI", 22, bits, 0x4) + guid
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(payload)) + payload)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_extensible_wav_int32_pcm_uses_guid():
    """A 32-bit *integer* PCM extensible WAV must decode as PCM, not float:
    the SubFormat GUID is authoritative over the bit-depth heuristic."""
    x = np.array([0.5, -0.25, 0.125], dtype=np.float32)
    pcm = (x * 2147483647.0).astype("<i4").tobytes()
    y = load_audio(_extensible_wav_bytes(pcm, 32, subformat=1), sr=16000)
    np.testing.assert_allclose(y, x, atol=1e-6)

    # And 32-bit float extensible still decodes as float.
    flt = x.astype("<f4").tobytes()
    y2 = load_audio(_extensible_wav_bytes(flt, 32, subformat=3), sr=16000)
    np.testing.assert_allclose(y2, x, atol=1e-7)

    # 16-bit extensible PCM.
    pcm16 = (x * 32767.0).astype("<i2").tobytes()
    y3 = load_audio(_extensible_wav_bytes(pcm16, 16, subformat=1), sr=16000)
    np.testing.assert_allclose(y3, x, atol=1e-4)


def test_load_audio_resamples(tmp_path):
    sr_in = 8000
    x = _test_signal(1.0, sr=sr_in)
    path = str(tmp_path / "b.wav")
    save_wav(path, x, sr_in)
    y = load_audio(path, sr=16000)
    assert abs(len(y) - 2 * len(x)) <= 2


def test_mel_filter_bank_matches_transformers():
    from transformers.audio_utils import mel_filter_bank as hf_fb

    ours = mel_filter_bank(num_mel_filters=128)
    ref = hf_fb(
        num_frequency_bins=201,
        num_mel_filters=128,
        min_frequency=0.0,
        max_frequency=8000.0,
        sampling_rate=16000,
        norm="slaney",
        mel_scale="slaney",
    ).astype(np.float32)
    assert ours.shape == ref.shape == (201, 128)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_hann_window_matches_transformers():
    from transformers.audio_utils import window_function

    np.testing.assert_allclose(hann_window(400), window_function(400, "hann"), atol=1e-7)


@pytest.mark.parametrize("n_mels,seconds", [(128, 30.0), (80, 30.0), (128, 10.0)])
def test_log_mel_matches_hf_feature_extractor(n_mels, seconds):
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor(
        feature_size=n_mels, chunk_length=int(seconds), sampling_rate=16000
    )
    audio = _test_signal(seconds=min(seconds, 7.0))
    ref = fe(
        audio, sampling_rate=16000, return_tensors="np", padding="max_length"
    ).input_features[0]

    feat = LogMelFeaturizer(n_mels=n_mels, chunk_length_s=seconds, use_pallas=False)
    ours = np.asarray(feat(audio))[0]
    assert ours.shape == ref.shape
    # fp32 FFT rounding differs slightly between XLA and torch/numpy backends;
    # 2e-3 in normalized log-mel space is far below transcript-flipping level.
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_log_mel_batched_matches_single():
    feat = LogMelFeaturizer(n_mels=128, chunk_length_s=10.0, use_pallas=False)
    a = _test_signal(4.0, seed=1)
    b = _test_signal(4.0, seed=2)
    batch = np.stack([np.pad(a, (0, feat.n_samples - len(a))),
                      np.pad(b, (0, feat.n_samples - len(b)))])
    out = np.asarray(feat(batch))
    np.testing.assert_allclose(out[0], np.asarray(feat(a))[0], atol=1e-6)
    np.testing.assert_allclose(out[1], np.asarray(feat(b))[0], atol=1e-6)


def test_log_mel_raw_function_shapes():
    window = hann_window()
    fb = mel_filter_bank(num_mel_filters=128)
    audio = _test_signal(2.0)
    out = log_mel_spectrogram(audio, fb, window)
    assert out.shape == (1, 128, len(audio) // 160)


def test_load_audio_ffmpeg_fallback(tmp_path, monkeypatch):
    """Non-WAV bytes route to the ffmpeg subprocess when the binary
    exists (stubbed here: the image has no ffmpeg), and raise a clear
    error when it doesn't."""
    import subprocess

    import pytest

    from thewhisper_tpu.audio import io as aio

    mp3ish = b"ID3\x04\x00" + b"\x00" * 64

    # No ffmpeg on PATH -> actionable ValueError.
    monkeypatch.setattr("shutil.which", lambda _: None)
    with pytest.raises(ValueError, match="ffmpeg"):
        aio.load_audio(mp3ish)

    # Stub ffmpeg: verify the exact pipe contract (f32le mono @ sr).
    want = (0.25 * np.sin(np.linspace(0, 20, 1600))).astype("<f4")

    def fake_run(cmd, input=None, stdout=None, stderr=None, check=False):
        assert cmd[0] == "/fake/ffmpeg" and input == mp3ish
        assert "f32le" in cmd and "-ac" in cmd and "16000" in cmd

        class R:
            returncode = 0
            stdout = want.tobytes()
            stderr = b""
        return R()

    monkeypatch.setattr("shutil.which", lambda _: "/fake/ffmpeg")
    monkeypatch.setattr(subprocess, "run", fake_run)
    out = aio.load_audio(mp3ish, sr=16000)
    np.testing.assert_allclose(out, want)

    # WAV input never touches ffmpeg (would assert in fake_run).
    import wave as wavmod

    p = tmp_path / "a.wav"
    with wavmod.open(str(p), "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
        w.writeframes((np.zeros(160) * 0).astype("<i2").tobytes())
    assert len(aio.load_audio(str(p))) == 160

"""Audio file I/O and resampling without external audio libraries.

The reference leans on ``librosa``/``soundfile``/``sounddevice``
(``streaming/streams.py:6-7``); this build keeps the dependency surface to
numpy + scipy: a small RIFF/WAVE parser (PCM 8/16/24/32 and IEEE float) and
polyphase resampling.
"""

from __future__ import annotations

import io
import struct
import wave
from typing import Tuple, Union

import numpy as np

try:  # scipy is available in the image; fall back to linear interp if not.
    from scipy.signal import resample_poly as _resample_poly
except Exception:  # pragma: no cover
    _resample_poly = None


def _parse_wav_bytes(data: bytes) -> Tuple[np.ndarray, int]:
    """Parse a RIFF/WAVE blob into (float32 samples [-1,1] (n, ch), rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    fmt_body = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
            fmt_body = body
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: subformat in GUID
        # fmt extension: cbSize(2) validBits(2) channelMask(4) SubFormat(16);
        # the GUID's first two bytes are the little-endian format code
        # (1 = PCM, 3 = IEEE float). A 32-bit *integer* extensible WAV must
        # decode as PCM, so the GUID is authoritative; fall back to the bit
        # depth heuristic only when the extension is truncated.
        if fmt_body is not None and len(fmt_body) >= 26:
            audio_format = struct.unpack("<H", fmt_body[24:26])[0]
        else:
            audio_format = 1 if bits != 32 else 3
    if audio_format == 1:  # PCM
        if bits == 16:
            x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 32:
            x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
        elif bits == 8:
            x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        elif bits == 24:
            b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
            x = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float32) / float(1 << 23)
        else:
            raise ValueError(f"unsupported PCM bit depth: {bits}")
    elif audio_format == 3:  # IEEE float
        dtype = "<f4" if bits == 32 else "<f8"
        x = np.frombuffer(raw, dtype=dtype).astype(np.float32)
    else:
        raise ValueError(f"unsupported WAVE format code: {audio_format}")
    if channels > 1:
        x = x[: (len(x) // channels) * channels].reshape(-1, channels)
    else:
        x = x.reshape(-1, 1)
    return x, rate


def resample(audio: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Resample 1-D float audio with a polyphase filter."""
    if orig_sr == target_sr:
        return audio.astype(np.float32, copy=False)
    if _resample_poly is not None:
        g = np.gcd(int(orig_sr), int(target_sr))
        out = _resample_poly(audio.astype(np.float64), target_sr // g, orig_sr // g)
        return out.astype(np.float32)
    # Fallbacks without scipy: the C++ host runtime, then pure numpy.
    from thewhisper_tpu.native_lib import resample_linear_native

    native = resample_linear_native(
        np.asarray(audio, np.float32), target_sr / orig_sr)
    if native is not None:
        return native
    n_out = int(round(len(audio) * target_sr / orig_sr))
    t = np.linspace(0.0, len(audio) - 1.0, n_out)
    return np.interp(t, np.arange(len(audio)), audio).astype(np.float32)


def _ffmpeg_decode(data: bytes, sr: int) -> np.ndarray:
    """Decode arbitrary compressed audio (mp3/flac/ogg/m4a/...) via an
    ``ffmpeg`` subprocess when the binary exists on the host.

    ``librosa.load`` transparently handles these formats for the
    reference (``streaming/streams.py:103-105``); this is the
    no-extra-python-deps equivalent: ffmpeg emits mono float32 PCM at
    the target rate straight to a pipe. Raises FileNotFoundError when
    ffmpeg is absent (callers surface the WAV-parse error instead)."""
    import shutil
    import subprocess

    exe = shutil.which("ffmpeg")
    if exe is None:
        raise FileNotFoundError("ffmpeg not found on PATH")
    proc = subprocess.run(
        [exe, "-v", "error", "-i", "pipe:0", "-f", "f32le", "-ac", "1",
         "-ar", str(int(sr)), "pipe:1"],
        input=data, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        check=False)
    if proc.returncode != 0 or not proc.stdout:
        raise ValueError(
            f"ffmpeg decode failed: {proc.stderr.decode(errors='replace')[:200]}")
    return np.frombuffer(proc.stdout, dtype="<f4").astype(np.float32)


def load_audio(path_or_bytes: Union[str, bytes], sr: int = 16000) -> np.ndarray:
    """Load an audio file as mono float32 in [-1, 1] at sample rate ``sr``.

    Replaces the reference's ``librosa.load(path, sr=...)``
    (``streaming/streams.py:103-105``). WAV decodes in-process (RIFF
    parser above); any other container falls back to ``ffmpeg`` when the
    binary is installed.
    """
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    try:
        x, rate = _parse_wav_bytes(data)
    except ValueError as wav_err:
        try:
            return _ffmpeg_decode(data, sr)
        except FileNotFoundError:
            raise ValueError(
                f"{wav_err}; install ffmpeg for non-WAV formats") from None
    mono = x.mean(axis=1)
    return resample(mono, rate, sr)


def save_wav(path: str, audio: np.ndarray, sr: int = 16000) -> None:
    """Write mono float32 audio as 16-bit PCM WAV."""
    pcm = (np.clip(audio, -1.0, 1.0) * 32767.0).astype("<i2")
    with wave.open(path, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(pcm.tobytes())


def wav_bytes(audio: np.ndarray, sr: int = 16000) -> bytes:
    """Encode mono float audio as 16-bit PCM WAV bytes (for HTTP backends).

    Mirrors ``RemoteAPIBackend._audio_to_wav_bytes``
    (reference ``streaming_pipeline.py:94-113``).
    """
    buf = io.BytesIO()
    pcm = (np.clip(audio.astype(np.float32), -1.0, 1.0) * 32767.0).astype("<i2")
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()

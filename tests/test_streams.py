"""Stream primitives: ArrayStream pacing, FileStream, StdoutStream renderer."""

import io
import time

import numpy as np

from thewhisper_tpu.streaming import ArrayStream, FileStream, StdoutStream


def test_array_stream_non_realtime():
    audio = np.arange(16000, dtype=np.float32)
    st = ArrayStream(audio, step_size_s=0.25, sample_rate=16000, real_time=False)
    chunks = []
    while (c := st.next_chunk()) is not None:
        chunks.append(c)
    assert len(chunks) == 4
    np.testing.assert_array_equal(np.concatenate(chunks), audio)
    assert st.next_chunk() is None  # stays EOF


def test_array_stream_realtime_catchup():
    audio = np.zeros(16000, dtype=np.float32)
    st = ArrayStream(audio, step_size_s=0.05, sample_rate=16000, real_time=True)
    st.next_chunk()                 # first chunk: no pacing reference yet
    time.sleep(0.12)                # caller lags >1 step
    c = st.next_chunk()
    # Lagged caller gets elapsed + step worth of audio (reference :60-61).
    assert len(c) > int(0.05 * 16000)


def test_file_stream(tmp_path):
    from thewhisper_tpu.audio.io import save_wav

    path = str(tmp_path / "s.wav")
    save_wav(path, np.ones(8000, np.float32) * 0.5)
    st = FileStream(path, step_size_s=0.25, real_time=False)
    total = 0
    while (c := st.next_chunk()) is not None:
        total += len(c)
    assert total == 8000


def _words(*texts):
    return [{"text": t} for t in texts]


def test_stdout_stream_rendering():
    buf = io.StringIO()
    out = StdoutStream(file=buf)
    out.write(_words(" hello"), _words(" wor"))
    out.write(_words(), _words(" world"))      # assumption rewritten
    out.write(_words(" world"), _words())      # then committed
    out.close()
    text = buf.getvalue()
    # Committed text appears; backspaces erase the old assumption.
    assert " hello" in text
    assert " world" in text
    assert "\b" in text
    assert text.endswith("\n\x1b[?25h")        # cursor restored on close


def test_stdout_stream_noop_on_empty():
    buf = io.StringIO()
    out = StdoutStream(file=buf)
    before = buf.getvalue()
    out.write([], [])
    assert buf.getvalue() == before

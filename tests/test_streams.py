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
    out.write(_words(" hello"), _words(" wax"))
    out.write(_words(), _words(" world"))      # assumption rewritten
    out.write(_words(" world"), _words(" tail"))  # committed + new tail
    out.close()                                # drops the " tail" remnant
    text = buf.getvalue()
    # Backspaces + clear-to-eol erase the divergent assumption; only the
    # changed suffix is ever rewritten (so " world" need not appear as a
    # contiguous substring of the byte stream).
    assert " hello" in text
    assert "\b" in text and "\x1b[K" in text
    assert text.endswith("\n\x1b[?25h")        # cursor restored on close
    # The final on-screen line is exactly the committed text: replaying
    # the ANSI stream (chars, backspaces, clear-to-eol) proves it.
    line, cur = [], 0
    i = 0
    while i < len(text):
        ch = text[i]
        if text.startswith("\x1b[K", i):
            del line[cur:]
            i += 3
            continue
        if text.startswith("\x1b[?25l", i) or text.startswith("\x1b[?25h", i):
            i += 6
            continue
        if ch == "\b":
            cur -= 1
        elif ch == "\n":
            break
        else:
            if cur < len(line):
                line[cur] = ch
            else:
                line.append(ch)
            cur += 1
        i += 1
    assert "".join(line) == " hello world"


def test_stdout_stream_colored_words_replay():
    """ANSI-colored words (examples/run_streaming.py): the backspace diff
    must count VISIBLE columns, or the cursor walks into committed text
    and erases it (round-2 review finding). Replay with a zero-width-SGR
    terminal model and check the final visible line."""
    import re

    G, Y, R = "\x1b[32m", "\x1b[33m", "\x1b[0m"

    def cw(*texts, color=G):
        return [{"text": color + t + R} for t in texts]

    buf = io.StringIO()
    out = StdoutStream(file=buf)
    out.write(cw(" hello"), cw(" wax", color=Y))
    out.write(cw(), cw(" world", color=Y))     # assumption rewritten
    out.write(cw(" world"), cw(" tail", color=Y))  # commit + new tail
    out.close()
    text = buf.getvalue()

    sgr = re.compile(r"\x1b\[[0-9;]*m")
    line, cur = [], 0
    i = 0
    while i < len(text):
        m = sgr.match(text, i)
        if m:                                   # zero width on screen
            i = m.end()
            continue
        if text.startswith("\x1b[K", i):
            del line[cur:]
            i += 3
            continue
        if text.startswith("\x1b[?25l", i) or text.startswith("\x1b[?25h", i):
            i += 6
            continue
        ch = text[i]
        if ch == "\b":
            cur -= 1
        elif ch == "\n":
            break
        else:
            if cur < len(line):
                line[cur] = ch
            else:
                line.append(ch)
            cur += 1
        i += 1
    assert cur >= 0, "cursor walked off the left edge"
    assert "".join(line) == " hello world"


def test_stdout_stream_noop_on_empty():
    buf = io.StringIO()
    out = StdoutStream(file=buf)
    before = buf.getvalue()
    out.write([], [])
    assert buf.getvalue() == before


def test_stdout_stream_wide_glyph_backspaces():
    """CJK glyphs occupy two terminal columns: the backspace count after a
    diverging tail must be column-accurate or the cursor walks into
    committed text (round-2 advisory). '好' is wide -> erasing it takes
    two backspaces."""
    assert StdoutStream._visible_len("你好") == 4
    assert StdoutStream._visible_len("\x1b[32m你\x1b[0ma") == 3
    buf = io.StringIO()
    out = StdoutStream(file=buf)
    out.write(_words("你"), _words("好"))
    start = len(buf.getvalue())
    out.write(_words(), _words("嗨"))          # rewrite the wide tail
    tail = buf.getvalue()[start:]
    assert tail.startswith("\b\b\x1b[K")        # two columns backed over
    assert tail.endswith("嗨")

"""Subtitle export: cue grouping rules and SRT/VTT formatting."""

import pytest

from thewhisper_tpu.utils.subtitles import (
    group_cues,
    to_srt,
    to_vtt,
    write_subtitles,
)


def w(text, start, end):
    return {"text": text, "timestamp": (start, end)}


CHUNKS = [
    w(" hello", 0.0, 0.4), w(" world", 0.5, 0.9),
    # 1.5 s pause -> new cue
    w(" this", 2.5, 2.8), w(" is", 2.9, 3.0), w(" a", 3.1, 3.2),
    w(" test", 3.3, None),            # open end borrows nothing after
]


def test_group_cues_pause_break_and_open_end():
    cues = group_cues(CHUNKS)
    assert len(cues) == 2
    assert cues[0]["text"] == "hello world"
    assert cues[0]["start"] == 0.0 and cues[0]["end"] == 0.9
    assert cues[1]["text"] == "this is a test"
    assert cues[1]["end"] == pytest.approx(3.8)   # open end -> +0.5 s


def test_group_cues_char_limit():
    long = [w(f" word{i}", i * 0.3, i * 0.3 + 0.25) for i in range(20)]
    cues = group_cues(long, max_chars=20)
    assert len(cues) > 1
    assert all(len(c["text"]) <= 26 for c in cues)
    # No words lost.
    assert sum(len(c["text"].split()) for c in cues) == 20


def test_srt_and_vtt_formatting(tmp_path):
    srt = to_srt(CHUNKS)
    assert srt.startswith("1\n00:00:00,000 --> 00:00:00,900\nhello world\n")
    assert "\n2\n00:00:02,500 --> " in srt
    vtt = to_vtt(CHUNKS)
    assert vtt.startswith("WEBVTT\n\n00:00:00.000 --> 00:00:00.900\n")

    p = tmp_path / "out.srt"
    write_subtitles(str(p), CHUNKS)
    assert p.read_text().startswith("1\n")
    p2 = tmp_path / "out.vtt"
    write_subtitles(str(p2), CHUNKS)
    assert p2.read_text().startswith("WEBVTT")
    with pytest.raises(ValueError):
        write_subtitles(str(tmp_path / "out.txt"), CHUNKS)

"""Streaming state-machine tests with fake backends (SURVEY section 4)."""

import numpy as np
import pytest

from thewhisper_tpu.streaming import StreamingPipeline, TranscriptionBackend
from thewhisper_tpu.streaming.pipeline import (
    LocalWhisperBackend,
    compression_ratio,
)


class FakeBackend(TranscriptionBackend):
    """Deterministic word emitter: one word per 0.5 s of buffered audio."""

    def __init__(self):
        self.calls = []

    def transcribe(self, audio, buffer_start_time, sample_rate):
        self.calls.append((len(audio), buffer_start_time))
        n_words = int(len(audio) / sample_rate / 0.5)
        return [
            {
                "text": f" word{i}",
                "start": buffer_start_time + 0.5 * i,
                "end": buffer_start_time + 0.5 * (i + 1),
            }
            for i in range(n_words)
        ]


class AlwaysSpeechVAD:
    def __call__(self, chunk, sr=16000):
        return 1.0

    def reset_states(self):
        pass


class EnergyGateVAD:
    """Speech iff window RMS > 0.01 (lets tests control VAD via amplitude)."""

    def __call__(self, chunk, sr=16000):
        return 1.0 if float(np.sqrt(np.mean(chunk ** 2))) > 0.01 else 0.0

    def reset_states(self):
        pass


def _chunk(seconds=0.05, amp=0.1, sr=16000, seed=None):
    rng = np.random.default_rng(seed or 0)
    return (amp * rng.standard_normal(int(seconds * sr))).astype(np.float32)


def test_two_second_gate_before_first_transcription():
    be = FakeBackend()
    sp = StreamingPipeline(backend=be, chunk_length_s=10, use_vad=False)
    total, out = 0.0, ([], [])
    while total < 1.9:
        out = sp(_chunk())
        total += 0.05
        assert be.calls == []          # nothing until 2 s buffered
    saw_assumption = False
    while total < 3.0:
        committed, assumption = sp(_chunk())
        total += 0.05
        assert committed == []         # window not exceeded yet
        saw_assumption = saw_assumption or bool(assumption)
    assert len(be.calls) >= 1
    assert saw_assumption


def test_commit_after_window_overflow():
    be = FakeBackend()
    # window = 3 s, trim above (3 - 0.5) = 2.5 s of buffer
    sp = StreamingPipeline(backend=be, chunk_length_s=4, use_vad=False)
    committed_all = []
    for _ in range(70):                # 3.5 s of audio
        c, a = sp(_chunk())
        committed_all.extend(c)
    assert committed_all, "window overflow must commit words"
    assert sp.buffer_start_time > 0.0
    # Committed words end strictly before the assumption region starts.
    assert all(w["start"] < sp.buffer_start_time for w in committed_all)


def test_vad_blocks_silence():
    be = FakeBackend()
    sp = StreamingPipeline(
        backend=be, chunk_length_s=10, use_vad=True, vad=EnergyGateVAD())
    for _ in range(60):                # 3 s of near-silence
        sp(_chunk(amp=0.001))
    assert be.calls == []


def test_vad_preroll_prepended():
    be = FakeBackend()
    sp = StreamingPipeline(
        backend=be, chunk_length_s=10, use_vad=True, vad=EnergyGateVAD(),
        vad_prepend_chunks=3)
    for _ in range(4):                 # silence fills the pre-roll ring
        sp(_chunk(seconds=0.2, amp=0.001))
    assert be.calls == []
    for _ in range(12):                # 2.4 s speech
        sp(_chunk(seconds=0.2, amp=0.2))
    assert be.calls
    # The first processed buffer contains pre-roll silence + speech: more
    # audio than the speech alone (2 pre-roll chunks of 0.2 s prepended).
    first_len = be.calls[0][0]
    assert first_len >= int(2.4 * 16000)


def test_postprocess_rules():
    sp = StreamingPipeline(backend=FakeBackend(), chunk_length_s=10, use_vad=False)

    def w(text, s=0.0, e=0.5):
        return {"text": text, "start": s, "end": e}

    # Dot fusion into previous word.
    out = sp._postprocess([w(" Hello"), w(" ."), w(" world")])
    assert [x["text"] for x in out] == [" Hello.", " world"]
    # Leading space is enforced; " -" becomes "-".
    out = sp._postprocess([w("Hi"), w(" -yes")])
    assert [x["text"] for x in out] == [" Hi", "-yes"]
    # Casing artifacts.
    out = sp._postprocess([w(" gonNA"), w(" gotTA"), w(" wanNA")])
    assert [x["text"] for x in out] == [" gonna", " gotta", " wanna"]
    # Lone hallucination dropped.
    assert sp._postprocess([w(" The.")]) == []
    assert sp._postprocess([w(" I.")]) == []
    # Duplicate of last committed word dropped.
    sp._last_committed_word = "same"
    out = sp._postprocess([w(" Same"), w(" next")])
    assert [x["text"] for x in out] == [" next"]


def test_truncation_time_policy():
    sp = StreamingPipeline(backend=FakeBackend(), chunk_length_s=10, use_vad=False)
    sp.current_time = 10.0

    def w(text, s, e):
        return {"text": text, "start": s, "end": e}

    # Sentence end older than 2 s wins.
    words = [w(" a", 0, 1), w(" b.", 1, 2), w(" c", 2, 3), w(" d", 6, 9.5)]
    assert sp._truncation_time(words, True) == 2
    # Index-0 sentence end is falsy (reference quirk) -> falls through to pause.
    words = [w(" b.", 0, 1), w(" c", 5, 6), w(" d", 6, 7)]
    out = sp._truncation_time(words, True)
    assert out == 1  # largest pause is before index 1 -> end of word 0
    # No punctuation: largest pause.
    words = [w(" a", 0, 1), w(" b", 1, 2), w(" c", 5, 6)]
    assert sp._truncation_time(words, True) == 2
    # Empty words with need_trim: falls back near current_time.
    assert sp._truncation_time([], True) == 10.0 - 2 * sp.min_process_chunk_s


def test_clear_resets_everything():
    be = FakeBackend()
    sp = StreamingPipeline(backend=be, chunk_length_s=4, use_vad=False)
    for _ in range(70):
        sp(_chunk())
    assert sp.current_audio_buffer is not None
    sp.clear()
    assert sp.current_audio_buffer is None
    assert sp.buffer_start_time == 0.0
    assert sp.current_time == 0.0
    assert sp.history == []
    c, a = sp.process_new_chunk()
    assert (c, a) == ([], [])


def test_gibberish_filter():
    class RepeatPipeline:
        def __call__(self, audio, **kw):
            return {
                "text": " the the the the the the the the the the the the"
                        " the the the the the the the the the the the the",
                "chunks": [],
            }

    from thewhisper_tpu.pipeline import ASRPipeline

    fake = RepeatPipeline()
    fake.__class__.__mro__  # noqa - duck type below instead
    be = LocalWhisperBackend.__new__(LocalWhisperBackend)
    be.asr_pipeline = fake
    be.chunk_length_s = 10
    be.language = "en"
    be.max_new_tokens = 128
    out = be.transcribe(np.zeros(32000, np.float32), 0.0, 16000)
    assert out == []
    assert compression_ratio("abcdefgh12345") < 2.2


@pytest.mark.parametrize("reuse", [False, True])
def test_long_stream_soak_with_vad_and_real_model(tmp_path_factory, reuse):
    """60 s of alternating speech/silence through the VAD + tiny model:
    the full streaming stack (VAD gating, trims, commits, gibberish
    filtering) stays consistent over a long session — with and without
    cross-tick speculative reuse (the production streaming speedup)."""
    import sys

    sys.path.insert(0, "tools")
    from make_tiny_checkpoint import make_checkpoint

    import jax.numpy as jnp

    from thewhisper_tpu.pipeline import ASRPipeline
    from thewhisper_tpu.streaming.pipeline import LocalWhisperBackend

    ckpt = tmp_path_factory.mktemp("soak") / f"tiny-{int(reuse)}"
    make_checkpoint(str(ckpt), seed=0)
    asr = ASRPipeline(str(ckpt), chunk_length_s=10, compute_dtype=jnp.float32,
                      reuse_previous_tokens=reuse)
    backend = LocalWhisperBackend(asr, chunk_length_s=10, max_new_tokens=8)

    sp = StreamingPipeline(backend=backend, chunk_length_s=10, use_vad=True)
    rng = np.random.default_rng(0)
    sr = 16000
    t_total = 0.0
    commits = []
    # 60 s: 5 s formant-synthesized speech alternating with 5 s
    # near-silence — realistic input for the default (neural) VAD.
    from thewhisper_tpu.streaming.vad_corpus import synth_speech

    for block in range(12):
        speech = block % 2 == 0
        if speech:
            audio5, _ = synth_speech(rng, 5.0, sr)
            audio5 = (0.5 * audio5 / (np.abs(audio5).max() + 1e-9)
                      + 0.002 * rng.standard_normal(len(audio5))
                      ).astype(np.float32)
        else:
            audio5 = (0.0005 * rng.standard_normal(5 * sr)).astype(np.float32)
        for i in range(100):  # 0.05 s chunks
            c, a = sp(audio5[i * 800: (i + 1) * 800])
            commits.extend(c)
            t_total += 0.05

    # The buffer respects the rolling-window bound throughout.
    max_allowed = (sp.window_size) * sr
    assert len(sp._buffer) <= max_allowed
    # Time bookkeeping is consistent: committed words never exceed the
    # stream clock and are monotonically ordered.
    starts = [w["start"] for w in commits]
    assert all(s <= sp.current_time + 1e-6 for s in starts)
    assert all(starts[i] <= starts[i + 1] + 1e-6 for i in range(len(starts) - 1))
    # VAD actually gated: far fewer transcriptions than chunks.
    assert 0 < sp.stats["chunks_processed"] < 1200
    sp.clear()
    assert sp.current_audio_buffer is None

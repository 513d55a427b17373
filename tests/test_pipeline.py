"""Offline ASRPipeline end-to-end on a tiny random engine."""

import dataclasses

import numpy as np
import pytest

from thewhisper_tpu.config import ARCH_PRESETS, SpecialTokens
from thewhisper_tpu.engine import WhisperEngine
from thewhisper_tpu.models.whisper import init_params
from thewhisper_tpu.pipeline import ASRPipeline


class MapTokenizer:
    def __init__(self, vocab=200):
        self.words = {i: f" w{i}" for i in range(vocab)}

    def decode(self, ids, skip_special_tokens=True):
        return "".join(self.words.get(int(i), "") for i in ids if int(i) < 90)


@pytest.fixture(scope="module")
def tiny_pipeline():
    arch = dataclasses.replace(
        ARCH_PRESETS["tiny"],
        d_model=64, encoder_layers=2, encoder_heads=4, decoder_layers=2,
        decoder_heads=4, d_ff=128, vocab_size=200, n_mels=80,
        max_source_positions=150, max_target_positions=64,
        alignment_heads=((1, 0), (1, 2)),
    )
    params = init_params(arch, seed=3)
    sp = SpecialTokens(
        eot=101, sot=102, first_language=110, n_languages=5,
        translate=120, transcribe=121, no_speech=122, no_timestamps=123,
        timestamp_begin=124,
    )
    eng = WhisperEngine(params, arch, special=sp, batch_buckets=(1, 2, 4))
    # Model chunk = 3 s (300 mel frames -> 150 encoder positions).
    return ASRPipeline(eng, tokenizer=MapTokenizer(), chunk_length_s=3)


def _audio(seconds, seed=0):
    rng = np.random.default_rng(seed)
    return (0.1 * rng.standard_normal(int(seconds * 16000))).astype(np.float32)


def test_single_window_output_schema(tiny_pipeline):
    out = tiny_pipeline(
        _audio(2.0), return_timestamps="word",
        generate_kwargs={"max_new_tokens": 8, "language": "en"},
    )
    assert set(out) == {"text", "chunks"}
    for ch in out["chunks"]:
        assert set(ch) == {"text", "timestamp"}
        s, e = ch["timestamp"]
        assert s is not None and s >= 0.0
        if e is not None:
            assert e >= s
    # Last word may have an open end (None) like the reference backends expect.


def test_long_audio_multi_window(tiny_pipeline):
    out = tiny_pipeline(
        _audio(7.0, seed=1), return_timestamps="word",
        generate_kwargs={"max_new_tokens": 8, "language": "en"},
        chunk_length_s=2.0,
    )
    assert isinstance(out["text"], str)
    starts = [c["timestamp"][0] for c in out["chunks"]]
    assert all(s is not None for s in starts)


def test_segment_timestamps_mode(tiny_pipeline):
    """``return_timestamps=True`` (the HF segment mode the reference's
    NVIDIA path inherits, nvidia/asr_pipeline.py:30-89) returns segment
    chunks derived from the word alignment — same text, same tokens,
    coarser chunks."""
    class WideTokenizer:
        # Decode every non-special id (MapTokenizer stops at 90 and the
        # random model rarely emits ids below it): every third word gets
        # sentence-final punctuation so the grouping rule has material.
        def decode(self, ids, skip_special_tokens=True):
            return "".join(
                f" w{i}." if int(i) % 3 == 0 else f" w{i}"
                for i in ids if int(i) < 101)

    # Fresh engine with every id >= eot suppressed: the raw random model
    # greedily emits ids the pipeline filters as specials (t < eot) —
    # leaving no words to group.
    base = tiny_pipeline.engine
    eng = WhisperEngine(base.params, base.arch, special=base.special,
                        batch_buckets=(1, 2, 4),
                        suppress_tokens=list(range(101, 200)))
    pipe = ASRPipeline(eng, tokenizer=WideTokenizer(), chunk_length_s=3)
    a = _audio(2.0)
    kw = {"max_new_tokens": 8, "language": "en"}
    plain = pipe(a, return_timestamps=False, generate_kwargs=dict(kw))
    words = pipe(a, return_timestamps="word", generate_kwargs=dict(kw))
    segs = pipe(a, return_timestamps=True, generate_kwargs=dict(kw))
    segs2 = pipe(a, return_timestamps="segment", generate_kwargs=dict(kw))
    assert segs == segs2
    # Segment mode must not perturb the transcript.
    assert segs["text"] == words["text"] == plain["text"]
    # Segments cover exactly the word text, in order, with sane spans.
    assert ("".join(c["text"] for c in segs["chunks"])
            == "".join(c["text"] for c in words["chunks"]))
    assert 1 <= len(segs["chunks"]) <= len(words["chunks"])
    for ch in segs["chunks"]:
        s, e = ch["timestamp"]
        assert s is not None and s >= 0.0
        if e is not None:
            assert e >= s
    # Long-form path too (multi-window LCS merge).
    out = pipe(
        _audio(7.0, seed=6), return_timestamps=True,
        generate_kwargs=dict(kw), chunk_length_s=2.0)
    assert "chunks" in out and out["chunks"]

    with pytest.raises(ValueError):
        pipe(a, return_timestamps="char", generate_kwargs=dict(kw))


def test_group_words_into_segments_rules():
    """Pure grouping rules: sentence-final punctuation closes a segment,
    a > 1 s pause opens a new one, confidences average."""
    from thewhisper_tpu.pipeline import _group_words_into_segments

    words = [
        {"text": " Hello", "timestamp": (0.0, 0.4), "confidence": 0.9},
        {"text": " world.", "timestamp": (0.5, 0.8), "confidence": 0.7},
        {"text": " Then", "timestamp": (1.0, 1.3)},
        {"text": " silence", "timestamp": (1.4, 1.6)},
        # 2.1 s pause -> new segment even without punctuation.
        {"text": " after", "timestamp": (3.7, 4.0)},
        {"text": " it", "timestamp": (4.1, None)},   # open end tolerated
    ]
    segs = _group_words_into_segments(words)
    assert [s["text"] for s in segs] == [
        " Hello world.", " Then silence", " after it"]
    assert segs[0]["timestamp"] == (0.0, 0.8)
    assert segs[0]["confidence"] == pytest.approx(0.8)
    assert segs[1]["timestamp"] == (1.0, 1.6)
    assert "confidence" not in segs[1]
    assert segs[2]["timestamp"] == (3.7, None)


def test_transcribe_batch_segment_mode(tiny_pipeline):
    out = tiny_pipeline.transcribe_batch(
        [_audio(1.5, seed=7), _audio(2.0, seed=8)],
        return_timestamps=True,
        generate_kwargs={"max_new_tokens": 6, "language": "en"})
    for o in out:
        assert "chunks" in o
        assert "".join(c["text"] for c in o["chunks"]) == o["text"]


def test_no_timestamps_mode(tiny_pipeline):
    out = tiny_pipeline(
        _audio(2.0, seed=2), return_timestamps=False,
        generate_kwargs={"max_new_tokens": 6},
    )
    assert "text" in out and "chunks" not in out


def test_determinism(tiny_pipeline):
    a = _audio(2.5, seed=4)
    kw = {"max_new_tokens": 8, "language": "en"}
    o1 = tiny_pipeline(a, return_timestamps="word", generate_kwargs=dict(kw))
    o2 = tiny_pipeline(a, return_timestamps="word", generate_kwargs=dict(kw))
    assert o1 == o2


def test_latency_buckets(tiny_pipeline):
    from thewhisper_tpu.pipeline import ASRPipeline

    eng = tiny_pipeline.engine
    pipe = ASRPipeline(
        eng, tokenizer=tiny_pipeline.tokenizer, chunk_length_s=3,
        latency_buckets=[1.0, 2.0])
    assert pipe.latency_buckets == [1.0, 2.0, 3.0]
    assert pipe._pick_bucket(0.8) == 1.0
    assert pipe._pick_bucket(1.5) == 2.0
    assert pipe._pick_bucket(2.9) == 3.0

    # Short buffer rides the 1 s bucket; output schema unchanged.
    out = pipe.transcribe_batch(
        [_audio(0.7, seed=9)], generate_kwargs={"max_new_tokens": 4,
                                                "language": "en"})
    assert isinstance(out[0]["text"], str)
    # Full-length buffer uses the model chunk; result matches the default
    # single-bucket pipeline exactly.
    base = tiny_pipeline.transcribe_batch(
        [_audio(2.8, seed=10)], generate_kwargs={"max_new_tokens": 4,
                                                 "language": "en"})
    bucketed = pipe.transcribe_batch(
        [_audio(2.8, seed=10)], generate_kwargs={"max_new_tokens": 4,
                                                 "language": "en"})
    assert base[0]["text"] == bucketed[0]["text"]


def test_word_timestamps_skip_special_tokens_without_shift(
        tiny_pipeline, monkeypatch):
    """A special token dropped mid-sequence must not shift later tokens'
    alignment rows: rows are indexed by raw generated position."""
    from thewhisper_tpu.config import GenerationOptions
    import thewhisper_tpu.pipeline as pl
    from thewhisper_tpu.engine.engine import EngineResult

    p = 4          # prompt length
    eot = 101

    class StubEngine:
        arch = tiny_pipeline.engine.arch
        special = tiny_pipeline.engine.special

        def transcribe_features(self, mel, opts):
            # generated: [10, 11, <special 150>, 12, EOT]
            toks = np.array([[102, 110, 121, 123, 10, 11, 150, 12, eot, 0]],
                            np.int32)
            return EngineResult(
                tokens=toks, num_generated=np.array([4]), prompt_len=p,
                sum_logprob=np.zeros(1), align=np.zeros((1, 1, 10, 8)),
                decode_time_s=0.0,
                token_logprobs=np.zeros((1, 6)), no_speech_prob=np.zeros(1))

        def transcribe_audio(self, audio, opts, use_pallas=None,
                             languages=None, draft_tokens=None):
            return self.transcribe_features(None, opts)

    # Row r of the alignment maps to time r * 0.1 s, deterministically.
    monkeypatch.setattr(
        pl, "token_timestamps_from_alignment",
        lambda align, num_rows, num_frames, median_filter_width:
            np.tile(np.arange(10, dtype=np.float64) * 0.1, (align.shape[0], 1)))

    pipe = ASRPipeline(tiny_pipeline.engine, tokenizer=MapTokenizer(),
                       chunk_length_s=3)
    pipe.engine = StubEngine()
    seqs, ts_seqs, _, _ = pipe._decode_windows(
        [np.zeros(16000, np.float32)], [0],
        GenerationOptions(max_new_tokens=6, language="en",
                          return_timestamps=True),
        1, want_words=True)
    assert seqs[0] == [10, 11, 12]
    # Raw positions 0, 1, 3 -> rows p+0, p+1, p+3 -> 0.4, 0.5, 0.7 s.
    starts = [t0 for t0, _ in ts_seqs[0]]
    assert starts == pytest.approx([0.4, 0.5, 0.7])
    # End of token at raw pos 1 is row p+2 (the special's row) = 0.6 s.
    assert ts_seqs[0][1][1] == pytest.approx(0.6)


def test_pipeline_beam_word_timestamps(tiny_pipeline):
    out = tiny_pipeline(
        _audio(2.0, seed=5), return_timestamps="word",
        generate_kwargs={"max_new_tokens": 6, "language": "en",
                         "num_beams": 3})
    assert isinstance(out["text"], str)
    for ch in out["chunks"]:
        s, e = ch["timestamp"]
        assert s is not None and (e is None or e >= s)


def test_auto_detect_language_path(tiny_pipeline):
    """language=None: detection mel is reused (no re-featurize), the
    detected code drives word segmentation, and output is well-formed."""
    pipe = ASRPipeline(tiny_pipeline.engine, tokenizer=MapTokenizer(),
                       chunk_length_s=3, language=None)
    calls = {"audio": 0, "features": 0}
    orig_audio = pipe.engine.transcribe_audio
    orig_feats = pipe.engine.transcribe_features

    def count_audio(*a, **k):
        calls["audio"] += 1
        return orig_audio(*a, **k)

    def count_feats(*a, **k):
        calls["features"] += 1
        return orig_feats(*a, **k)

    pipe.engine.transcribe_audio = count_audio
    pipe.engine.transcribe_features = count_feats
    try:
        out = pipe(_audio(2.0, seed=9), return_timestamps="word",
                   generate_kwargs={"max_new_tokens": 6})
    finally:
        pipe.engine.transcribe_audio = orig_audio
        pipe.engine.transcribe_features = orig_feats
    assert "text" in out and "chunks" in out
    # Detection path must reuse the mel: features entry point only.
    assert calls["features"] == 1 and calls["audio"] == 0


def test_auto_detect_batch_languages(tiny_pipeline):
    pipe = ASRPipeline(tiny_pipeline.engine, tokenizer=MapTokenizer(),
                       chunk_length_s=3, language=None)
    outs = pipe.transcribe_batch([_audio(1.0, seed=1), _audio(1.0, seed=2)],
                                 generate_kwargs={"max_new_tokens": 4})
    assert len(outs) == 2
    assert all("text" in o for o in outs)


def test_transcribe_batch_per_row_languages(tiny_pipeline):
    """Per-row forced languages build per-row prompts in ONE engine call
    (the multi-language coalescer path)."""
    from thewhisper_tpu.config import LANGUAGES

    outs = tiny_pipeline.transcribe_batch(
        [_audio(1.0, seed=1), _audio(1.0, seed=2), _audio(1.0, seed=3)],
        generate_kwargs={"max_new_tokens": 4},
        languages=[LANGUAGES[1], None, LANGUAGES[2]])
    assert len(outs) == 3
    assert all("text" in o and "chunks" in o for o in outs)
    # Rows with the same audio but different forced languages go through
    # different prompts — determinism per row still holds.
    again = tiny_pipeline.transcribe_batch(
        [_audio(1.0, seed=1)], generate_kwargs={"max_new_tokens": 4},
        languages=[LANGUAGES[1]])
    assert again[0]["text"] == outs[0]["text"]


def test_pipelined_dispatch_matches_sequential(tiny_pipeline):
    """The async-pipelined long-form path (PIPELINE_DEPTH windows in
    flight) must be a pure host-side reordering: output identical to
    sequential dispatch+fetch, including word timestamps."""
    import thewhisper_tpu.pipeline as pl

    audio = _audio(12.0, seed=7)  # >= 3 windows at 2 s chunks -> pipelined
    kw = {"max_new_tokens": 8, "language": "en"}
    old = pl.PIPELINE_DEPTH
    try:
        pl.PIPELINE_DEPTH = 0
        seq = tiny_pipeline(audio, return_timestamps="word",
                            generate_kwargs=dict(kw), chunk_length_s=2.0)
        pl.PIPELINE_DEPTH = 2
        pip = tiny_pipeline(audio, return_timestamps="word",
                            generate_kwargs=dict(kw), chunk_length_s=2.0)
    finally:
        pl.PIPELINE_DEPTH = old
    assert seq == pip


def test_windowed_path_uses_latency_bucket(tiny_pipeline):
    """Long-form call windows ride the configured sub-chunk bucket
    (exact-fit encode) and produce the same output as padding to the
    model chunk (position truncation is decode-invariant here)."""
    from thewhisper_tpu.pipeline import ASRPipeline

    eng = tiny_pipeline.engine
    tok = tiny_pipeline.tokenizer
    audio = _audio(8.0, seed=9)
    kw = {"max_new_tokens": 6, "language": "en"}
    pad = ASRPipeline(eng, tokenizer=tok, chunk_length_s=3)
    sub = ASRPipeline(eng, tokenizer=tok, chunk_length_s=3,
                      latency_buckets=[2.0])
    o_pad = pad(audio, chunk_length_s=2.0, generate_kwargs=dict(kw))
    o_sub = sub(audio, chunk_length_s=2.0, generate_kwargs=dict(kw))
    assert o_sub["text"] == o_pad["text"]
    # The sub-chunk pipeline actually compiled/used the 2 s featurizer.
    assert 2.0 in sub._featurizers


def test_transcribe_batch_mixed_forced_and_detected(tiny_pipeline):
    """A coalesced batch mixing a forced-language row with a None row
    under an auto-detect pipeline must DETECT the None row's language,
    not force English."""
    from thewhisper_tpu.config import LANGUAGES
    from thewhisper_tpu.pipeline import ASRPipeline

    pipe = ASRPipeline(tiny_pipeline.engine,
                       tokenizer=tiny_pipeline.tokenizer,
                       chunk_length_s=3, language=None)
    audios = [_audio(1.0, seed=1), _audio(1.0, seed=2)]
    forced = LANGUAGES[1]
    outs = pipe.transcribe_batch(
        audios, generate_kwargs={"max_new_tokens": 4, "language": None},
        languages=[forced, None])
    # Row 1's language is whatever detection produced (a valid code),
    # and it matches what pure auto-detection yields for that audio.
    auto = pipe.transcribe_batch(
        [audios[1]], generate_kwargs={"max_new_tokens": 4, "language": None})
    assert outs[1]["text"] == auto[0]["text"]


def test_pipelined_dispatch_beam_matches_sequential(tiny_pipeline):
    """Beam long-form (forced language, no fallback) also takes the
    pipelined branch — output must equal sequential dispatch."""
    import thewhisper_tpu.pipeline as pl

    audio = _audio(10.0, seed=11)
    kw = {"max_new_tokens": 6, "language": "en", "num_beams": 2}
    old = pl.PIPELINE_DEPTH
    try:
        pl.PIPELINE_DEPTH = 0
        seq = tiny_pipeline(audio, return_timestamps="word",
                            generate_kwargs=dict(kw), chunk_length_s=2.0)
        pl.PIPELINE_DEPTH = 2
        pip = tiny_pipeline(audio, return_timestamps="word",
                            generate_kwargs=dict(kw), chunk_length_s=2.0)
    finally:
        pl.PIPELINE_DEPTH = old
    assert seq == pip


def test_offset_window_path_matches_sequential(tiny_pipeline):
    """The offset-window fast path (slice inside the program, one
    dispatch per window) must produce output identical to the batched
    sequential path, including word timestamps and the short final
    window."""
    import thewhisper_tpu.pipeline as pl

    audio = _audio(11.3, seed=13)   # non-multiple -> short last window
    kw = {"max_new_tokens": 8, "language": "en"}
    old = pl.PIPELINE_DEPTH
    try:
        pl.PIPELINE_DEPTH = 0       # sequential batched path
        seq = tiny_pipeline(audio, return_timestamps="word",
                            generate_kwargs=dict(kw), chunk_length_s=2.0,
                            batch_size=1)
        pl.PIPELINE_DEPTH = 2       # offset-window path (bs=1, depth>0)
        off = tiny_pipeline(audio, return_timestamps="word",
                            generate_kwargs=dict(kw), chunk_length_s=2.0,
                            batch_size=1)
    finally:
        pl.PIPELINE_DEPTH = old
    assert seq == off


def test_batched_offset_window_path_matches_sequential(tiny_pipeline):
    """The BATCHED offset-window path (all slices of a window batch run
    inside one program — the large-batch long-form protocol) must match
    the sequential batched path, including the partial final group and
    word timestamps."""
    import thewhisper_tpu.pipeline as pl

    audio = _audio(13.1, seed=17)   # 7 windows at 2 s chunk -> 3+3+1
    kw = {"max_new_tokens": 8, "language": "en"}
    old = pl.PIPELINE_DEPTH
    try:
        pl.PIPELINE_DEPTH = 0       # sequential batched path
        seq = tiny_pipeline(audio, return_timestamps="word",
                            generate_kwargs=dict(kw), chunk_length_s=2.0,
                            batch_size=3)
        pl.PIPELINE_DEPTH = 2       # batched offset-window path
        off = tiny_pipeline(audio, return_timestamps="word",
                            generate_kwargs=dict(kw), chunk_length_s=2.0,
                            batch_size=3)
    finally:
        pl.PIPELINE_DEPTH = old
    assert seq == off


def test_window_scan_path_matches_sequential(tiny_pipeline):
    """The multi-window SCAN path (W windows per program, strictly
    sequential on device — the bs=1 long-form dispatch-amortization
    lever) must match the sequential batched path, including word
    timestamps, the short final window, and a partial final scan group."""
    import thewhisper_tpu.pipeline as pl

    audio = _audio(13.1, seed=19)   # 7 windows at 2 s chunk -> 3+3+1
    kw = {"max_new_tokens": 8, "language": "en"}
    old = pl.PIPELINE_DEPTH
    try:
        pl.PIPELINE_DEPTH = 0       # sequential batched path
        seq = tiny_pipeline(audio, return_timestamps="word",
                            generate_kwargs=dict(kw), chunk_length_s=2.0,
                            batch_size=1)
        pl.PIPELINE_DEPTH = 2       # scan path (bs=1, wpp>1)
        tiny_pipeline.windows_per_program = 3
        scan = tiny_pipeline(audio, return_timestamps="word",
                             generate_kwargs=dict(kw), chunk_length_s=2.0,
                             batch_size=1)
    finally:
        pl.PIPELINE_DEPTH = old
        tiny_pipeline.windows_per_program = 1
    assert seq == scan


def test_batch_scan_path_matches_sequential(tiny_pipeline):
    """The batched multi-window SCAN path (G full batches per program —
    the bs=32 long-form dispatch-amortization lever) must match the
    sequential batched path, including the short remainder group and
    word timestamps."""
    import thewhisper_tpu.pipeline as pl

    audio = _audio(14.9, seed=23)   # 8 windows at 2 s chunk -> 2x(2x3)+2
    kw = {"max_new_tokens": 8, "language": "en"}
    old = pl.PIPELINE_DEPTH
    try:
        pl.PIPELINE_DEPTH = 0       # sequential batched path
        seq = tiny_pipeline(audio, return_timestamps="word",
                            generate_kwargs=dict(kw), chunk_length_s=2.0,
                            batch_size=3)
        pl.PIPELINE_DEPTH = 2       # batch-scan path (bs>1, wpp>1)
        tiny_pipeline.windows_per_program = 2
        scan = tiny_pipeline(audio, return_timestamps="word",
                             generate_kwargs=dict(kw), chunk_length_s=2.0,
                             batch_size=3)
    finally:
        pl.PIPELINE_DEPTH = old
        tiny_pipeline.windows_per_program = 1
    assert seq == scan


def test_offset_tail_split_matches_sequential(tiny_pipeline):
    """A short tail group splits to the largest fitting batch buckets
    (4+2+1 for 7 windows at batch_size=4) instead of padding dead rows;
    output must match the sequential path exactly."""
    import thewhisper_tpu.pipeline as pl
    from thewhisper_tpu.pipeline import _tail_fit

    assert _tail_fit(7, 4, (1, 2, 4)) == 4
    assert _tail_fit(3, 4, (1, 2, 4)) == 2
    assert _tail_fit(1, 4, (1, 2, 4)) == 1
    assert _tail_fit(36, 64, (4, 32, 64)) == 32
    assert _tail_fit(3, 64, (64,)) == 3      # no smaller bucket: as-is

    audio = _audio(13.1, seed=29)   # 7 windows at 2 s chunk
    kw = {"max_new_tokens": 8, "language": "en"}
    old = pl.PIPELINE_DEPTH
    try:
        pl.PIPELINE_DEPTH = 0
        seq = tiny_pipeline(audio, return_timestamps="word",
                            generate_kwargs=dict(kw), chunk_length_s=2.0,
                            batch_size=4)
        pl.PIPELINE_DEPTH = 2
        off = tiny_pipeline(audio, return_timestamps="word",
                            generate_kwargs=dict(kw), chunk_length_s=2.0,
                            batch_size=4)
    finally:
        pl.PIPELINE_DEPTH = old
    assert seq == off


def test_first_window_fast_matches_and_reports_ttft(tiny_pipeline):
    """first_window_fast routes window 0 through the single-window
    program ahead of the batched groups (the batched long-form TTFT
    lever). Output must be IDENTICAL to the default batched offset path
    — same greedy tokens, same word timestamps, same LCS merge — on
    both the plain batched and the batch-scan dispatch, and the
    pipeline must report last_first_result_s + fire on_first_result
    with window 0's text."""
    import thewhisper_tpu.pipeline as pl

    audio = _audio(13.1, seed=31)   # 7 windows at 2 s chunk
    kw = {"max_new_tokens": 8, "language": "en"}
    old = pl.PIPELINE_DEPTH
    firsts = []
    try:
        pl.PIPELINE_DEPTH = 2
        base = tiny_pipeline(audio, return_timestamps="word",
                             generate_kwargs=dict(kw), chunk_length_s=2.0,
                             batch_size=3)
        assert tiny_pipeline.last_first_result_s is None   # opt-in: off
        tiny_pipeline.first_window_fast = True
        tiny_pipeline.on_first_result = firsts.append
        fast = tiny_pipeline(audio, return_timestamps="word",
                             generate_kwargs=dict(kw), chunk_length_s=2.0,
                             batch_size=3)
        assert fast == base
        assert tiny_pipeline.last_first_result_s is not None
        assert 0 < tiny_pipeline.last_first_result_s < 60
        assert len(firsts) == 1 and isinstance(firsts[0], str)
        # Batch-scan dispatch (bs>1, wpp>1) takes the same fast path.
        tiny_pipeline.windows_per_program = 2
        scan = tiny_pipeline(audio, return_timestamps="word",
                             generate_kwargs=dict(kw), chunk_length_s=2.0,
                             batch_size=3)
        assert scan == base
        assert len(firsts) == 2
    finally:
        pl.PIPELINE_DEPTH = old
        tiny_pipeline.first_window_fast = False
        tiny_pipeline.on_first_result = None
        tiny_pipeline.windows_per_program = 1

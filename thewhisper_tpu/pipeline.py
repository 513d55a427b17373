"""Offline ASR pipeline: long-form chunking, batched TPU decode, word merge.

API parity with the reference's ``ASRPipeline``
(``apple/asr_pipeline.py:16-64`` / ``nvidia/asr_pipeline.py:30-92``):
``pipeline(audio, return_timestamps="word", generate_kwargs=..., chunk_length_s=...)``
returns ``{"text": str, "chunks": [{"text", "timestamp": (start, end)}]}``.

Long-form behavior mirrors the HF chunked pipeline the reference rides
(SURVEY.md section 5 "Offline long-form"): windows of the call-time
``chunk_length_s`` (the examples pass ``model_chunk - 1``) with 1/6-stride
overlap on each side, merged by the timestamp-aware LCS
(``text.find_longest_common_sequence``).

TPU mapping: every window is padded to the engine's model chunk length
(10/15/20/30 s bucket) so all windows of a file hit one compiled executable;
windows are batched together into one device call.
"""

from __future__ import annotations

import dataclasses
import math
import time
import zlib
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from thewhisper_tpu.align import token_timestamps_from_alignment
from thewhisper_tpu.audio.features import LogMelFeaturizer
from thewhisper_tpu.audio.io import load_audio
from thewhisper_tpu.config import GenerationOptions, SAMPLE_RATE
from thewhisper_tpu.engine import WhisperEngine
from thewhisper_tpu.text import combine_tokens_into_words, find_longest_common_sequence

# How many window programs may be in flight ahead of the fetch on the
# pipelined path (see _decode_windows). 2 keeps the device saturated —
# one executing, one queued — while bounding result latency.
PIPELINE_DEPTH = 2


class ASRPipeline:
    """Offline transcription on the TPU engine.

    ``model`` is an HF checkpoint directory path or a ready
    :class:`WhisperEngine`. ``tokenizer`` is anything with
    ``decode(ids, skip_special_tokens=True) -> str`` (an HF WhisperTokenizer
    works as-is).
    """

    def __init__(
        self,
        model: Union[str, WhisperEngine],
        tokenizer: Any = None,
        model_size: Optional[str] = None,   # accepted for API parity ("S"/"XL")
        chunk_length_s: int = 30,
        language: str = "en",
        compute_dtype=None,
        position_mode: Optional[str] = None,
        batch_size: int = 8,
        use_pallas: Optional[bool] = None,
        latency_buckets: Optional[Sequence[float]] = None,
        device: Optional[str] = None,       # accepted for API parity; TPU-only
        draft: Optional[str] = None,        # speculative decoding (engine doc)
        reuse_previous_tokens: bool = False,
        pipeline_depth: Optional[int] = None,
        windows_per_program: int = 1,
        first_window_fast: bool = False,
    ):
        import jax.numpy as jnp

        if isinstance(model, WhisperEngine):
            self.engine = model
        else:
            dtype = compute_dtype or (jnp.bfloat16 if model_size != "XL32" else jnp.float32)
            # "S" = int8 end to end, like the reference's quantized
            # TensorRT engines (benchmark/README.md:91-93): weight-only
            # int8 decoder + int8 cross-KV + W8A8 encoder ("int8-all").
            # Promoted from opt-in in round 5 — W8A8 won every measured
            # protocol (bs=32 long-form 1076 vs 880 RTFx) and pipeline
            # transcripts match bf16 exactly on the synthetic checkpoint
            # (tests/test_pipeline.py::test_model_size_s_transcript_parity);
            # "S-legacy" keeps the weight-only decoder for one round of
            # comparability.
            quant = {"S": "int8-all", "S-legacy": "int8"}.get(model_size)
            self.engine = WhisperEngine.from_checkpoint(
                model, chunk_length_s=chunk_length_s, compute_dtype=dtype,
                position_mode=position_mode, quantize=quant,
                draft=draft)
            if tokenizer is None:
                tokenizer = _try_load_hf_tokenizer(model)
        self.tokenizer = tokenizer
        self.model_chunk_length_s = float(chunk_length_s)
        self.language = language
        self.batch_size = batch_size
        self._use_pallas = use_pallas
        # Opt-in sub-chunk featurization: short streaming buffers encode at
        # the smallest bucket that fits instead of padding to the full chunk
        # (the flexible-chunk fine-tunes accept truncated positions, SURVEY
        # section 5 "Flexible chunk models"; halving encoder positions
        # roughly halves encode latency). Default: single full-chunk bucket,
        # exact reference behavior.
        buckets = sorted(set(
            float(b) for b in (latency_buckets or [])
            if 0 < float(b) <= self.model_chunk_length_s))
        if self.model_chunk_length_s not in buckets:
            buckets.append(self.model_chunk_length_s)
        self.latency_buckets = buckets
        self._featurizers = {}
        self.featurizer = self._featurizer_for(self.model_chunk_length_s)
        # Cross-call speculative reuse (see _transcribe_with_fallback).
        self._reuse_previous = bool(reuse_previous_tokens)
        self._prev_gen_tokens: Optional[np.ndarray] = None
        # Windows dispatched ahead of the fetch on the long-form path
        # (None -> module default PIPELINE_DEPTH; 0 -> sequential).
        self.pipeline_depth = pipeline_depth
        # bs=1 long-form: group W consecutive windows into ONE scan
        # program (strictly sequential on device — still the bs=1
        # protocol; divides the ~14 ms/window dispatch+fetch tunnel cost
        # by W). 1 = one window per program (classic offset path).
        self.windows_per_program = max(1, int(windows_per_program))
        # Batched long-form TTFT: run window 0 through the dedicated
        # single-window program AHEAD of the batched groups, so the
        # first words of a long file surface after one bs=1 window
        # (~35 ms on v5e) instead of after the first full batch
        # (~0.6-0.75 s encoder-bound at bs=32x30 s). A static-batch
        # engine (the reference's TensorRT path,
        # benchmark/README.md:113-120, TTFT 0.306 s) cannot do this;
        # bucketed XLA programs make it one extra dispatch. Costs one
        # single-window program compile on first use; total wall is
        # within noise (the batch loses one window). Opt-in.
        self.first_window_fast = bool(first_window_fast)
        # Set after each __call__ that took the fast path: seconds from
        # call start to window 0's tokens being on host. on_first_result
        # (assign a callable) receives the decoded window-0 text then.
        self.last_first_result_s: Optional[float] = None
        self.on_first_result: Optional[Any] = None
        # Long-form file uploads are cached by host-array identity: the
        # axon tunnel leaks host RSS per device_put and its transfer
        # latency collapses as leaks accumulate (utils/devcache.py), so
        # re-transcribing the same buffer (bench reps, server retries,
        # A/B probes) must not re-upload ~40 MB per call.
        from thewhisper_tpu.utils.devcache import DevicePutCache

        self._dev_file_cache = DevicePutCache(max_entries=2)

    def _featurizer_for(self, bucket_s: float) -> LogMelFeaturizer:
        feat = self._featurizers.get(bucket_s)
        if feat is None:
            feat = LogMelFeaturizer(
                n_mels=self.engine.arch.n_mels, chunk_length_s=bucket_s,
                use_pallas=self._use_pallas)
            self._featurizers[bucket_s] = feat
        return feat

    def _pick_bucket(self, longest_s: float) -> float:
        for b in self.latency_buckets:
            if longest_s <= b:
                return b
        return self.model_chunk_length_s

    # -- token decode helper -------------------------------------------------

    def _decode(self, ids: Sequence[int]) -> str:
        if self.tokenizer is None:
            # Debug fallback: space-joined ids.
            return "".join(f" <{i}>" for i in ids)
        return self.tokenizer.decode(list(ids), skip_special_tokens=True)

    # -- windowing -----------------------------------------------------------

    @staticmethod
    def _window_offsets(n_samples: int, win: int, step: int) -> List[int]:
        if n_samples <= win:
            return [0]
        offsets = list(range(0, n_samples - win + step, step))
        # Drop a trailing window that would contain no new audio.
        return [o for o in offsets if o < n_samples]

    # -- main entry ----------------------------------------------------------

    def __call__(
        self,
        audio: Union[str, np.ndarray],
        return_timestamps: Union[bool, str] = False,
        generate_kwargs: Optional[Dict[str, Any]] = None,
        chunk_length_s: Optional[float] = None,
        batch_size: Optional[int] = None,
    ) -> Dict[str, Any]:
        self._call_t0 = time.perf_counter()
        self.last_first_result_s = None
        if isinstance(audio, str):
            audio = load_audio(audio, sr=SAMPLE_RATE)
        audio = np.asarray(audio, dtype=np.float32)
        if audio.ndim != 1:
            audio = audio.reshape(-1)
        # NOTE: when the input is already float32 1-D, np.asarray returns
        # the caller's object unchanged — an unconditional .reshape(-1)
        # minted a fresh view each call and defeated the identity-keyed
        # device-file cache below (every call re-uploaded the file).

        gk = dict(generate_kwargs or {})
        _MISSING = object()
        lang_kw = gk.pop("language", _MISSING)
        # generate_kwargs={"language": None} explicitly requests
        # auto-detection (HF convention) — `or` would silently force the
        # pipeline default instead.
        language = self.language if lang_kw is _MISSING else lang_kw
        max_new_tokens = int(gk.pop("max_new_tokens", 224))
        task = gk.pop("task", "transcribe")
        num_beams = int(gk.pop("num_beams", 1))
        fallback = _fallback_ladder(gk.pop("fallback_temperatures", None))
        # HF pipeline surface (reference nvidia/asr_pipeline.py:30-89
        # inherits it): "word" -> word chunks, True/"segment" -> segment
        # chunks. Segments are derived from the same DTW word alignment
        # (grouped at sentence punctuation / pauses), so the generated
        # TOKENS are identical across all three modes — unlike HF, which
        # re-decodes with timestamp tokens for segment mode.
        ts_mode = _timestamp_mode(return_timestamps)
        want_words = ts_mode is not None

        win_s = float(chunk_length_s or self.model_chunk_length_s)
        win_s = min(win_s, self.model_chunk_length_s)
        win = int(win_s * SAMPLE_RATE)
        stride = int(win_s / 6 * SAMPLE_RATE)
        step = max(1, win - 2 * stride)

        offsets = self._window_offsets(len(audio), win, step)
        bsz = batch_size or self.batch_size
        depth = (PIPELINE_DEPTH if self.pipeline_depth is None
                 else self.pipeline_depth)
        opts = GenerationOptions(
            max_new_tokens=max_new_tokens, language=language, task=task,
            return_timestamps=want_words, num_beams=num_beams,
        )
        # Sub-chunk latency buckets apply to the windowed path too: a
        # 9 s call window on a configured 9 s bucket encodes 450
        # positions instead of padding to the model chunk's 500
        # (flexible-chunk truncation, ~10% off every window's encode).
        bucket_s = self._pick_bucket(win_s)

        # Offset-window fast path (long-form): the file is device_put
        # ONCE — padded by a window of silence and bucketed to 60 s
        # multiples so different file lengths share compiled programs —
        # and every batch of windows is ONE dispatched program slicing
        # at traced offsets (engine.transcribe_windows_async; each
        # streamed tunnel command has fixed overhead, and at depth 2 the
        # command stream is the long-form bottleneck — at batch_size=32
        # the host-side slice+pad+stack ops alone cost ~2 commands per
        # window and capped RTFx at 387 vs 516+ for the in-program
        # slice). Greedy, forced language, no fallback; output identical
        # to the batched path (regression-tested).
        offset_mode = (
            len(offsets) >= 3 and depth > 0
            and fallback is None and language is not None
            and num_beams == 1 and not self._reuse_previous
            and hasattr(self.engine, "transcribe_windows_async"))
        if offset_mode:
            import jax

            seg = 60 * SAMPLE_RATE
            # Pad by the MODEL window (not the call window) so the padded
            # length — and therefore the cached device copy — is a pure
            # function of the file length: a second call with a different
            # chunk_length_s reuses the same device buffer (call windows
            # never exceed the model window, and slices never read past
            # len(audio) + win).
            win_model = int(self.model_chunk_length_s * SAMPLE_RATE)
            total = (len(audio) + win_model + seg - 1) // seg * seg

            def _upload(a, _total=total):
                padded = np.zeros(_total, np.float32)
                padded[: len(a)] = a
                return jax.device_put(padded)

            dev = self._dev_file_cache.put(audio, _upload)
            lens = [min(win, len(audio) - o) for o in offsets]
            bucket_samples = self._featurizer_for(bucket_s).n_samples
            seqs, ts_seqs, _, langs = self._decode_windows_offset(
                dev, offsets, lens, win, bucket_samples, opts, want_words,
                depth, bsz)
        else:
            if len(offsets) >= 3:
                # Long-form: ship the WHOLE file to the device ONCE and
                # slice windows there. Per-window host->device uploads
                # were the serial tax of the windowed path (a 10-min
                # file is ~38 MB; re-uploading each 9 s window costs
                # ~58 MB through the tunnel, serialized with compute).
                import jax

                dev = self._dev_file_cache.put(audio, jax.device_put)
                windows = [dev[o: o + win] for o in offsets]
            else:
                windows = [audio[o: o + win] for o in offsets]
            # Cross-call reuse only when the audio is one window (the
            # streaming rolling-buffer case); a multi-window file would
            # feed one window's tokens as the guess for another window.
            seqs, ts_seqs, _, langs = self._decode_windows(
                windows, offsets, opts, bsz, want_words, fallback=fallback,
                allow_reuse=(len(windows) == 1),
                bucket_s=bucket_s)

        if len(seqs) == 1:
            tokens, token_ts_list = seqs[0], (ts_seqs[0] if want_words else None)
        elif want_words:
            tokens, token_ts_list = find_longest_common_sequence(seqs, ts_seqs)
        else:
            tokens = find_longest_common_sequence(seqs)
            token_ts_list = None

        # Word segmentation must follow the (possibly detected) language —
        # CJK splits on unicode, not spaces. One file: majority vote over
        # the per-window detections.
        out_language = language
        if out_language is None and langs:
            out_language = max(set(langs), key=langs.count)
        return self._format_output(tokens, token_ts_list, out_language,
                                   ts_mode)

    def transcribe_batch(
        self,
        audios: Sequence[np.ndarray],
        return_timestamps: Union[bool, str] = "word",
        generate_kwargs: Optional[Dict[str, Any]] = None,
        languages: Optional[Sequence[Optional[str]]] = None,
    ) -> List[Dict[str, Any]]:
        """Transcribe N independent short buffers in ONE engine call.

        The multi-stream server path (SURVEY section 7, stage 7): each audio
        must fit a single window (it is truncated to the model chunk length
        otherwise). Returns one ``{"text", "chunks"}`` dict per input.

        ``languages``: optional per-row forced language codes (the
        multi-stream coalescer batches sessions with DIFFERENT languages
        into one decode; the engine builds per-row prompts). ``None``
        entries fall back to the generate_kwargs/pipeline language.
        """
        gk = dict(generate_kwargs or {})
        _MISSING = object()
        lang_kw = gk.pop("language", _MISSING)
        # generate_kwargs={"language": None} explicitly requests
        # auto-detection (HF convention) — `or` would silently force the
        # pipeline default instead.
        language = self.language if lang_kw is _MISSING else lang_kw
        max_new_tokens = int(gk.pop("max_new_tokens", 128))
        task = gk.pop("task", "transcribe")
        num_beams = int(gk.pop("num_beams", 1))
        fallback = _fallback_ladder(gk.pop("fallback_temperatures", None))
        ts_mode = _timestamp_mode(return_timestamps)
        want_words = ts_mode is not None
        win = int(self.model_chunk_length_s * SAMPLE_RATE)
        windows = [np.asarray(a, np.float32).reshape(-1)[:win] for a in audios]
        bucket_s = self._pick_bucket(
            max((len(w) for w in windows), default=0) / SAMPLE_RATE)
        row_languages = None
        if languages is not None and any(l for l in languages):
            # None entries fall back to the generate/pipeline language —
            # and when THAT is None (auto-detect mode), they are
            # detected, not silently forced to English: a coalesced
            # batch may mix forced-language sessions with auto ones.
            fill: List[Optional[str]] = [language] * len(windows)
            need = [i for i in range(len(windows))
                    if language is None
                    and not (i < len(languages) and languages[i])]
            if need:
                feat = self._featurizer_for(bucket_s)
                mel = feat(_pad_stack(windows, feat.n_samples))
                codes, _ = self.engine.detect_language(mel)
                for i in need:
                    fill[i] = str(codes[i])
            row_languages = [
                languages[i] if i < len(languages) and languages[i]
                else (fill[i] or "en")
                for i in range(len(windows))]
        opts = GenerationOptions(
            max_new_tokens=max_new_tokens, language=language, task=task,
            return_timestamps=want_words, num_beams=num_beams,
        )
        seqs, ts_seqs, lp_seqs, langs = self._decode_windows(
            windows, [0] * len(windows), opts, len(windows), want_words,
            bucket_s=bucket_s, with_logprobs=True, fallback=fallback,
            allow_reuse=True, row_languages=row_languages)
        return [
            self._format_output(
                seqs[i], ts_seqs[i] if want_words else None,
                (row_languages[i] if row_languages
                 else language if language is not None else langs[i]),
                ts_mode, token_logprobs=lp_seqs[i])
            for i in range(len(windows))
        ]

    # -- shared internals ----------------------------------------------------

    def _decode_windows(self, windows, offsets, opts, bsz, want_words,
                        bucket_s: Optional[float] = None,
                        with_logprobs: bool = False,
                        fallback: Optional[Sequence[float]] = None,
                        allow_reuse: bool = False,
                        row_languages: Optional[Sequence[str]] = None):
        """Run windows through the engine -> per-window (ids, (start,end)).

        Returns (seqs, ts_seqs, lp_seqs, langs): ``langs`` is the per-window
        language code — detected when ``opts.language is None``, else the
        forced one (word segmentation is language-dependent; CJK tokens
        split on unicode, not spaces).
        """
        featurizer = (self.featurizer if bucket_s is None
                      else self._featurizer_for(bucket_s))
        seqs: List[List[int]] = []
        ts_seqs: List[List[Tuple[Optional[float], Optional[float]]]] = []
        lp_seqs: List[List[float]] = []
        langs: List[Optional[str]] = []

        def consume(res, batch, start, languages):
            self._consume_result(
                res, [len(w) for w in batch], start, offsets, opts,
                want_words, with_logprobs, languages,
                seqs, ts_seqs, lp_seqs, langs)

        # Pipelined dispatch (round-2 review #1: the bs=1 long-form
        # frontier): with a forced language, no fallback ladder and no
        # cross-call token reuse, batch k's results are not needed to
        # build batch k+1's inputs — so up to PIPELINE_DEPTH programs are
        # dispatched ahead of the fetch. The device executes them back to
        # back with no host gap; each result's tunnel RTT and host
        # postprocessing (alignment DTW, token filtering) overlap the
        # NEXT window's device time. Greedy output is unchanged — this
        # reorders host work only.
        depth = (PIPELINE_DEPTH if self.pipeline_depth is None
                 else self.pipeline_depth)
        pipelined = (fallback is None and row_languages is None
                     and opts.language is not None
                     and not (self._reuse_previous and allow_reuse)
                     and hasattr(self.engine, "transcribe_audio_async"))
        pending: List[Tuple[Any, list, int]] = []
        for start in range(0, len(windows), bsz):
            batch = windows[start: start + bsz]
            # Fused device program: featurization runs inside the same XLA
            # executable as encode+decode (one device call per batch).
            audio = _pad_stack(batch, featurizer.n_samples)
            languages = None
            if row_languages is not None:
                # Per-row forced languages (multi-language coalesced
                # batch): the engine builds per-row prompts, no detection.
                languages = list(row_languages[start: start + len(batch)])
                res = self._transcribe_with_fallback(
                    audio, opts, fallback, languages=languages,
                    allow_reuse=allow_reuse)
            elif opts.language is None:
                # Auto-detect per sample (the reference rides HF generate's
                # detection when no language is forced). The mel computed
                # for detection is REUSED for the transcription call —
                # featurizing once and keeping it on device (no host round
                # trip, no re-featurize in the fused audio program).
                mel = featurizer(audio)
                codes, _ = self.engine.detect_language(mel)
                languages = [str(c) for c in codes]
                res = self._transcribe_with_fallback(
                    audio, opts, fallback, languages=languages, mel=mel,
                    allow_reuse=allow_reuse)
            elif pipelined:
                handle = self.engine.transcribe_audio_async(
                    audio, opts, use_pallas=self._use_pallas)
                pending.append((handle, batch, start))
                if len(pending) > depth:
                    h, b_, s_ = pending.pop(0)
                    consume(h.result(), b_, s_, None)
                continue
            else:
                res = self._transcribe_with_fallback(
                    audio, opts, fallback, allow_reuse=allow_reuse)
            consume(res, batch, start, languages)
        for h, b_, s_ in pending:
            consume(h.result(), b_, s_, None)
        return seqs, ts_seqs, lp_seqs, langs

    def _consume_result(self, res, lens, start, offsets, opts, want_words,
                        with_logprobs, languages,
                        seqs, ts_seqs, lp_seqs, langs):
        """Unpack one EngineResult batch into the per-window accumulators
        (shared by the batched and offset-window dispatch paths).
        ``lens``: true (unpadded) sample counts per row."""
        nb = len(lens)
        langs.extend((languages or [opts.language] * nb)[:nb])
        p = res.prompt_len
        if want_words:
            # Alignment rows populated per sample: prompt + generated - 1.
            num_rows = p + np.maximum(res.num_generated, 1) - 1
            token_ts = token_timestamps_from_alignment(
                res.align, num_rows,
                num_frames=np.asarray([ln // 160 for ln in lens]),
                median_filter_width=self.engine.arch.median_filter_width,
            )
        for bi in range(nb):
            n = int(res.num_generated[bi])
            raw = res.tokens[bi, p: p + n].tolist()
            keep = [j for j, t in enumerate(raw)
                    if t < self.engine.special.eot]
            ids = [raw[j] for j in keep]
            seqs.append(ids)
            if with_logprobs:
                if res.token_logprobs is not None:
                    lp_seqs.append(
                        [float(res.token_logprobs[bi, j]) for j in keep])
                else:
                    lp_seqs.append([0.0] * len(ids))
            if want_words:
                # Index alignment rows by RAW generated position (j), not
                # by rank in the special-token-filtered list: a special
                # token dropped mid-sequence must not shift later rows.
                offset_s = offsets[start + bi] / SAMPLE_RATE
                ts: List[Tuple[Optional[float], Optional[float]]] = []
                for j in keep:
                    t0 = float(token_ts[bi, p + j]) + offset_s
                    if p + j + 1 < p + n:
                        t1 = float(token_ts[bi, p + j + 1]) + offset_s
                    else:
                        t1 = None
                    ts.append((t0, t1))
                ts_seqs.append(ts)

    def _decode_windows_offset(self, dev_audio, offsets, lens, win,
                               bucket_samples, opts, want_words, depth,
                               bsz: int = 1):
        """Offset-window long-form dispatch: the file lives on device
        once, each batch of ``bsz`` windows is ONE dispatched program
        (the slices run inside the executable —
        engine.transcribe_windows_async). Same pipelined fetch overlap
        as the batched path; greedy only."""
        seqs: List[List[int]] = []
        ts_seqs: List[List[Tuple[Optional[float], Optional[float]]]] = []
        lp_seqs: List[List[float]] = []
        langs: List[Optional[str]] = []
        pending: List[Tuple[Any, int, int]] = []

        # First-window fast path (batched long-form TTFT, see __init__):
        # window 0 dispatches on the single-window program BEFORE the
        # batched groups, so it finishes first on the in-order device
        # queue; consume_first blocks on it right after group 1 is
        # queued (the device is never idle) and must run before any
        # batch drain so seqs stays in window order. Output tokens are
        # identical to the batched path (greedy; regression-tested).
        first_h = None
        if (bsz > 1 and self.first_window_fast and len(offsets) > 1
                and hasattr(self.engine, "transcribe_window_async")):
            first_h = self.engine.transcribe_window_async(
                dev_audio, int(offsets[0]), win, bucket_samples, opts,
                use_pallas=self._use_pallas)
            first_off, first_len = offsets[0], lens[0]
            offsets, lens = offsets[1:], lens[1:]

        def consume_first():
            nonlocal first_h
            if first_h is None:
                return
            h, first_h = first_h, None
            self._consume_result(h.result(), [first_len], 0, [first_off],
                                 opts, want_words, False, None,
                                 seqs, ts_seqs, lp_seqs, langs)
            self.last_first_result_s = time.perf_counter() - self._call_t0
            if self.on_first_result is not None:
                self.on_first_result(self._decode(seqs[0]))

        def drain_one():
            consume_first()
            h, s_, n_ = pending.pop(0)
            self._consume_result(h.result(), lens[s_: s_ + n_], s_, offsets,
                                 opts, want_words, False, None,
                                 seqs, ts_seqs, lp_seqs, langs)

        wpp = self.windows_per_program
        spec_engine = (getattr(self.engine, "spec_ngram", False)
                       or getattr(self.engine, "draft_arch", None)
                       is not None)
        scan_ok = (bsz == 1 and wpp > 1 and not spec_engine
                   and hasattr(self.engine, "transcribe_window_scan_async"))
        # Large-batch analog: G full bs-sized groups per SCAN program
        # (removes the dispatch/fetch/host gaps between consecutive
        # batched programs — the round-3 bs=32 long-form frontier).
        batch_scan_ok = (bsz > 1 and wpp > 1 and not spec_engine
                         and hasattr(self.engine,
                                     "transcribe_batch_scan_async"))
        buckets = getattr(self.engine, "batch_buckets", (bsz,))
        if batch_scan_ok:
            n_full = (len(offsets) // bsz) * bsz
            start = 0
            while start < len(offsets):
                g = (n_full - start) // bsz if start < n_full else 0
                g = min(wpp, g)
                if g >= 2:
                    group = [int(o) for o in offsets[start: start + g * bsz]]
                    handle = self.engine.transcribe_batch_scan_async(
                        dev_audio, group, g, bsz, win, bucket_samples,
                        opts, use_pallas=self._use_pallas)
                else:
                    # Single (or remainder, possibly short) group: the
                    # plain batched program — no scan twin to compile.
                    # Short tails split to the largest fitting bucket
                    # (a 36-window tail at bsz=64 must not pad 28 rows).
                    n = _tail_fit(len(offsets) - start, bsz, buckets)
                    group = [int(o) for o in offsets[start: start + n]]
                    handle = self.engine.transcribe_windows_async(
                        dev_audio, group, win, bucket_samples, opts,
                        use_pallas=self._use_pallas)
                pending.append((handle, start, len(group)))
                consume_first()   # group 1 is queued; block on window 0
                if len(pending) > depth:
                    drain_one()
                start += len(group)
            while pending:
                drain_one()
            return seqs, ts_seqs, lp_seqs, langs
        group_n = wpp if scan_ok else bsz
        start = 0
        while start < len(offsets):
            n = (group_n if scan_ok
                 else _tail_fit(len(offsets) - start, group_n, buckets))
            group = [int(o) for o in offsets[start: start + n]]
            if scan_ok:
                # bs=1 with W windows per SCAN program: device math is
                # unchanged (strictly sequential, batch 1); dispatch and
                # fetch costs divide by W.
                handle = self.engine.transcribe_window_scan_async(
                    dev_audio, group, wpp, win, bucket_samples, opts,
                    use_pallas=self._use_pallas)
            elif len(group) == 1:
                # Keep the dedicated single-window program (the bs=1
                # protocol path) rather than compiling a vmapped twin.
                handle = self.engine.transcribe_window_async(
                    dev_audio, group[0], win, bucket_samples, opts,
                    use_pallas=self._use_pallas)
            else:
                handle = self.engine.transcribe_windows_async(
                    dev_audio, group, win, bucket_samples, opts,
                    use_pallas=self._use_pallas)
            pending.append((handle, start, len(group)))
            consume_first()   # group 1 is queued; block on window 0
            if len(pending) > depth:
                drain_one()
            start += len(group)
        while pending:
            drain_one()
        return seqs, ts_seqs, lp_seqs, langs

    # -- temperature fallback ladder (opt-in) --------------------------------

    def _transcribe_with_fallback(self, audio, opts, temperatures,
                                  languages=None, mel=None,
                                  allow_reuse: bool = False):
        """openai-whisper style quality gating: windows whose output is
        repetitive (zlib compression ratio > 2.4) or low-confidence (mean
        token logprob < -1.0) are re-decoded by sampling at the next
        temperature in the ladder. Off unless ``fallback_temperatures`` is
        passed in generate_kwargs.

        ``mel``: device-resident features already computed for this audio
        (the language-detection path) — reused instead of re-featurizing.
        """
        # Cross-call speculative reuse (opt-in, streaming path only): each
        # tick re-transcribes a rolling buffer that changed by ~0.5 s, so
        # the previous call's tokens predict almost every token — they
        # ride as proposal drafts (engine/speculative.py) and the decode
        # collapses to a few verify passes. Greedy output is unchanged.
        # ``allow_reuse`` gates this to transcribe_batch (the streaming
        # backend's entry): offline windowed calls would feed one window's
        # tokens as a guess for a DIFFERENT window — pure verify misses.
        reuse = self._reuse_previous and allow_reuse
        draft = None
        if (reuse and opts.num_beams == 1 and not opts.temperature
                and self._prev_gen_tokens is not None
                and self._prev_gen_tokens.shape[0] == audio.shape[0]):
            draft = self._prev_gen_tokens
        if mel is not None:
            res = self.engine.transcribe_features(
                mel, opts, languages=languages, draft_tokens=draft)
        else:
            res = self.engine.transcribe_audio(
                audio, opts, use_pallas=self._use_pallas, languages=languages,
                draft_tokens=draft)
        if reuse:
            self._prev_gen_tokens = np.asarray(
                res.tokens[:, res.prompt_len:], np.int32)
        # The sampling ladder is greedy-only: with beams the engine forces
        # temperature back to 0, so every "retry" would be the identical
        # beam decode — wasted full decodes per failed window.
        if not temperatures or opts.num_beams != 1:
            return res
        for step, t in enumerate(t for t in temperatures if t > 0.0):
            failed = [i for i in range(audio.shape[0])
                      if self._window_fails(res, i)]
            if not failed:
                break
            retry_opts = dataclasses.replace(
                opts, temperature=float(t), seed=opts.seed + step + 1)
            sub = self.engine.transcribe_audio(
                audio[failed], retry_opts, use_pallas=self._use_pallas,
                languages=([languages[i] for i in failed]
                           if languages else None))
            res = _merge_result_rows(res, sub, failed)
        return res

    def _window_fails(self, res, i: int) -> bool:
        n = int(res.num_generated[i])
        if n <= 0:
            return False
        avg_lp = float(res.sum_logprob[i]) / n
        if avg_lp < -1.0:
            return True
        ids = [int(t) for t in res.tokens[i, res.prompt_len: res.prompt_len + n]
               if int(t) < self.engine.special.eot]
        text = self._decode(ids).encode("utf-8")
        if len(text) < 16:
            return False
        return len(text) / len(zlib.compress(text)) > 2.4

    def _format_output(self, tokens, token_ts_list, language, ts_mode,
                       token_logprobs: Optional[List[float]] = None):
        out: Dict[str, Any] = {"text": self._decode(tokens)}
        if ts_mode is not None:
            # text.NO_SPACE_LANGUAGES accepts raw codes ("zh", "ja", ...)
            # directly — no code->name mapping to keep in sync.
            words, _, indices = combine_tokens_into_words(
                self._decode, tokens, language=language,
                special_id=self.engine.special.eot,
            )
            chunks = []
            for w, idx in zip(words, indices):
                start_t = token_ts_list[idx[0]][0]
                end_t = token_ts_list[idx[-1]][1]
                chunk: Dict[str, Any] = {"text": w, "timestamp": (start_t, end_t)}
                if token_logprobs is not None:
                    lps = [token_logprobs[j] for j in idx
                           if j < len(token_logprobs)]
                    if lps:
                        chunk["confidence"] = float(np.exp(np.mean(lps)))
                chunks.append(chunk)
            if ts_mode == "segment":
                chunks = _group_words_into_segments(chunks)
            out["chunks"] = chunks
        return out


def _tail_fit(remaining: int, bsz: int, buckets) -> int:
    """Group size for the next dispatch: full ``bsz`` while it fits; a
    short tail takes the LARGEST compiled batch bucket that fits instead
    of padding to ``bsz`` (a 36-window tail at bsz=64 padded 28 dead rows
    of encoder+decode — measured 658 vs 872 RTFx on the bs=64 long-form
    protocol before this split)."""
    if remaining >= bsz:
        return bsz
    fit = [b for b in buckets if b <= remaining and b < bsz]
    return max(fit) if fit else remaining


# Segment boundaries: break after sentence-final punctuation, or at an
# inter-word silence longer than this (the reference's streaming
# truncation policy uses the same punctuation-then-pause preference,
# streaming_pipeline.py:885-937).
_SEGMENT_PAUSE_S = 1.0
_SENTENCE_FINAL = (".", "!", "?", "。", "！", "？", "؟")


def _timestamp_mode(return_timestamps) -> Optional[str]:
    """Normalize the HF ``return_timestamps`` surface.

    ``"word"`` -> word chunks; ``True`` / ``"segment"`` -> segment chunks
    (the default HF pipeline mode the reference's NVIDIA path inherits,
    ``nvidia/asr_pipeline.py:30-89``); falsy -> text only.
    """
    if return_timestamps == "word":
        return "word"
    if return_timestamps is True or return_timestamps == "segment":
        return "segment"
    if return_timestamps:
        raise ValueError(
            f"return_timestamps={return_timestamps!r}: expected False, "
            "True, 'word' or 'segment'")
    return None


def _group_words_into_segments(words: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
    """Group word chunks into HF-style segment chunks.

    A segment closes after a word ending in sentence-final punctuation or
    before a > ``_SEGMENT_PAUSE_S`` inter-word silence; its timestamp spans
    (first word start, last word end). Confidence (when present) is the
    mean of the member words' confidences.
    """
    segments: List[Dict[str, Any]] = []
    cur: List[Dict[str, Any]] = []

    def flush():
        if not cur:
            return
        start = cur[0]["timestamp"][0]
        end = cur[-1]["timestamp"][1]
        seg: Dict[str, Any] = {
            "text": "".join(w["text"] for w in cur),
            "timestamp": (start, end),
        }
        confs = [w["confidence"] for w in cur if "confidence" in w]
        if confs:
            seg["confidence"] = float(np.mean(confs))
        segments.append(seg)
        cur.clear()

    prev_end: Optional[float] = None
    for w in words:
        start_t = w["timestamp"][0]
        if (cur and prev_end is not None and start_t is not None
                and start_t - prev_end > _SEGMENT_PAUSE_S):
            flush()
        cur.append(w)
        if w["timestamp"][1] is not None:
            prev_end = w["timestamp"][1]
        if w["text"].rstrip().endswith(_SENTENCE_FINAL):
            flush()
    flush()
    return segments


def _fallback_ladder(value) -> Optional[Tuple[float, ...]]:
    """Normalize the generate_kwargs["fallback_temperatures"] option.

    ``True`` selects the openai-whisper default ladder; a sequence is used
    as-is; falsy disables the ladder (the reference protocol: plain greedy).
    """
    if not value:
        return None
    if value is True:
        return (0.0, 0.2, 0.4, 0.6, 0.8, 1.0)
    return tuple(float(t) for t in value)


def _merge_result_rows(base, sub, idx: Sequence[int]):
    """Overwrite rows ``idx`` of an EngineResult with a retry's rows."""
    def put(a, b):
        if a is None or b is None:
            return a
        a = np.array(a)
        a[list(idx)] = b[: len(idx)]
        return a

    return base._replace(
        tokens=put(base.tokens, sub.tokens),
        num_generated=put(base.num_generated, sub.num_generated),
        sum_logprob=put(base.sum_logprob, sub.sum_logprob),
        align=put(base.align, sub.align),
        token_logprobs=put(base.token_logprobs, sub.token_logprobs),
        no_speech_prob=put(base.no_speech_prob, sub.no_speech_prob),
    )


def _pad_stack(windows: Sequence[np.ndarray], win: int) -> np.ndarray:
    import jax

    if any(isinstance(w, jax.Array) for w in windows):
        # Device-resident windows (the pipelined long-form path slices
        # them from one up-front device_put of the whole file): pad and
        # stack ON DEVICE — tiny async XLA ops, no host round trip.
        import jax.numpy as jnp

        rows = [jnp.pad(w, (0, win - w.shape[0]))
                if w.shape[0] != win else w for w in windows]
        return jnp.stack(rows) if len(rows) > 1 else rows[0][None]
    out = np.zeros((len(windows), win), dtype=np.float32)
    for i, w in enumerate(windows):
        # A window longer than the bucket is an upstream bucketing bug —
        # fail loudly rather than silently dropping audio.
        out[i, : len(w)] = w
    return out


def _try_load_hf_tokenizer(path: str):
    try:
        from transformers import WhisperTokenizer, WhisperTokenizerFast
        import os

        if os.path.exists(os.path.join(path, "tokenizer.json")):
            return WhisperTokenizerFast.from_pretrained(path)
        if os.path.exists(os.path.join(path, "vocab.json")):
            return WhisperTokenizer.from_pretrained(path)
    except Exception:
        pass
    return None

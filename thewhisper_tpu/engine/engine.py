"""WhisperEngine: bucketed, jitted end-to-end transcription executor.

The TPU analog of the reference's binary engines (CoreML ``.mlmodelc`` /
TensorRT ``elastic_models``, SURVEY.md section 2.5): one XLA executable per
(batch bucket, chunk length, max_new_tokens, timestamps) combination — the
"flexi-static" bucketed-static-cache design — with features -> encoder ->
cross-KV -> prefill -> while-loop decode fused into a single device program.
"""

from __future__ import annotations

import dataclasses
import functools
import threading
import time
from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from thewhisper_tpu.config import (
    GenerationOptions,
    LANGUAGES,
    SpecialTokens,
    WhisperArch,
)
from thewhisper_tpu.engine.decode import (
    BeamResult,
    GreedyResult,
    beam_decode,
    greedy_decode,
    suppress_mask,
)
from thewhisper_tpu.models.whisper import (
    compute_cross_kv,
    decoder_prefill,
    encoder_forward,
    make_cache,
)

# Batch sizes we compile for; requests are padded up to the nearest bucket.
DEFAULT_BATCH_BUCKETS = (1, 2, 4, 8, 16, 32, 64)


class EngineResult(NamedTuple):
    """Host-side result of a transcription call (already unpadded)."""

    tokens: np.ndarray         # (B, P+max_new) int32
    num_generated: np.ndarray  # (B,)
    prompt_len: int
    sum_logprob: np.ndarray    # (B,)
    align: Optional[np.ndarray]  # (B, A, P+max_new, T_enc) or None
    decode_time_s: float
    token_logprobs: Optional[np.ndarray] = None  # (B, max_new) greedy + beam
    no_speech_prob: Optional[np.ndarray] = None  # (B,) greedy + beam
    spec_rounds: Optional[int] = None  # verify rounds executed (speculative)


class PendingResult:
    """In-flight transcription: the program is dispatched (device arrays
    are futures), nothing is fetched yet.

    The windowed offline pipeline's double-buffering lever (round-2
    review #1): dispatch window N+1's program while window N still
    executes — on one chip the programs run back to back with no host
    gap, and the host-side fetch (one tunnel RTT each) overlaps the next
    window's device time. ``result()`` blocks and unpacks."""

    def __init__(self, engine, raw, b, prompt_len, options, t0):
        self._engine = engine
        self._raw = raw
        self._b = b
        self._p = prompt_len
        self._options = options
        self._t0 = t0

    def result(self) -> EngineResult:
        return self._engine._unpack(self._raw, self._b, self._p,
                                    self._options, self._t0)


def _bucket_batch(b: int, buckets: Sequence[int]) -> int:
    for cand in buckets:
        if b <= cand:
            return cand
    return b


def _pad_batch(x, bb: int):
    """Zero-pad the batch dim to bucket size ``bb`` without leaving the
    device: a device-resident input round-tripped through numpy would pay
    the tunnel RTT (~25 ms) it was device-put to avoid — this hit every
    final short chunk of the windowed pipeline's language-detect path."""
    if isinstance(x, jax.Array):
        return jnp.concatenate(
            [x, jnp.zeros((bb - x.shape[0], *x.shape[1:]), x.dtype)], axis=0)
    x = np.asarray(x, np.float32)
    return np.concatenate(
        [x, np.zeros((bb - x.shape[0], *x.shape[1:]), np.float32)], axis=0)


class WhisperEngine:
    """Jitted Whisper inference with static shape buckets.

    Parameters live on device once; every public call routes through a
    cached compiled executable keyed by static shapes.
    """

    def __init__(
        self,
        params: Dict[str, Any],
        arch: WhisperArch,
        special: Optional[SpecialTokens] = None,
        compute_dtype: jnp.dtype = jnp.float32,
        suppress_tokens: Sequence[int] = (),
        begin_suppress_tokens: Sequence[int] = (),
        batch_buckets: Sequence[int] = DEFAULT_BATCH_BUCKETS,
        cache_dtype: Optional[jnp.dtype] = None,
        cross_kv_int8: bool = False,
        draft_params: Optional[Dict[str, Any]] = None,
        draft_arch: Optional[WhisperArch] = None,
        spec_window: int = 4,
        spec_ngram: bool = False,
        draft_int8: bool = False,
        mesh: Optional[Any] = None,
        megakernel: bool = True,
    ):
        """``draft_params``/``draft_arch`` enable speculative greedy
        decoding (engine/speculative.py): the draft decoder proposes
        ``spec_window`` tokens per round and the target verifies them in
        one pass — output identical to plain greedy, only faster where the
        draft agrees often. The draft shares this engine's encoder (its
        cross-KV is computed from the same encoder states with the draft's
        own projections, the distil-whisper deployment shape). Applies to
        greedy calls only (``num_beams == 1``, ``temperature == 0``).
        ``spec_ngram=True`` speculates via prompt-lookup drafting
        instead of a model (no extra weights). Honest cost model
        (tools/spec_ab_probe.py, device round counts + interleaved
        timing): a lookup round costs ~1.0x a plain step (0.80-1.18
        across runs), so the crossover is ~1 token/round — worst case
        ~0.9x plain at zero acceptance, 3.4-4.6x measured on repetitive
        output, ~1.0-1.5x projected on natural English
        (tokenizer-dependent).

        ``mesh``: a ``(dp, tp)`` ``jax.sharding.Mesh`` for multi-chip
        serving. Pass params already placed with
        ``parallel.shard_params`` (TP over heads/ffn); batched inputs
        (mel/audio/prompt rows) are then dp-sharded on entry when the
        batch bucket divides the dp axis, and GSPMD propagates the
        shardings through the whole generate program (encoder, KV cache,
        decode loop, alignment capture)."""
        self.arch = arch
        self.special = special or SpecialTokens.for_vocab(arch.vocab_size)
        self.compute_dtype = compute_dtype
        self.cache_dtype = cache_dtype or compute_dtype
        self.batch_buckets = tuple(batch_buckets)
        self.cross_kv_int8 = cross_kv_int8
        if draft_params is not None:
            # Speculation only ever touches the draft's decoder (the
            # target's encoder states are shared) — don't ship a distil
            # checkpoint's encoder weights to HBM.
            draft_params = {"decoder": draft_params["decoder"]}
            if draft_int8:
                # Draft steps dominate the speculative round on deep
                # targets (W+1 shallow-decoder passes per round); an
                # int8-S draft steps ~30-40% faster (the same weight-only
                # win as the target's S path) at negligible acceptance
                # cost — the draft is already an approximation of the
                # target. Opt-in: tools/lv3_spec_e2e_probe.py / bench.py
                # measure the acceptance/latency trade.
                from thewhisper_tpu.models.quant import quantize_params

                draft_params = quantize_params(
                    draft_params, components=("decoder",))
            if mesh is None:
                from thewhisper_tpu.models.whisper import (
                    fuse_self_qkv_params,
                )

                draft_params = fuse_self_qkv_params(draft_params)
        self.draft_params = (jax.device_put(draft_params)
                             if draft_params is not None else None)
        self.draft_arch = draft_arch
        self.spec_window = spec_window
        self.spec_ngram = bool(spec_ngram)
        if spec_ngram and draft_arch is not None:
            raise ValueError("pick one: a draft model or ngram drafting")
        if (draft_params is None) != (draft_arch is None):
            raise ValueError("draft_params and draft_arch go together")
        if draft_arch is not None and draft_arch.vocab_size != arch.vocab_size:
            raise ValueError("draft vocab must match the target vocab")
        if draft_arch is not None and draft_arch.d_model != arch.d_model:
            raise ValueError(
                "draft d_model must match the target (the draft's cross-KV "
                "is computed from the shared encoder's states)")
        self.mesh = mesh
        # With a mesh, params must arrive pre-placed (shard_params) —
        # a blanket device_put would yank them back to one device.
        # Single-chip engines pre-fuse each decoder layer's self q/k/v
        # into one (in, 3d) GEMV (models.whisper.fuse_self_qkv_params:
        # +4.5% on the kernel-overhead-bound large-v3 step,
        # tools/qkv_fuse_probe.py); the fused out axis mixes q/k/v
        # channels, which the TP pspecs don't describe, so meshed
        # engines keep the separate leaves.
        if mesh is None:
            from thewhisper_tpu.models.whisper import fuse_self_qkv_params

            params = fuse_self_qkv_params(params)
            if megakernel:
                # int8-S decoders additionally get the bs=1 decode
                # megakernel's aux leaves (ops/mega_step.py); greedy
                # (and the speculative verify) route through the
                # single-kernel step when the batch bucket is 1 and the
                # cross-KV is int8. No-op for non-quantized or un-fused
                # params, and skipped where the kernel doesn't pay
                # (shallow decoders run the fully-unrolled XLA step at
                # the HBM floor) or can't run (the kernel REQUIRES int8
                # cross-KV — packing for a float-cross engine would ship
                # a dead ~67 MB transposed-embedding copy to HBM,
                # VERDICT r4 weak #1).
                from thewhisper_tpu.ops.mega_step import (
                    mega_pays,
                    pack_mega_params,
                )

                if cross_kv_int8 and mega_pays(arch):
                    params = pack_mega_params(params, arch)
        self.params = params if mesh is not None else jax.device_put(params)
        self._suppress = (
            jnp.asarray(suppress_mask(arch.vocab_size, suppress_tokens))
            if len(suppress_tokens) else None)
        self._begin_suppress = (
            jnp.asarray(suppress_mask(arch.vocab_size, begin_suppress_tokens))
            if len(begin_suppress_tokens) else None)
        self._jit_cache: Dict[Tuple, Any] = {}
        self._prompt_device_cache: Dict[Tuple, Any] = {}
        self._seed_device_cache: Dict[int, Any] = {}
        # Large host inputs (bs=32 mels are ~50 MB, bs=32 audio ~60 MB)
        # are cached by object identity: the axon tunnel leaks host RSS
        # on every device_put and its transfer latency collapses as
        # leaked buffers accumulate (utils/devcache.py docstring), so a
        # benchmark or server loop re-placing the same buffer must not
        # re-upload it.
        from thewhisper_tpu.utils.devcache import (
            DeltaDevicePutCache,
            DevicePutCache,
        )

        self._devput_cache = DevicePutCache()
        # Streaming-tick audio ((1, N) f32, ~640 KB) sits below the
        # identity cache's gate AND is a fresh numpy object every tick,
        # yet is byte-identical to the previous tick except the newly
        # appended ~0.5 s. The delta cache uploads only the changed
        # suffix and splices it on device (~12 ms/tick saved on the
        # tunnel — tools/stream_stage_probe.py, VERDICT r4 #2).
        self._delta_devput_cache = DeltaDevicePutCache()
        self._lock = threading.Lock()
        # Persistent XLA compile cache: generate-program compiles take
        # minutes cold; warm restarts reload them in seconds. Opt out with
        # WHISPER_PERSISTENT_CACHE=0.
        import os

        if os.environ.get("WHISPER_PERSISTENT_CACHE", "1") != "0":
            try:
                from thewhisper_tpu.utils.profiling import (
                    enable_compilation_cache,
                )

                enable_compilation_cache()
            except Exception:
                pass
        # Wall-clock accumulator, parity with the reference's
        # ``total_time_worked`` (apple/model.py:59,80-89).
        self.total_time_worked = 0.0

    # -- prompt construction -------------------------------------------------

    def build_prompt(self, language: Optional[str], task: str = "transcribe") -> list:
        sp = self.special
        lang = language or "en"
        lang_id = sp.language_id(lang, LANGUAGES[: sp.n_languages])
        task_id = sp.transcribe if task == "transcribe" else sp.translate
        return [sp.sot, lang_id, task_id, sp.no_timestamps]

    def _prompt_rows(self, options: GenerationOptions, bb: int,
                     languages: Optional[Sequence[str]]) -> np.ndarray:
        """(bb, P) int32 prompt rows; per-sample languages override
        ``options.language`` row-wise (auto-detection support)."""
        base = np.asarray(
            self.build_prompt(options.language, options.task), np.int32)
        rows = np.tile(base, (bb, 1))
        # `languages` may be a numpy array (detect_language's return) —
        # no bare truthiness, it raises on arrays of length > 1.
        if languages is not None and len(languages):
            for i, lang in enumerate(list(languages)[:bb]):
                rows[i] = self.build_prompt(str(lang), options.task)
        return rows

    # -- compiled program ----------------------------------------------------

    def _program_body(self, batch: int, prompt_len: int, max_new: int,
                      timestamps: bool, num_beams: int, temperature: float,
                      proposals: bool = False):
        """The mel -> decode-result device program (shared by the
        mel-input and fused audio-input entry points).

        ``proposals=True`` compiles the proposal-token speculative path:
        the ``draft`` argument then carries a (B, max_new) int32 guess of
        the generated tokens (e.g. the previous streaming tick's output)
        instead of draft-model params."""
        arch = self.arch
        compute_dtype = self.compute_dtype
        cache_dtype = self.cache_dtype
        eot = self.special.eot
        suppress = self._suppress
        begin_suppress = self._begin_suppress

        cross_kv_int8 = self.cross_kv_int8
        draft_arch = self.draft_arch
        spec_ngram = self.spec_ngram
        greedy_call = num_beams == 1 and temperature == 0.0
        spec = greedy_call and (
            draft_arch is not None or spec_ngram or proposals)
        spec_window = self.spec_window

        def program(params, mel, prompt, seed, draft=None):
            enc = encoder_forward(params, mel, arch, compute_dtype)
            ck, cv = compute_cross_kv(params, enc, arch)
            if cross_kv_int8:
                from thewhisper_tpu.models.quant import quantize_kv

                ck, cv = quantize_kv(ck), quantize_kv(cv)
            if num_beams > 1:
                # Tile cross KV per beam; self cache rows are B*K.
                rep = lambda t: jax.tree.map(
                    lambda x: jnp.repeat(x, num_beams, axis=1), t)
                ck_b, cv_b = rep(ck), rep(cv)
                if not cross_kv_int8:
                    ck_b = ck_b.astype(cache_dtype)
                    cv_b = cv_b.astype(cache_dtype)
                cache = make_cache(
                    arch, batch * num_beams, prompt_len + max_new,
                    ck_b, cv_b, dtype=cache_dtype)
                res = beam_decode(
                    params, arch, prompt, cache, num_beams, max_new, eot,
                    suppress=suppress, begin_suppress=begin_suppress,
                    compute_dtype=compute_dtype,
                    capture_alignment=timestamps,
                    no_speech_id=self.special.no_speech)
            elif spec:
                from thewhisper_tpu.engine.speculative import (
                    speculative_decode,
                )

                if not cross_kv_int8:
                    ck = ck.astype(cache_dtype)
                    cv = cv.astype(cache_dtype)
                s_cap = prompt_len + max_new + spec_window + 1
                cache = make_cache(arch, batch, s_cap, ck, cv,
                                   dtype=cache_dtype)
                if proposals or spec_ngram:
                    d_cache = d_params = d_arch = None
                else:
                    # Draft cross-KV: same encoder states, the draft
                    # decoder's own projections (distil-whisper sharing).
                    d_params, d_arch = draft, draft_arch
                    dck, dcv = compute_cross_kv(draft, enc, draft_arch)
                    d_cache = make_cache(
                        draft_arch, batch, s_cap, dck.astype(cache_dtype),
                        dcv.astype(cache_dtype), dtype=cache_dtype)
                res = speculative_decode(
                    params, arch, d_params, d_arch, prompt, cache, d_cache,
                    max_new, eot, spec_window=spec_window,
                    suppress=suppress, begin_suppress=begin_suppress,
                    capture_alignment=timestamps,
                    compute_dtype=compute_dtype,
                    no_speech_id=self.special.no_speech,
                    ngram_draft=spec_ngram and not proposals,
                    proposal_tokens=draft if proposals else None)
            else:
                if not cross_kv_int8:
                    ck = ck.astype(cache_dtype)
                    cv = cv.astype(cache_dtype)
                cache = make_cache(
                    arch, batch, prompt_len + max_new, ck, cv,
                    dtype=cache_dtype)
                res = greedy_decode(
                    params, arch, prompt, cache, max_new, eot,
                    suppress=suppress, begin_suppress=begin_suppress,
                    capture_alignment=timestamps, compute_dtype=compute_dtype,
                    no_speech_id=self.special.no_speech,
                    temperature=temperature, rng_seed=seed)
            if timestamps:
                # Ship the alignment buffer at compute precision: halves
                # the device->host transfer in bf16 mode (the reference's
                # fp16 attention is no more precise; DTW runs in f32 after
                # z-norm on host).
                res = res._replace(align=res.align.astype(compute_dtype))
            return res

        return program

    def _generate_fn(self, batch: int, t_mel: int, prompt_len: int,
                     max_new: int, timestamps: bool, num_beams: int = 1,
                     temperature: float = 0.0, proposals: bool = False):
        key = (batch, t_mel, prompt_len, max_new, timestamps, num_beams,
               temperature, proposals)
        with self._lock:
            fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        fn = jax.jit(self._program_body(
            batch, prompt_len, max_new, timestamps, num_beams, temperature,
            proposals))
        with self._lock:
            self._jit_cache[key] = fn
        return fn

    def _featurize_in_program(self, use_pallas: Optional[bool]):
        """Resolve the in-program featurizer shared by the fused audio
        entry points: returns (resolved_use_pallas, featurize_fn) where
        featurize_fn maps a (B, n_samples) audio block to log-mel inside
        the jitted program."""
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"

        from thewhisper_tpu.audio.features import (
            hann_window,
            log_mel_spectrogram,
            mel_filter_bank,
        )

        mel_fb = jnp.asarray(mel_filter_bank(num_mel_filters=self.arch.n_mels))
        window = jnp.asarray(hann_window())

        def featurize(audio):
            if use_pallas:
                from thewhisper_tpu.ops.logmel_pallas import log_mel_pallas

                return log_mel_pallas(audio, mel_fb, window)
            return log_mel_spectrogram(audio, mel_fb, window)

        return use_pallas, featurize

    def _generate_from_audio_fn(self, batch: int, n_samples: int,
                                prompt_len: int, max_new: int,
                                timestamps: bool, num_beams: int = 1,
                                temperature: float = 0.0,
                                use_pallas: Optional[bool] = None,
                                proposals: bool = False):
        """Fused program: raw audio -> log-mel -> encode -> decode.

        One device call per transcription instead of two (featurize +
        generate): on tunneled TPUs this removes a host round trip AND the
        mel's double crossing of the link (device->host->device, ~1 MB for
        a 10 s window)."""
        use_pallas, featurize = self._featurize_in_program(use_pallas)
        key = ("audio", batch, n_samples, prompt_len, max_new, timestamps,
               num_beams, temperature, use_pallas, proposals)
        with self._lock:
            fn = self._jit_cache.get(key)
        if fn is not None:
            return fn

        body = self._program_body(
            batch, prompt_len, max_new, timestamps, num_beams, temperature,
            proposals)

        def program(params, audio, prompt, seed, draft=None):
            return body(params, featurize(audio), prompt, seed, draft)

        fn = jax.jit(program)
        with self._lock:
            self._jit_cache[key] = fn
        return fn

    def _generate_from_window_fn(self, n_total: int, win_samples: int,
                                 bucket_samples: int, prompt_len: int,
                                 max_new: int, timestamps: bool,
                                 use_pallas: Optional[bool] = None):
        """Offset-window fused program: the WINDOW SLICE runs inside the
        executable (``dynamic_slice`` at a traced scalar offset), so one
        long-form window costs ONE dispatched program instead of three
        (slice + pad/reshape + generate) — on the tunneled chip every
        streamed command has fixed overhead, and at PIPELINE_DEPTH=2 the
        command stream is the bottleneck. The caller device_puts the
        whole padded file once; ``n_total`` is bucketed upstream so
        different file lengths reuse the compiled program.

        bs=1, greedy-only (the single-stream long-form shape). A window
        shorter than the featurizer bucket is zero-padded INSIDE the
        program (never sliced long: that would leak the next window's
        audio where silence belongs)."""
        use_pallas, featurize = self._featurize_in_program(use_pallas)
        key = ("audio_win", n_total, win_samples, bucket_samples,
               prompt_len, max_new, timestamps, use_pallas)
        with self._lock:
            fn = self._jit_cache.get(key)
        if fn is not None:
            return fn

        body = self._program_body(1, prompt_len, max_new, timestamps,
                                  num_beams=1, temperature=0.0)

        def program(params, audio_full, off, prompt, seed, draft=None):
            win = jax.lax.dynamic_slice(audio_full, (off,), (win_samples,))
            if bucket_samples != win_samples:
                win = jnp.pad(win, (0, bucket_samples - win_samples))
            return body(params, featurize(win[None]), prompt, seed, draft)

        fn = jax.jit(program)
        with self._lock:
            self._jit_cache[key] = fn
        return fn

    def transcribe_window_async(
        self,
        full_audio,                        # (N,) device-resident, pre-padded
        offset: int,
        win_samples: int,
        bucket_samples: int,
        options: GenerationOptions,
        languages: Optional[Sequence[str]] = None,
        use_pallas: Optional[bool] = None,
    ) -> "PendingResult":
        """Dispatch one long-form window by OFFSET into a device-resident
        file (see :meth:`_generate_from_window_fn`); greedy bs=1."""
        if options.num_beams != 1 or options.temperature:
            raise ValueError(
                "transcribe_window_async is greedy-only (num_beams=1, "
                "temperature=0); use transcribe_audio for beam/sampled "
                "decoding")
        prompt_arr = self._device_prompt(options, 1, languages)
        p = prompt_arr.shape[1]
        fn = self._generate_from_window_fn(
            full_audio.shape[0], win_samples, bucket_samples, p,
            options.max_new_tokens, options.return_timestamps,
            use_pallas=use_pallas)
        t0 = time.perf_counter()
        result = fn(self.params, full_audio, np.int32(offset), prompt_arr,
                    self._device_seed(options.seed), self.draft_params)
        return PendingResult(self, result, 1, p, options, t0)

    def _generate_from_windows_fn(self, n_total: int, batch: int,
                                  win_samples: int, bucket_samples: int,
                                  prompt_len: int, max_new: int,
                                  timestamps: bool,
                                  use_pallas: Optional[bool] = None):
        """Batched offset-window program: ALL window slices of one batch
        run inside the executable (vmapped ``dynamic_slice`` at traced
        offsets -> featurize -> batched generate). The host-side
        alternative — per-window slice + pad + stack device ops — costs
        ~2 streamed tunnel commands per window, which dominated the
        large-batch long-form wall (measured 387 RTFx vs the reference
        L40S's 516.9 before this program existed)."""
        use_pallas, featurize = self._featurize_in_program(use_pallas)
        key = ("audio_wins", n_total, batch, win_samples, bucket_samples,
               prompt_len, max_new, timestamps, use_pallas)
        with self._lock:
            fn = self._jit_cache.get(key)
        if fn is not None:
            return fn

        body = self._program_body(batch, prompt_len, max_new, timestamps,
                                  num_beams=1, temperature=0.0)

        def slice_one(audio_full, off):
            win = jax.lax.dynamic_slice(audio_full, (off,), (win_samples,))
            if bucket_samples != win_samples:
                # Pad INSIDE the program — never slice long (that would
                # leak the next window's audio where silence belongs).
                win = jnp.pad(win, (0, bucket_samples - win_samples))
            return win

        def program(params, audio_full, offs, prompt, seed, draft=None):
            wins = jax.vmap(slice_one, in_axes=(None, 0))(audio_full, offs)
            return body(params, featurize(wins), prompt, seed, draft)

        fn = jax.jit(program)
        with self._lock:
            self._jit_cache[key] = fn
        return fn

    def _generate_from_window_scan_fn(self, n_total: int, n_windows: int,
                                      win_samples: int, bucket_samples: int,
                                      prompt_len: int, max_new: int,
                                      timestamps: bool,
                                      use_pallas: Optional[bool] = None):
        """Multi-window SCAN program: ``n_windows`` consecutive long-form
        windows processed strictly sequentially inside one executable
        (``lax.scan`` over traced offsets; batch stays 1 throughout —
        same device math as one-window-per-program, so this remains the
        bs=1 protocol). Rationale: at depth-2 pipelining the bs=1
        long-form wall carries ~14 ms/window of dispatch + fetch RTT the
        device never sees; grouping W windows per program divides that
        by W. Results come back stacked (W, ...) like a batch."""
        use_pallas, featurize = self._featurize_in_program(use_pallas)
        key = ("audio_winscan", n_total, n_windows, win_samples,
               bucket_samples, prompt_len, max_new, timestamps, use_pallas)
        with self._lock:
            fn = self._jit_cache.get(key)
        if fn is not None:
            return fn

        body = self._program_body(1, prompt_len, max_new, timestamps,
                                  num_beams=1, temperature=0.0)

        def program(params, audio_full, offs, prompt, seed, draft=None):
            def one(carry, off):
                win = jax.lax.dynamic_slice(
                    audio_full, (off,), (win_samples,))
                if bucket_samples != win_samples:
                    win = jnp.pad(win, (0, bucket_samples - win_samples))
                res = body(params, featurize(win[None]), prompt, seed,
                           draft)
                return carry, res

            _, stacked = jax.lax.scan(one, 0, offs)
            # Every result leaf is (W, 1, ...) — drop the bs=1 axis so
            # the host unpacks it exactly like a W-row batch.
            return jax.tree.map(lambda x: x[:, 0], stacked)

        fn = jax.jit(program)
        with self._lock:
            self._jit_cache[key] = fn
        return fn

    def transcribe_window_scan_async(
        self,
        full_audio,                        # (N,) device-resident, pre-padded
        offsets: Sequence[int],
        n_windows: int,
        win_samples: int,
        bucket_samples: int,
        options: GenerationOptions,
        languages: Optional[Sequence[str]] = None,
        use_pallas: Optional[bool] = None,
    ) -> "PendingResult":
        """Dispatch up to ``n_windows`` long-form windows as ONE scan
        program (see :meth:`_generate_from_window_scan_fn`); plain greedy
        bs=1 only. Short groups pad by repeating the last offset (rows
        dropped at unpack)."""
        if options.num_beams != 1 or options.temperature:
            raise ValueError("transcribe_window_scan_async is greedy-only")
        if self.spec_ngram or self.draft_arch is not None:
            # Speculative bodies return per-call scalars (round counts)
            # that do not stack like batch rows; use the per-window path.
            raise ValueError(
                "transcribe_window_scan_async does not support "
                "speculative engines; dispatch per window instead")
        b = len(offsets)
        if not 1 <= b <= n_windows:
            raise ValueError(f"got {b} offsets for a {n_windows}-window "
                             "scan program")
        offs = np.asarray(
            list(offsets) + [offsets[-1]] * (n_windows - b), np.int32)
        prompt_arr = self._device_prompt(options, 1, languages)
        p = prompt_arr.shape[1]
        fn = self._generate_from_window_scan_fn(
            full_audio.shape[0], n_windows, win_samples, bucket_samples, p,
            options.max_new_tokens, options.return_timestamps,
            use_pallas=use_pallas)
        t0 = time.perf_counter()
        result = fn(self.params, full_audio, offs, prompt_arr,
                    self._device_seed(options.seed), self.draft_params)
        return PendingResult(self, result, b, p, options, t0)

    def _generate_from_batch_scan_fn(self, n_total: int, n_groups: int,
                                     batch: int, win_samples: int,
                                     bucket_samples: int, prompt_len: int,
                                     max_new: int, timestamps: bool,
                                     use_pallas: Optional[bool] = None):
        """Batched multi-window SCAN program: ``n_groups`` consecutive
        batches of ``batch`` windows each run strictly sequentially inside
        ONE executable (``lax.scan`` over a (G, B) offset grid; every scan
        iteration is exactly the batched offset-window program). The
        large-batch long-form analog of the bs=1 scan
        (:meth:`_generate_from_window_scan_fn`): at 100 windows/file the
        batched path paid dispatch + fetch + host-unpack gaps between its
        3 bs=32 programs — grouping them into one scan removes the
        inter-group device idle entirely (round-3 review #2: 874 RTFx
        measured vs a ~1200 device ceiling). Results come back stacked
        (G, B, ...) and are flattened to (G*B, ...) rows."""
        use_pallas, featurize = self._featurize_in_program(use_pallas)
        key = ("audio_batch_scan", n_total, n_groups, batch, win_samples,
               bucket_samples, prompt_len, max_new, timestamps, use_pallas)
        with self._lock:
            fn = self._jit_cache.get(key)
        if fn is not None:
            return fn

        body = self._program_body(batch, prompt_len, max_new, timestamps,
                                  num_beams=1, temperature=0.0)

        def slice_one(audio_full, off):
            win = jax.lax.dynamic_slice(audio_full, (off,), (win_samples,))
            if bucket_samples != win_samples:
                win = jnp.pad(win, (0, bucket_samples - win_samples))
            return win

        def program(params, audio_full, offs, prompt, seed, draft=None):
            def one(carry, offs_g):             # offs_g: (B,)
                wins = jax.vmap(slice_one, in_axes=(None, 0))(
                    audio_full, offs_g)
                res = body(params, featurize(wins), prompt, seed, draft)
                return carry, res

            _, stacked = jax.lax.scan(one, 0, offs)   # offs: (G, B)
            # Leaves are (G, B, ...) — flatten to (G*B, ...) batch rows.
            return jax.tree.map(
                lambda x: x.reshape(x.shape[0] * x.shape[1], *x.shape[2:]),
                stacked)

        fn = jax.jit(program)
        with self._lock:
            self._jit_cache[key] = fn
        return fn

    def transcribe_batch_scan_async(
        self,
        full_audio,                        # (N,) device-resident, pre-padded
        offsets: Sequence[int],            # flattened, len == n_groups*batch
        n_groups: int,
        batch: int,
        win_samples: int,
        bucket_samples: int,
        options: GenerationOptions,
        languages: Optional[Sequence[str]] = None,
        use_pallas: Optional[bool] = None,
    ) -> "PendingResult":
        """Dispatch ``n_groups`` full batches of ``batch`` long-form
        windows as ONE scan program (see
        :meth:`_generate_from_batch_scan_fn`); plain greedy only. Every
        group must be full — remainders take the per-group paths."""
        if options.num_beams != 1 or options.temperature:
            raise ValueError("transcribe_batch_scan_async is greedy-only")
        if self.spec_ngram or self.draft_arch is not None:
            raise ValueError(
                "transcribe_batch_scan_async does not support speculative "
                "engines; dispatch per group instead")
        if len(offsets) != n_groups * batch:
            raise ValueError(
                f"got {len(offsets)} offsets for a {n_groups}x{batch} "
                "batch-scan program (groups must be full)")
        offs = np.asarray(offsets, np.int32).reshape(n_groups, batch)
        prompt_arr = self._device_prompt(options, batch, languages)
        p = prompt_arr.shape[1]
        fn = self._generate_from_batch_scan_fn(
            full_audio.shape[0], n_groups, batch, win_samples,
            bucket_samples, p, options.max_new_tokens,
            options.return_timestamps, use_pallas=use_pallas)
        t0 = time.perf_counter()
        result = fn(self.params, full_audio, offs, prompt_arr,
                    self._device_seed(options.seed), self.draft_params)
        return PendingResult(self, result, n_groups * batch, p, options, t0)

    def transcribe_windows_async(
        self,
        full_audio,                        # (N,) device-resident, pre-padded
        offsets: Sequence[int],
        win_samples: int,
        bucket_samples: int,
        options: GenerationOptions,
        languages: Optional[Sequence[str]] = None,
        use_pallas: Optional[bool] = None,
    ) -> "PendingResult":
        """Dispatch a BATCH of long-form windows by offset into one
        device-resident file (see :meth:`_generate_from_windows_fn`);
        greedy only. The batch is padded to the engine's batch bucket by
        repeating the last offset (valid audio — the rows are dropped at
        unpack)."""
        if options.num_beams != 1 or options.temperature:
            raise ValueError(
                "transcribe_windows_async is greedy-only (num_beams=1, "
                "temperature=0); use transcribe_audio for beam/sampled "
                "decoding")
        b = len(offsets)
        bb = _bucket_batch(b, self.batch_buckets)
        offs = np.asarray(
            list(offsets) + [offsets[-1]] * (bb - b), np.int32)
        prompt_arr = self._device_prompt(options, bb, languages)
        p = prompt_arr.shape[1]
        fn = self._generate_from_windows_fn(
            full_audio.shape[0], bb, win_samples, bucket_samples, p,
            options.max_new_tokens, options.return_timestamps,
            use_pallas=use_pallas)
        t0 = time.perf_counter()
        result = fn(self.params, full_audio, offs, prompt_arr,
                    self._device_seed(options.seed), self.draft_params)
        return PendingResult(self, result, b, p, options, t0)

    def _detect_language_fn(self, batch: int, t_mel: int):
        key = ("detect", batch, t_mel)
        with self._lock:
            fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        arch = self.arch
        compute_dtype = self.compute_dtype
        sp = self.special

        def program(params, mel):
            enc = encoder_forward(params, mel, arch, compute_dtype)
            ck, cv = compute_cross_kv(params, enc, arch)
            cache = make_cache(arch, batch, 4, ck, cv, dtype=compute_dtype)
            sot = jnp.full((batch, 1), sp.sot, jnp.int32)
            logits, _, _ = decoder_prefill(
                params, sot, cache, arch, compute_dtype)
            lang_logits = jax.lax.dynamic_slice_in_dim(
                logits[:, -1], sp.first_language, sp.n_languages, axis=-1)
            return jax.nn.softmax(lang_logits, axis=-1)

        fn = jax.jit(program)
        with self._lock:
            self._jit_cache[key] = fn
        return fn

    # -- public API ----------------------------------------------------------

    def _place(self, x):
        """dp-shard a batched input over the mesh (no-op without one).

        Replicates when the batch does not divide the dp axis (bs=1 on a
        dp>1 mesh); GSPMD still TP-shards the compute via the params.
        Large host arrays route through the identity-keyed transfer
        cache (see ``__init__``)."""
        if isinstance(x, np.ndarray):
            if x.nbytes < self._devput_cache.min_bytes:
                return self._delta_devput_cache.put(x, self._transfer)
            return self._devput_cache.put(x, self._transfer)
        return self._transfer(x)

    def _transfer(self, x):
        if self.mesh is None:
            return jnp.asarray(x)
        from jax.sharding import NamedSharding, PartitionSpec

        x = jnp.asarray(x)
        dp = self.mesh.shape.get("dp", 1)
        spec = (PartitionSpec("dp", *([None] * (x.ndim - 1)))
                if dp > 1 and x.shape[0] % dp == 0 else PartitionSpec())
        return jax.device_put(x, NamedSharding(self.mesh, spec))

    def _device_prompt(self, options: GenerationOptions, bb: int,
                       languages) -> jnp.ndarray:
        """Device-resident prompt rows, cached per (bucket, languages).

        The prompt is identical for every call with the same language
        config, but ``jnp.asarray`` re-uploads it each time — on the
        tunneled chip that is one more serialized host->device op per
        window of the pipelined long-form path. Bounded cache (detected
        per-sample language tuples can be diverse)."""
        langs_t = (tuple(str(l) for l in list(languages)[:bb])
                   if languages is not None and len(languages) else None)
        key = (bb, options.language, options.task, langs_t)
        with self._lock:
            cached = self._prompt_device_cache.get(key)
        if cached is not None:
            return cached
        arr = self._place(jnp.asarray(self._prompt_rows(
            options, bb, languages)))
        with self._lock:
            if len(self._prompt_device_cache) >= 512:
                self._prompt_device_cache.clear()
            self._prompt_device_cache[key] = arr
        return arr

    def _device_seed(self, seed: int) -> jnp.ndarray:
        with self._lock:
            cached = self._seed_device_cache.get(seed)
        if cached is None:
            cached = jnp.uint32(seed)
            with self._lock:
                if len(self._seed_device_cache) >= 64:
                    self._seed_device_cache.clear()
                self._seed_device_cache[seed] = cached
        return cached

    def _prep_proposals(self, draft_tokens, bb: int, max_new: int):
        """Normalize caller-supplied proposal tokens to (bb, max_new)."""
        if draft_tokens is None:
            return None
        dt = np.asarray(draft_tokens, np.int32)
        if dt.ndim == 1:
            dt = dt[None]
        arr = np.zeros((bb, max_new), np.int32)
        b = min(dt.shape[0], bb)
        l = min(dt.shape[1], max_new)
        arr[:b, :l] = dt[:b, :l]
        return jnp.asarray(arr)

    def transcribe_features_async(
        self,
        mel: np.ndarray,
        options: GenerationOptions,
        languages: Optional[Sequence[str]] = None,
        draft_tokens: Optional[np.ndarray] = None,
    ) -> PendingResult:
        """Dispatch without fetching — see :class:`PendingResult`."""
        return self._transcribe_features(mel, options, languages,
                                         draft_tokens, sync=False)

    def transcribe_features(
        self,
        mel: np.ndarray,                    # (B, n_mels, T_mel)
        options: GenerationOptions,
        languages: Optional[Sequence[str]] = None,   # per-sample override
        draft_tokens: Optional[np.ndarray] = None,   # speculative proposals
    ) -> EngineResult:
        return self._transcribe_features(mel, options, languages,
                                         draft_tokens, sync=True)

    def _transcribe_features(self, mel, options, languages, draft_tokens,
                             sync: bool):
        if not isinstance(mel, jax.Array):
            mel = np.asarray(mel, dtype=np.float32)
        if mel.ndim == 2:
            mel = mel[None]
        b = mel.shape[0]
        bb = _bucket_batch(b, self.batch_buckets)
        if bb != b:
            mel = _pad_batch(mel, bb)

        prompt_arr = self._device_prompt(options, bb, languages)
        p = prompt_arr.shape[1]

        temperature = (float(options.temperature)
                       if options.num_beams == 1 else 0.0)
        if options.num_beams != 1 or temperature:
            # Speculation is greedy-only; dropping the proposals here
            # (rather than in the program) avoids compiling a duplicate
            # beam/sampling executable under a proposals=True cache key.
            draft_tokens = None
        props = self._prep_proposals(draft_tokens, bb,
                                     options.max_new_tokens)
        fn = self._generate_fn(
            bb, mel.shape[-1], p, options.max_new_tokens,
            options.return_timestamps, num_beams=options.num_beams,
            temperature=temperature, proposals=props is not None)
        t0 = time.perf_counter()
        result = fn(self.params, self._place(mel), prompt_arr,
                    self._device_seed(options.seed),
                    props if props is not None else self.draft_params)
        if not sync:
            return PendingResult(self, result, b, p, options, t0)
        return self._unpack(result, b, p, options, t0)

    def transcribe_audio_async(
        self,
        audio: np.ndarray,
        options: GenerationOptions,
        use_pallas: Optional[bool] = None,
        languages: Optional[Sequence[str]] = None,
        draft_tokens: Optional[np.ndarray] = None,
    ) -> PendingResult:
        """Dispatch without fetching — see :class:`PendingResult`."""
        return self._transcribe_audio(audio, options, use_pallas, languages,
                                      draft_tokens, sync=False)

    def transcribe_audio(
        self,
        audio: np.ndarray,                  # (B, n_samples) float32, padded
        options: GenerationOptions,
        use_pallas: Optional[bool] = None,
        languages: Optional[Sequence[str]] = None,   # per-sample override
        draft_tokens: Optional[np.ndarray] = None,   # speculative proposals
    ) -> EngineResult:
        """Fused raw-audio transcription (featurize on device, one call).

        ``audio`` must already be padded to the chunk bucket
        (``n_samples % 160 == 0``). Numerically identical to
        ``transcribe_features(featurizer(audio), options)``.
        ``draft_tokens``: expected generated tokens (e.g. the previous
        streaming tick's output) — decoded speculatively against them,
        output still exactly greedy."""
        return self._transcribe_audio(audio, options, use_pallas, languages,
                                      draft_tokens, sync=True)

    def _transcribe_audio(self, audio, options, use_pallas, languages,
                          draft_tokens, sync: bool):
        if not isinstance(audio, jax.Array):
            audio = np.asarray(audio, dtype=np.float32)
        if audio.ndim == 1:
            audio = audio[None]
        b = audio.shape[0]
        bb = _bucket_batch(b, self.batch_buckets)
        if bb != b:
            audio = _pad_batch(audio, bb)

        prompt_arr = self._device_prompt(options, bb, languages)
        p = prompt_arr.shape[1]
        temperature = (float(options.temperature)
                       if options.num_beams == 1 else 0.0)
        if options.num_beams != 1 or temperature:
            draft_tokens = None      # greedy-only (see transcribe_features)
        props = self._prep_proposals(draft_tokens, bb,
                                     options.max_new_tokens)
        fn = self._generate_from_audio_fn(
            bb, audio.shape[-1], p, options.max_new_tokens,
            options.return_timestamps, num_beams=options.num_beams,
            temperature=temperature, use_pallas=use_pallas,
            proposals=props is not None)
        t0 = time.perf_counter()
        result = fn(self.params, self._place(audio), prompt_arr,
                    self._device_seed(options.seed),
                    props if props is not None else self.draft_params)
        if not sync:
            return PendingResult(self, result, b, p, options, t0)
        return self._unpack(result, b, p, options, t0)

    def _unpack(self, result, b: int, prompt_len: int,
                options: GenerationOptions, t0: float) -> EngineResult:
        # ONE batched device->host fetch (device_get prefetches every leaf
        # async before gathering). Sequential np.asarray calls each paid a
        # tunnel round trip — 5-6 RTTs per transcription on remote TPUs.
        fetch = [result.tokens, result.num_generated, result.sum_logprob,
                 result.token_logprobs, result.no_speech_prob]
        if options.return_timestamps:
            fetch.append(result.align)
        rounds = getattr(result, "rounds", None)
        if rounds is not None:
            fetch.append(rounds)
        host = jax.device_get(fetch)
        dt = time.perf_counter() - t0
        self.total_time_worked += dt
        align = (np.asarray(host[5], dtype=np.float32)
                 if options.return_timestamps else None)
        return EngineResult(
            tokens=np.asarray(host[0])[:b],
            num_generated=np.asarray(host[1])[:b],
            prompt_len=prompt_len,
            sum_logprob=np.asarray(host[2])[:b],
            align=align[:b] if align is not None else None,
            decode_time_s=dt,
            token_logprobs=np.asarray(host[3])[:b],
            no_speech_prob=np.asarray(host[4])[:b],
            spec_rounds=(int(host[-1]) if rounds is not None else None),
        )

    def detect_language(self, mel: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Detect spoken language from features.

        Runs one forced decoder step from ``<|startoftranscript|>`` and
        softmaxes over the language-token block (the standard Whisper
        detect_language; the reference always passes language explicitly).
        Returns (language codes (B,), probabilities (B,)).
        """
        from thewhisper_tpu.config import LANGUAGES

        if not isinstance(mel, jax.Array):
            # Host input; device-resident mels stay on device (no fetch).
            mel = np.asarray(mel, dtype=np.float32)
        if mel.ndim == 2:
            mel = mel[None]
        b = mel.shape[0]
        bb = _bucket_batch(b, self.batch_buckets)
        if bb != b:
            mel = _pad_batch(mel, bb)
        fn = self._detect_language_fn(bb, mel.shape[-1])
        probs = np.asarray(fn(self.params, self._place(mel)))[:b]
        idx = probs.argmax(-1)
        codes = np.asarray(
            [LANGUAGES[i] for i in idx])
        return codes, probs[np.arange(b), idx]

    def warmup(self, t_mel: int, batches: Sequence[int] = (1,),
               max_new_tokens: int = 128, timestamps: bool = True,
               proposals: bool = False) -> None:
        """Pre-compile executables for the given buckets.

        ``proposals=True`` additionally compiles the proposal-token
        speculative variants (``draft_tokens=...`` calls — the cross-tick
        streaming path) so the first live request never pays a cold
        compile.
        """
        for b in batches:
            opts = GenerationOptions(
                max_new_tokens=max_new_tokens, return_timestamps=timestamps)
            mel = np.zeros((b, self.arch.n_mels, t_mel), np.float32)
            self.transcribe_features(mel, opts)
            if proposals:
                self.transcribe_features(
                    mel, opts,
                    draft_tokens=np.zeros((b, max_new_tokens), np.int32))

    @staticmethod
    def from_checkpoint(
        path: str,
        chunk_length_s: float = 30.0,
        compute_dtype: jnp.dtype = jnp.bfloat16,
        position_mode: Optional[str] = None,
        quantize: Optional[str] = None,
        draft: Optional[str] = None,
        spec_window: int = 4,
    ) -> "WhisperEngine":
        """Build an engine from an HF checkpoint directory.

        Reads suppress-token lists from the checkpoint generation config
        (parity with HF generate defaults). ``quantize="int8"`` enables the
        "S" mode: weight-only int8 decoder + int8 cross-KV cache
        (models/quant.py) — A/B on a real v5e showed int8 cross-KV cuts
        bs=32 decode from 3.26 to 2.60 ms/step at argmax parity
        (tests/test_quant_beam.py::test_int8_cross_kv_cache).
        ``quantize="int8-all"`` ("S+") additionally runs the encoder
        W8A8 — int8 activations quantized on the fly into int8 x int8 MXU
        matmuls (v5e int8 peak is 2x bf16; measured ~1.3x end-to-end per
        matmul, tools/int8_matmul_probe.py). Encoder quantization error is
        larger than weight-only; validate WER on real weights before
        production use. ``quantize="int4"`` ("S4", experimental) stores
        decoder linear weights as ``jnp.int4`` (two nibbles/byte in HBM —
        half the int8 weight bandwidth at ~16x the rounding error); the
        tied embedding stays per-row int8. NOTE: jnp.int4 arrays cannot
        cross the axon TPU tunnel (plugin transfer bug) — usable on
        directly-attached TPUs and CPU only (tools/decode_bs1_probe.py).

        ``draft`` enables speculative greedy decoding: ``"ngram"`` drafts
        by free prompt lookup (no extra weights — never meaningfully
        slower, faster on repetitive speech), ``"layer-skip:N"`` drafts
        with the first N target decoder layers, or pass a draft
        checkpoint directory (distil-whisper style: must share the
        target's encoder width and vocab). Output is identical to plain
        greedy for any draft; only speed changes (engine/speculative.py).
        """
        import json
        import os

        from thewhisper_tpu.models.load import load_checkpoint

        params, arch = load_checkpoint(
            path, dtype=compute_dtype, chunk_length_s=chunk_length_s,
            position_mode=position_mode)
        if quantize in ("int8", "int8-weights", "int8-all", "int4"):
            from thewhisper_tpu.models.quant import quantize_params

            params = quantize_params(
                params, components=("decoder",),
                quantize_embedding_table=(quantize != "int8-weights"),
                bits=4 if quantize == "int4" else 8)
            if quantize == "int8-all":
                params = quantize_params(
                    params, components=("encoder",), activation_int8=True)
        elif quantize is not None:
            raise ValueError(f"unknown quantize mode: {quantize}")
        draft_params = draft_arch = None
        spec_ngram = False
        if draft == "ngram":
            spec_ngram = True
        elif draft:
            if draft.startswith("layer-skip:"):
                from thewhisper_tpu.engine.speculative import (
                    make_layer_skip_draft,
                )

                draft_params, draft_arch = make_layer_skip_draft(
                    params, arch, int(draft.split(":", 1)[1]))
            elif draft.endswith(".npz") or os.path.exists(draft + ".npz"):
                # Decoder-only draft saved by speculative.save_draft
                # (e.g. a distilled layer-skip student, training/distill).
                from thewhisper_tpu.engine.speculative import load_draft

                draft_params, draft_arch = load_draft(draft)
                # Match the engine compute dtype: a distilled f32 draft on
                # a bf16 engine would read weights at 2x the bandwidth —
                # the very thing the draft exists to minimize.
                draft_params = jax.tree.map(
                    lambda a: (a.astype(compute_dtype)
                               if jnp.issubdtype(a.dtype, jnp.floating)
                               else a),
                    draft_params)
            else:
                draft_params, draft_arch = load_checkpoint(
                    draft, dtype=compute_dtype,
                    chunk_length_s=chunk_length_s,
                    position_mode=position_mode)
        suppress: Sequence[int] = ()
        begin: Sequence[int] = ()
        gen_path = os.path.join(path, "generation_config.json")
        if os.path.exists(gen_path):
            with open(gen_path) as f:
                gc = json.load(f)
            suppress = gc.get("suppress_tokens", []) or []
            begin = gc.get("begin_suppress_tokens", []) or []
        s_mode = quantize in ("int8", "int8-weights", "int8-all", "int4")
        return WhisperEngine(
            params, arch, compute_dtype=compute_dtype,
            suppress_tokens=suppress, begin_suppress_tokens=begin,
            cross_kv_int8=s_mode,
            draft_params=draft_params, draft_arch=draft_arch,
            spec_window=spec_window, spec_ngram=spec_ngram,
            # S engine -> S draft: layer-skip drafts slice the already-
            # quantized target and are int8 for free; quantize distilled
            # .npz / external-checkpoint drafts to match (weight-only
            # int8 steps ~30-40% faster; output tokens are draft-
            # independent, only acceptance — i.e. speed — can shift).
            draft_int8=s_mode)

"""WER/CER/RTFx evaluation loop (reference ``benchmark/eval_utils.py``).

Protocol parity: greedy decoding, Whisper normalizers (English vs basic,
``eval_utils.py:24-35``), corpus WER/CER, RTFx = audio_seconds /
generation_seconds (``:149-154``), results merged into a JSON that
accumulates across runs (``:231-248``). TTFT is measured per batch as the
first-call latency; tok/s/chip is added per BASELINE.json.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Dict, Iterable, List, Optional

import numpy as np

from thewhisper_tpu.utils.normalizers import (
    BasicTextNormalizer,
    EnglishTextNormalizer,
)
from thewhisper_tpu.utils.wer import cer as cer_fn, wer as wer_fn

logger = logging.getLogger(__name__)


def get_normalizer(language: str):
    if language in ("en", "english"):
        return EnglishTextNormalizer()
    return BasicTextNormalizer()


def evaluate_dataset(
    pipeline,
    samples: Iterable,
    language: str = "en",
    batch_size: int = 8,
    max_new_tokens: int = 256,
    return_per_sample: bool = False,
) -> Dict[str, Any]:
    """Run the pipeline over samples, compute WER/CER/RTFx.

    ``pipeline`` is our ASRPipeline. Samples that fit one model window ride
    the batched ``transcribe_batch`` fast path; longer samples go through
    the windowed ``__call__`` (overlapping windows + timestamp-aware LCS
    merge) so their full audio is transcribed — parity with the reference,
    which evaluates through the HF chunked pipeline
    (``run_evaluation.py:62-72``) and never truncates.
    """
    normalizer = get_normalizer(language)
    refs: List[str] = []
    hyps: List[str] = []
    per_sample: List[Dict[str, Any]] = []
    total_audio_s = 0.0
    total_gen_s = 0.0
    ttft: Optional[float] = None
    chunk_s = float(getattr(pipeline, "model_chunk_length_s", float("inf")))
    gen_kwargs = {
        "num_beams": 1,
        "language": language,
        "max_new_tokens": max_new_tokens,
    }

    def record(s, text):
        ref_n = normalizer(s.text)
        hyp_n = normalizer(text)
        if not ref_n:
            return
        refs.append(ref_n)
        hyps.append(hyp_n)
        if return_per_sample:
            per_sample.append({
                "id": s.id, "ref": ref_n, "hyp": hyp_n,
                "duration": s.duration_s,
            })

    batch: List[Any] = []

    def flush(batch):
        nonlocal total_gen_s, ttft
        if not batch:
            return
        audios = [s.audio for s in batch]
        t0 = time.perf_counter()
        results = pipeline.transcribe_batch(
            audios, return_timestamps=False,
            generate_kwargs=dict(gen_kwargs),
        )
        dt = time.perf_counter() - t0
        if ttft is None:
            ttft = dt
        total_gen_s += dt
        for s, r in zip(batch, results):
            record(s, r["text"])

    for sample in samples:
        total_audio_s += sample.duration_s
        if sample.duration_s > chunk_s:
            # Long-form path: windowed call with LCS merge (no truncation).
            t0 = time.perf_counter()
            out = pipeline(sample.audio, return_timestamps=False,
                           generate_kwargs=dict(gen_kwargs))
            dt = time.perf_counter() - t0
            if ttft is None:
                ttft = dt
            total_gen_s += dt
            record(sample, out["text"])
            continue
        batch.append(sample)
        if len(batch) >= batch_size:
            flush(batch)
            batch = []
    flush(batch)

    out = {
        "wer": 100.0 * wer_fn(refs, hyps),
        "cer": 100.0 * cer_fn(refs, hyps),
        "n_samples": len(refs),
        "audio_s": total_audio_s,
        "gen_s": total_gen_s,
        "rtfx": total_audio_s / max(total_gen_s, 1e-9),
        "ttft_s": ttft,
    }
    if return_per_sample:
        out["samples"] = per_sample
    return out


def merge_save_results(path: str, task_name: str,
                       result: Dict[str, Any]) -> Dict[str, Any]:
    """Accumulate results JSON across reruns (reference :231-248)."""
    existing: Dict[str, Any] = {}
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f)
    result = {k: v for k, v in result.items() if k != "samples"}
    existing[task_name] = result
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(existing, f, indent=2)
    return existing


def evaluate_whisper(pipeline, tasks: List[Dict[str, Any]], sample_loader,
                     results_path: str = "results/eval.json",
                     batch_size: int = 8, max_new_tokens: int = 256,
                     **loader_kwargs) -> Dict[str, Any]:
    """Evaluate across tasks; print a summary table; merge-save results."""
    all_results: Dict[str, Any] = {}
    for task in tasks:
        language = task.get("language", "en")
        logger.info("evaluating %s", task["name"])
        samples = sample_loader(task, **loader_kwargs)
        res = evaluate_dataset(pipeline, samples, language=language,
                               batch_size=batch_size,
                               max_new_tokens=max_new_tokens)
        all_results[task["name"]] = res
        merge_save_results(results_path, task["name"], res)
        print(f"{task['name']:32s} WER {res['wer']:6.2f}  CER {res['cer']:6.2f}"
              f"  RTFx {res['rtfx']:8.2f}  n={res['n_samples']}")
    if all_results:
        mean_wer = float(np.mean([r["wer"] for r in all_results.values()]))
        print(f"{'MEAN':32s} WER {mean_wer:6.2f}")
    return all_results

"""Evaluation dataset loading and noise injection.

Mirrors the reference ``benchmark/data_utils.py``: the OpenASR EN task list
(8 ESB configs), the multilingual MLS/FLEURS/CoVoST2 lists, 16 kHz casting,
duration filtering, and MUSAN noise mixing at a target SNR.

This environment has no network egress, so HF datasets loading is gated:
``load_hf_dataset`` raises a clear error offline, and ``load_manifest``
provides a local-jsonl path (``{"audio": wav_path, "text": ...}`` per line)
used by tests and air-gapped deployments.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any, Dict, Iterable, Iterator, List, Optional

import numpy as np

from thewhisper_tpu.audio.io import load_audio

SAMPLE_RATE = 16000

# Open ASR Leaderboard English tasks (reference data_utils.py:219-335).
OPEN_ASR_EN_TASKS = [
    {"name": "librispeech_clean_test", "path": "esb/datasets",
     "config": "librispeech", "split": "test.clean", "text_key": "text"},
    {"name": "librispeech_other_test", "path": "esb/datasets",
     "config": "librispeech", "split": "test.other", "text_key": "text"},
    {"name": "spgispeech_test", "path": "esb/datasets",
     "config": "spgispeech", "split": "test", "text_key": "text"},
    {"name": "tedlium_test", "path": "esb/datasets",
     "config": "tedlium", "split": "test", "text_key": "text"},
    {"name": "voxpopuli_test", "path": "esb/datasets",
     "config": "voxpopuli", "split": "test", "text_key": "text"},
    {"name": "gigaspeech_test", "path": "esb/datasets",
     "config": "gigaspeech", "split": "test", "text_key": "text"},
    {"name": "earnings22_test", "path": "esb/datasets",
     "config": "earnings22", "split": "test", "text_key": "text"},
    {"name": "ami_test", "path": "esb/datasets",
     "config": "ami", "split": "test", "text_key": "text"},
]

# Language set of the reference multilingual protocol
# (reference data_utils.py:347,364,381: fr/it/es/pt/de across all three).
MULTILINGUAL_LANGS = ["fr", "it", "es", "pt", "de"]

# Correct dataset config names per language. The generated-looking forms
# ("es_es", two-letter MLS codes) DO NOT EXIST upstream — these maps are
# pinned by tests/test_eval.py::test_multilingual_task_golden so a broken
# config can never ship again.
FLEURS_CONFIGS = {
    "fr": "fr_fr", "it": "it_it", "es": "es_419", "pt": "pt_br",
    "de": "de_de", "en": "en_us", "ru": "ru_ru", "ar": "ar_eg",
    "hi": "hi_in", "id": "id_id",
}
MLS_CONFIGS = {
    "fr": "french", "it": "italian", "es": "spanish", "pt": "portuguese",
    "de": "german", "nl": "dutch", "pl": "polish",
}
COVOST2_CONFIGS = {
    "fr": "fr_en", "it": "it_en", "es": "es_en", "pt": "pt_en",
    "de": "de_en",
}


def open_asr_multilingual_tasks(langs: Optional[List[str]] = None) -> List[Dict]:
    """MLS + CoVoST2 + FLEURS tasks (reference data_utils.py:338-398).

    Defaults to the reference's exact five-language protocol in the
    reference's order (MLS block, then CoVoST2, then FLEURS). Extra
    languages (en/ru/ar/hi/id...) extend whichever datasets cover them.
    """
    langs = list(langs or MULTILINGUAL_LANGS)
    mls = [{
        "name": f"mls_{MLS_CONFIGS[lang]}_test",
        "path": "facebook/multilingual_librispeech",
        "config": MLS_CONFIGS[lang], "split": "test",
        "text_key": "transcript", "language": lang,
    } for lang in langs if lang in MLS_CONFIGS]
    covost = [{
        "name": f"covost2_{lang}_test", "path": "fixie-ai/covost2",
        "config": COVOST2_CONFIGS[lang], "split": "test",
        "text_key": "sentence", "language": lang,
    } for lang in langs if lang in COVOST2_CONFIGS]
    fleurs = [{
        "name": f"fleurs_{lang}_test", "path": "google/fleurs",
        "config": FLEURS_CONFIGS[lang], "split": "test",
        "text_key": "transcription", "language": lang,
    } for lang in langs if lang in FLEURS_CONFIGS]
    return mls + covost + fleurs


@dataclass
class EvalSample:
    audio: np.ndarray          # float32 mono 16 kHz
    text: str
    duration_s: float
    id: str = ""


def mix_noise_at_snr(audio: np.ndarray, noise: np.ndarray,
                     snr_db: float) -> np.ndarray:
    """Add noise scaled to the target SNR (reference data_utils.py:43-83).

    The noise is tiled/cropped to the audio length; scaling matches power
    ratio ``10^(snr/10)``.
    """
    n = len(audio)
    if len(noise) < n:
        reps = int(np.ceil(n / len(noise)))
        noise = np.tile(noise, reps)
    noise = noise[:n].astype(np.float32)

    p_signal = float(np.mean(audio.astype(np.float64) ** 2)) + 1e-12
    p_noise = float(np.mean(noise.astype(np.float64) ** 2)) + 1e-12
    scale = np.sqrt(p_signal / (p_noise * (10.0 ** (snr_db / 10.0))))
    return (audio + scale * noise).astype(np.float32)


class NoiseBank:
    """Directory of noise WAVs (MUSAN layout) cycled deterministically."""

    def __init__(self, noise_dir: str, seed: int = 0):
        self.files = sorted(
            os.path.join(root, f)
            for root, _, files in os.walk(noise_dir)
            for f in files if f.endswith(".wav"))
        if not self.files:
            raise FileNotFoundError(f"no wav files under {noise_dir}")
        self.rng = np.random.default_rng(seed)

    def sample(self) -> np.ndarray:
        path = self.files[int(self.rng.integers(len(self.files)))]
        return load_audio(path, sr=SAMPLE_RATE)


def load_manifest(path: str, max_samples: Optional[int] = None,
                  min_duration_s: float = 0.0,
                  max_duration_s: float = float("inf"),
                  noise_bank: Optional[NoiseBank] = None,
                  snr_db: Optional[float] = None) -> Iterator[EvalSample]:
    """Local jsonl manifest: {"audio": path, "text": str, ["id": str]}."""
    count = 0
    with open(path) as f:
        for line in f:
            if max_samples is not None and count >= max_samples:
                break
            item = json.loads(line)
            audio = load_audio(item["audio"], sr=SAMPLE_RATE)
            dur = len(audio) / SAMPLE_RATE
            if not (min_duration_s <= dur <= max_duration_s):
                continue
            if noise_bank is not None and snr_db is not None:
                audio = mix_noise_at_snr(audio, noise_bank.sample(), snr_db)
            yield EvalSample(audio=audio, text=item["text"], duration_s=dur,
                             id=item.get("id", str(count)))
            count += 1


def load_hf_dataset(task: Dict[str, Any], max_samples: Optional[int] = None,
                    min_duration_s: float = 0.0,
                    max_duration_s: float = float("inf"),
                    noise_bank: Optional[NoiseBank] = None,
                    snr_db: Optional[float] = None) -> Iterator[EvalSample]:
    """Stream an HF dataset task, cast to 16 kHz (requires network/cache)."""
    try:
        from datasets import Audio, load_dataset
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("the 'datasets' package is required") from e

    try:
        ds = load_dataset(task["path"], task.get("config"),
                          split=task["split"], streaming=True)
    except Exception as e:
        raise RuntimeError(
            f"could not load {task['name']} (offline environment? use "
            f"--local-manifest): {e}") from e

    ds = ds.cast_column("audio", Audio(sampling_rate=SAMPLE_RATE))
    count = 0
    for item in ds:
        if max_samples is not None and count >= max_samples:
            break
        audio = np.asarray(item["audio"]["array"], dtype=np.float32)
        dur = len(audio) / SAMPLE_RATE
        if not (min_duration_s <= dur <= max_duration_s):
            continue
        if noise_bank is not None and snr_db is not None:
            audio = mix_noise_at_snr(audio, noise_bank.sample(), snr_db)
        yield EvalSample(audio=audio, text=item[task["text_key"]],
                         duration_s=dur, id=str(item.get("id", count)))
        count += 1

"""Per-language correction-prompt optimization (dspy-free).

The reference optimizes the correction prompt per language with MIPROv2
(``optimize_prompt.py:138-168,205-257``) over a 50/50 stratified sample of
clean (WER 0) and dirty utterances. dspy is not available here, so this is
a candidate-search optimizer with the same evaluation loop: propose prompt
variants (seed instructions x style modifiers), score each by corpus WER of
``safe_correct`` outputs on the dev split, keep the best.
"""

from __future__ import annotations

import random
from typing import Callable, Dict, List, Optional, Tuple

from asr_postprocess.apply_correction import safe_correct
from thewhisper_tpu.utils.wer import wer

SEED_INSTRUCTIONS = [
    "You are an expert transcription editor. Correct any spelling or "
    "grammar errors in this ASR transcription without changing its meaning "
    "or style.",
    "Fix only clear transcription errors (misheard words, typos) in the "
    "text below. Do not paraphrase.",
    "Lightly post-edit this automatic speech transcription: repair "
    "obviously wrong words, leave everything else untouched.",
]
STYLE_MODIFIERS = [
    "Keep the wording as close to the original as possible.",
    "Never add or remove information; prefer the original word on doubt.",
    "Output must have roughly the same number of words as the input.",
]
SUFFIX = "Reply with ONLY the corrected transcription.\n\nTRANSCRIPTION:\n{hyp}\n"


def stratified_split(
    samples: List[Dict[str, str]],
    n: int,
    seed: int = 0,
) -> List[Dict[str, str]]:
    """50/50 clean (hyp == ref after normalization upstream) / dirty."""
    rng = random.Random(seed)
    clean = [s for s in samples if s["ref"] == s["hyp"]]
    dirty = [s for s in samples if s["ref"] != s["hyp"]]
    rng.shuffle(clean)
    rng.shuffle(dirty)
    half = n // 2
    picked = clean[:half] + dirty[: n - min(half, len(clean))]
    rng.shuffle(picked)
    return picked


def score_prompt(
    llm: Callable[[str], str],
    prompt_template: str,
    dev: List[Dict[str, str]],
    max_edits: Optional[int] = 6,
) -> float:
    """Corpus WER (lower is better) of guarded corrections on the dev set."""
    refs, hyps = [], []
    for s in dev:
        out, _, _ = safe_correct(
            llm, s["hyp"], max_edits=max_edits,
            prompt_template=prompt_template)
        refs.append(s["ref"])
        hyps.append(out)
    return wer(refs, hyps)


def optimize_prompt(
    llm: Callable[[str], str],
    samples: List[Dict[str, str]],
    n_dev: int = 32,
    seed: int = 0,
) -> Tuple[str, float, List[Tuple[str, float]]]:
    """Search instruction x modifier candidates; return (best, wer, trials)."""
    dev = stratified_split(samples, n_dev, seed=seed)
    baseline_wer = wer([s["ref"] for s in dev], [s["hyp"] for s in dev])

    trials: List[Tuple[str, float]] = []
    best_prompt = None
    best_wer = float("inf")
    for instr in SEED_INSTRUCTIONS:
        for mod in STYLE_MODIFIERS:
            template = f"{instr} {mod} {SUFFIX}"
            w = score_prompt(llm, template, dev)
            trials.append((template, w))
            if w < best_wer:
                best_wer, best_prompt = w, template

    # Guard: never ship a prompt that is worse than doing nothing.
    if best_wer > baseline_wer:
        best_prompt = None
        best_wer = baseline_wer
    return best_prompt, best_wer, trials

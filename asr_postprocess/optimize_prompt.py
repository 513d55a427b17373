"""Per-language correction-prompt optimization (dspy-free MIPROv2 analog).

The reference optimizes the correction prompt per language with MIPROv2
(``optimize_prompt.py:138-168,205-257``) over a 50/50 stratified sample of
clean (WER 0) and dirty utterances. dspy is not available here, so this
re-implements MIPROv2's three moves directly:

1. **Instruction proposal**: a proposer LLM reads a summary of observed
   errors from the dev split and writes candidate instructions
   (``propose_instructions``), seeded by the hand-written ones.
2. **Demo bootstrapping**: dirty dev examples the current prompt already
   fixes become few-shot demos (``bootstrap_demos``) — MIPROv2's
   ``max_bootstrapped_demos``.
3. **Candidate search**: every (instruction x demo-set) candidate is
   scored by corpus WER of guarded ``safe_correct`` outputs on the dev
   split; the best wins, with a never-worse-than-baseline guard.
"""

from __future__ import annotations

import random
import re
from typing import Callable, Dict, List, Optional, Sequence, Tuple

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
    """Corpus WER (lower is better) of guarded corrections on the dev set.

    Dev samples are independent LLM requests, so they run through a
    thread pool (the candidate search issues hundreds of calls — serial
    scoring was 10-20 min wall-clock; same pattern as
    ``analyze_errors.analyze_manifest``).
    """
    from concurrent.futures import ThreadPoolExecutor

    from asr_postprocess.config import LLM_WORKERS

    def one(s):
        out, _, _ = safe_correct(
            llm, s["hyp"], max_edits=max_edits,
            prompt_template=prompt_template)
        return out

    with ThreadPoolExecutor(max_workers=LLM_WORKERS) as pool:
        hyps = list(pool.map(one, dev))
    return wer([s["ref"] for s in dev], hyps)


def summarize_errors(dev: List[Dict[str, str]], max_examples: int = 8) -> str:
    """Compact error evidence for the proposer prompt: the first N dirty
    (hyp != ref) pairs, diff-style."""
    lines = []
    for s in dev:
        if s["ref"] == s["hyp"]:
            continue
        lines.append(f"ASR OUTPUT: {s['hyp']}\nCORRECT:    {s['ref']}")
        if len(lines) >= max_examples:
            break
    return "\n\n".join(lines) if lines else "(no errors observed)"


_PROPOSER_PROMPT = (
    "You design system prompts for a model that post-edits automatic "
    "speech recognition output. Below are observed (ASR OUTPUT, CORRECT) "
    "pairs from the target domain:\n\n{evidence}\n\n"
    "Write {n} alternative one-paragraph instructions for the editor "
    "model. Each must tell it to fix only genuine transcription errors "
    "and never paraphrase. Make them meaningfully different from each "
    "other (emphasis, constraints, tone). Reply as a numbered list, one "
    "instruction per line."
)


def propose_instructions(
    proposer: Callable[[str], str],
    dev: List[Dict[str, str]],
    n: int = 4,
) -> List[str]:
    """LLM-driven instruction proposal grounded in observed errors
    (MIPROv2's instruction-proposal stage,
    reference ``optimize_prompt.py:227-243`` via ``prompt_model``)."""
    try:
        raw = proposer(_PROPOSER_PROMPT.format(
            evidence=summarize_errors(dev), n=n))
    except Exception:
        return []
    out: List[str] = []
    for line in raw.splitlines():
        line = re.sub(r"^\s*(?:\d+[.)]\s*|[-*]\s*)", "", line).strip()
        if len(line.split()) >= 6:        # discard headers / empty lines
            out.append(line)
    return out[:n]


def bootstrap_demos(
    llm: Callable[[str], str],
    dev: List[Dict[str, str]],
    base_template: str,
    max_demos: int = 2,
) -> List[Dict[str, str]]:
    """Dirty examples the base prompt already corrects become few-shot
    demos (MIPROv2 ``max_bootstrapped_demos``)."""
    demos = []
    for s in dev:
        if s["ref"] == s["hyp"] or len(demos) >= max_demos:
            continue
        out, leaked, rejected = safe_correct(
            llm, s["hyp"], max_edits=6, prompt_template=base_template)
        if not leaked and not rejected and out == s["ref"] != s["hyp"]:
            demos.append({"hyp": s["hyp"], "ref": s["ref"]})
    return demos


def render_template(instr: str, mod: str,
                    demos: Sequence[Dict[str, str]] = ()) -> str:
    def esc(t: str) -> str:   # the template goes through str.format({hyp})
        return t.replace("{", "{{").replace("}", "}}")

    demo_block = "".join(
        f"\nEXAMPLE INPUT:\n{esc(d['hyp'])}\nEXAMPLE OUTPUT:\n{esc(d['ref'])}\n"
        for d in demos)
    return f"{esc(instr)} {esc(mod)}{demo_block} {SUFFIX}"


def optimize_prompt(
    llm: Callable[[str], str],
    samples: List[Dict[str, str]],
    n_dev: int = 32,
    seed: int = 0,
    proposer: Optional[Callable[[str], str]] = None,
    n_proposals: int = 4,
    max_demos: int = 2,
) -> Tuple[str, float, List[Tuple[str, float]]]:
    """MIPROv2-style search; returns (best_template, best_wer, trials).

    Candidates = (seed instructions + proposer-LLM instructions) x style
    modifiers, with the best instruction additionally tried with
    bootstrapped few-shot demos. ``proposer`` defaults to ``llm``; pass
    ``proposer=False``-y and ``max_demos=0`` to recover the plain grid.
    """
    dev = stratified_split(samples, n_dev, seed=seed)
    baseline_wer = wer([s["ref"] for s in dev], [s["hyp"] for s in dev])

    instructions = list(SEED_INSTRUCTIONS)
    proposer_fn = llm if proposer is None else proposer
    if proposer_fn:
        instructions += [p for p in
                         propose_instructions(proposer_fn, dev, n_proposals)
                         if p not in instructions]

    trials: List[Tuple[str, float]] = []
    best_prompt = None
    best_wer = float("inf")
    best_pair = (SEED_INSTRUCTIONS[0], STYLE_MODIFIERS[0])
    for instr in instructions:
        for mod in STYLE_MODIFIERS:
            template = render_template(instr, mod)
            w = score_prompt(llm, template, dev)
            trials.append((template, w))
            if w < best_wer:
                best_wer, best_prompt = w, template
                best_pair = (instr, mod)

    # Demo stage: bootstrap few-shot demos under the winning instruction
    # and re-score (kept only if they help).
    if max_demos > 0 and best_prompt is not None:
        demos = bootstrap_demos(llm, dev, best_prompt, max_demos=max_demos)
        if demos:
            template = render_template(*best_pair, demos=demos)
            w = score_prompt(llm, template, dev)
            trials.append((template, w))
            if w < best_wer:
                best_wer, best_prompt = w, template

    # Guard: never ship a prompt that is worse than doing nothing.
    if best_wer > baseline_wer:
        best_prompt = None
        best_wer = baseline_wer
    return best_prompt, best_wer, trials

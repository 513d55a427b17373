"""LLM correction application with leak and edit-budget guards.

Parity with the reference (``apply_correction.py:61-119``): the corrected
text is rejected (falling back to the baseline hypothesis) when

- the LLM call raises,
- the output doubles the input length or contains a reasoning-leak marker,
- it deviates from the baseline by more than ``max_len_ratio`` in words,
- or needs more than ``max_edits`` word edits from the baseline.
"""

from __future__ import annotations

import json
from typing import Callable, Optional, Tuple

from thewhisper_tpu.utils.wer import edit_stats

# Reasoning-channel spills / meta-commentary that disqualify an output.
LEAK_MARKERS = (
    "Wait,", "Let's apply", "Let me re", "Looking at", "Actually,",
    "$\\rightarrow$", "rightarrow", "### ", "**Step",
)

CORRECTION_PROMPT = """You are an expert transcription editor. Correct any \
spelling or grammar errors in this ASR transcription without changing its \
meaning or style. Keep the wording as close to the original as possible. \
Reply with ONLY the corrected transcription.

TRANSCRIPTION:
{hyp}
"""


def load_optimized_program(path: str) -> str:
    """Load a dspy-MIPROv2 program export as a ``safe_correct`` template.

    The reference ships six per-language optimized programs
    (``asr_postprocess/experiments/opt_trb/prompts/optimized_program_*.json``,
    consumed by its ``apply_correction.py``); a user migrating with those
    artifacts plugs them straight in here. Export layout:
    ``signature.instructions`` (the optimized instruction),
    ``signature.fields`` (prompt prefixes, e.g. "Hypotheses:" /
    "Corrected Transcription:"), and ``demos`` (bootstrapped few-shot
    pairs with ``hypotheses`` / ``corrected_transcription``). Rendered in
    dspy's completion style: instruction, demos as prefix-labelled
    input/output blocks, then the live hypothesis under the input prefix
    with the output prefix left open for the LLM.
    """
    with open(path, encoding="utf-8") as f:
        prog = json.load(f)
    sig = prog.get("signature") or {}
    instructions = (sig.get("instructions") or CORRECTION_PROMPT).strip()
    fields = sig.get("fields") or []
    in_prefix = fields[0]["prefix"] if len(fields) > 0 else "Hypotheses:"
    out_prefix = (fields[1]["prefix"] if len(fields) > 1
                  else "Corrected Transcription:")

    def esc(t: str) -> str:   # the template goes through str.format({hyp})
        return t.replace("{", "{{").replace("}", "}}")

    parts = [esc(instructions), ""]
    for d in prog.get("demos") or []:
        hyp = (d.get("hypotheses") or d.get("hyp") or "").strip()
        ref = (d.get("corrected_transcription") or d.get("ref") or "").strip()
        if not hyp or not ref:
            continue
        parts += [f"{esc(in_prefix)} {esc(hyp)}",
                  f"{esc(out_prefix)} {esc(ref)}", ""]
    parts += [f"{esc(in_prefix)} {{hyp}}", esc(out_prefix)]
    return "\n".join(parts)


def word_edit_count(a: str, b: str) -> int:
    return edit_stats(a.split(), b.split())["errors"]


def safe_correct(
    llm: Callable[[str], str],
    hypothesis: str,
    baseline: Optional[str] = None,
    max_edits: Optional[int] = 6,
    max_len_ratio: Optional[float] = 0.5,
    prompt_template: str = CORRECTION_PROMPT,
) -> Tuple[str, bool, bool]:
    """Run the corrector, guard output. Returns (text, leaked, rejected)."""
    baseline = baseline if baseline is not None else hypothesis
    try:
        out = llm(prompt_template.format(hyp=hypothesis)).strip()
    except Exception:
        return baseline, False, False

    n_in = len(hypothesis.split())
    n_out = len(out.split())
    if n_out > n_in * 2 or any(m in out for m in LEAK_MARKERS):
        return baseline, True, False

    if max_len_ratio is not None:
        base_len = max(1, len(baseline.split()))
        if abs(n_out - base_len) / base_len > max_len_ratio:
            return baseline, False, True
    if max_edits is not None and word_edit_count(baseline, out) > max_edits:
        return baseline, False, True

    return out, False, False

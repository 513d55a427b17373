"""LLM correction application with leak and edit-budget guards.

Parity with the reference (``apply_correction.py:61-119``): the corrected
text is rejected (falling back to the baseline hypothesis) when

- the LLM call raises,
- the output doubles the input length or contains a reasoning-leak marker,
- it deviates from the baseline by more than ``max_len_ratio`` in words,
- or needs more than ``max_edits`` word edits from the baseline.
"""

from __future__ import annotations

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

"""ASR post-correction and error-analysis side rail.

TPU-build port of the reference ``asr_postprocess/`` pipeline (SURVEY C14):
per-sample WER + alignment, rule-based error preclassification, LLM
categorization into the 12-class taxonomy, prompt optimization, correction
application with leak/edit guards, and an HTML report dashboard.

LLM access is behind the ``LLMClient`` protocol (``callable(prompt) -> str``)
so the pipeline runs with any OpenAI-compatible endpoint (``llm.py``) or a
fake in tests; dspy/streamlit are not required.
"""

from asr_postprocess.analyze_errors import (  # noqa: F401
    CATEGORIES,
    analyze_pair,
    merge_mismatches,
    preclassify,
)
from asr_postprocess.apply_correction import safe_correct  # noqa: F401

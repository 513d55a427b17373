"""Constants + env overrides (reference ``asr_postprocess/config.py``)."""

from __future__ import annotations

import os

RESULTS_DIR = os.getenv("ASR_PP_RESULTS_DIR", "results")
REPORTS_DIR = os.getenv("ASR_PP_REPORTS_DIR", "reports")

# LLM endpoint (OpenAI-compatible); used by llm.OpenAICompatClient.
TASK_LM_BASE_URL = os.getenv("TASK_LM_BASE_URL", "http://127.0.0.1:8000/v1")
TASK_LM_MODEL = os.getenv("TASK_LM_MODEL", "local-model")
TASK_LM_TEMPERATURE = float(os.getenv("TASK_LM_TEMPERATURE", "0.0"))
TASK_LM_MAX_TOKENS = int(os.getenv("TASK_LM_MAX_TOKENS", "1024"))
LLM_WORKERS = int(os.getenv("ASR_PP_LLM_WORKERS", "4"))

# Correction guards (reference apply_correction.py:61-119).
MAX_EDITS = int(os.getenv("ASR_PP_MAX_EDITS", "6"))
MAX_LEN_RATIO = float(os.getenv("ASR_PP_MAX_LEN_RATIO", "0.5"))

"""Minimal OpenAI-compatible chat client (dspy replacement).

Any ``callable(prompt) -> str`` works as an LLM for this package; this one
talks to a local vLLM/llama.cpp-style endpoint configured by the same env
vars the reference uses (``TASK_LM_BASE_URL`` / ``TASK_LM_MODEL``).
"""

from __future__ import annotations

from asr_postprocess import config


class OpenAICompatClient:
    def __init__(self, base_url: str = None, model: str = None,
                 temperature: float = None, max_tokens: int = None,
                 timeout_s: float = 120.0):
        self.base_url = (base_url or config.TASK_LM_BASE_URL).rstrip("/")
        self.model = model or config.TASK_LM_MODEL
        self.temperature = (config.TASK_LM_TEMPERATURE
                            if temperature is None else temperature)
        self.max_tokens = max_tokens or config.TASK_LM_MAX_TOKENS
        self.timeout_s = timeout_s

    def __call__(self, prompt: str) -> str:
        import httpx

        resp = httpx.post(
            f"{self.base_url}/chat/completions",
            json={
                "model": self.model,
                "messages": [{"role": "user", "content": prompt}],
                "temperature": self.temperature,
                "max_tokens": self.max_tokens,
                "chat_template_kwargs": {"enable_thinking": False},
            },
            timeout=self.timeout_s,
        )
        resp.raise_for_status()
        return resp.json()["choices"][0]["message"]["content"]

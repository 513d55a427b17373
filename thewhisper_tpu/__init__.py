"""TheWhisper-TPU: a TPU-native streaming speech-to-text framework.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
TheStageAI/TheWhisper (reference: /root/reference): flexible-chunk Whisper
inference (10/15/20/30 s), word-level timestamps via cross-attention DTW,
a VAD-gated streaming pipeline with commit/assumption hypothesis splitting,
a REST streaming server, and an OpenASR evaluation harness — all designed
TPU-first:

- the log-mel STFT front end is a fused Pallas kernel (``thewhisper_tpu.ops``),
- the encoder/decoder run as jitted XLA with bucketed static shapes,
- the greedy/beam decode loop is a ``lax.while_loop`` that never leaves the
  device between tokens (the reference pays a host<->device round trip per
  token, ``apple/model.py:155-255``),
- multi-chip scaling uses ``jax.sharding.Mesh`` + ``pjit`` (``parallel/``).

Layer map mirrors SURVEY.md section 1; component parity is tracked against
SURVEY.md section 2.
"""

__version__ = "0.1.0"

from thewhisper_tpu.config import (  # noqa: F401
    WhisperArch,
    GenerationOptions,
    SpecialTokens,
)

__all__ = [
    "WhisperArch",
    "GenerationOptions",
    "SpecialTokens",
    "ASRPipeline",
    "StreamingPipeline",
    "WhisperEngine",
    "__version__",
]


def __getattr__(name):  # lazy top-level conveniences (avoid import cycles)
    if name == "ASRPipeline":
        from thewhisper_tpu.pipeline import ASRPipeline

        return ASRPipeline
    if name == "StreamingPipeline":
        from thewhisper_tpu.streaming import StreamingPipeline

        return StreamingPipeline
    if name == "WhisperEngine":
        from thewhisper_tpu.engine import WhisperEngine

        return WhisperEngine
    raise AttributeError(name)

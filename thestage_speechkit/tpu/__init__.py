"""TPU backend: the native home of ASRPipeline in this framework."""

from thewhisper_tpu.pipeline import ASRPipeline  # noqa: F401

__all__ = ["ASRPipeline"]

"""NVIDIA-backend alias: resolves to the TPU engine (device swap shim)."""

import warnings

from thewhisper_tpu.pipeline import ASRPipeline  # noqa: F401

warnings.warn(
    "thestage_speechkit.nvidia is the CUDA/TensorRT backend of the "
    "reference; this build runs the TPU engine instead (same API).",
    stacklevel=2,
)

__all__ = ["ASRPipeline"]

"""Drop-in compatibility package for TheStageAI/TheWhisper user code.

Reference programs import ``thestage_speechkit.apple.ASRPipeline`` /
``thestage_speechkit.nvidia.ASRPipeline`` /
``thestage_speechkit.streaming.StreamingPipeline`` (see
``examples/run_apple_asr.py`` etc. in the reference). This shim maps that
public API onto the TPU framework so a device swap is the only change —
``apple`` and ``nvidia`` resolve to the TPU backend with a warning, and the
reference's HF chunk-merge monkey-patch (``thestage_speechkit/__init__.py``
upstream) is unnecessary here because window merging is built in
(thewhisper_tpu.text.find_longest_common_sequence).
"""

from thewhisper_tpu.text import find_longest_common_sequence  # noqa: F401

__all__ = ["find_longest_common_sequence"]

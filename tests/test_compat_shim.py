"""thestage_speechkit compatibility shim: reference import paths work."""

import dataclasses
import warnings

import numpy as np
import pytest


def test_reference_import_paths():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        from thestage_speechkit.apple import ASRPipeline as AppleASR
        from thestage_speechkit.nvidia import ASRPipeline as NvidiaASR
    from thestage_speechkit.tpu import ASRPipeline as TpuASR
    from thestage_speechkit.streaming import StreamingPipeline
    from thewhisper_tpu.pipeline import ASRPipeline

    assert AppleASR is NvidiaASR is TpuASR is ASRPipeline
    assert StreamingPipeline is not None


def test_reference_style_usage():
    """Mimic the reference examples/run_streaming.py wiring via the shim."""
    from thestage_speechkit.streaming import StreamingPipeline, TranscriptionBackend

    class Fake(TranscriptionBackend):
        def transcribe(self, audio, buffer_start_time, sample_rate):
            return [{"text": " ok", "start": buffer_start_time,
                     "end": buffer_start_time + 0.5}]

    sp = StreamingPipeline(backend=Fake(), chunk_length_s=10, use_vad=False)
    c, a = sp(np.zeros(40000, np.float32))
    assert isinstance(c, list) and isinstance(a, list)


def test_lcs_export():
    from thestage_speechkit import find_longest_common_sequence

    assert find_longest_common_sequence([[1, 2, 3], [2, 3, 4]]) == [1, 2, 3, 4]

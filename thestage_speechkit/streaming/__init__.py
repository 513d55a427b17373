"""Streaming API re-export (reference: ``thestage_speechkit/streaming``)."""

from thewhisper_tpu.streaming import (  # noqa: F401
    ArrayStream,
    FileStream,
    MicStream,
    StdoutStream,
    StreamingPipeline,
    TranscriptionBackend,
)
from thewhisper_tpu.streaming.pipeline import (  # noqa: F401
    LocalWhisperBackend,
    RemoteAPIBackend,
    RemoteAPITimestampsBackend,
)

__all__ = [
    "ArrayStream", "FileStream", "MicStream", "StdoutStream",
    "StreamingPipeline", "TranscriptionBackend", "LocalWhisperBackend",
    "RemoteAPIBackend", "RemoteAPITimestampsBackend",
]

from thewhisper_tpu.streaming.pipeline import (  # noqa: F401
    StreamingPipeline,
    TranscriptionBackend,
    LocalWhisperBackend,
    RemoteAPIBackend,
    RemoteAPITimestampsBackend,
)
from thewhisper_tpu.streaming.streams import (  # noqa: F401
    ArrayStream,
    FileStream,
    MicStream,
    StdoutStream,
)
from thewhisper_tpu.streaming.vad import EnergyVAD, make_vad  # noqa: F401

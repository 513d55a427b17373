from thewhisper_tpu.engine.engine import WhisperEngine, EngineResult  # noqa: F401
from thewhisper_tpu.engine.speculative import (  # noqa: F401
    make_layer_skip_draft,
    speculative_decode,
)

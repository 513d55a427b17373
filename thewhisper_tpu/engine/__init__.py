from thewhisper_tpu.engine.engine import WhisperEngine, EngineResult  # noqa: F401

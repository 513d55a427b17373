from thewhisper_tpu.ops.logmel_pallas import log_mel_pallas  # noqa: F401

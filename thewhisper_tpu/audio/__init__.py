from thewhisper_tpu.audio.io import load_audio, save_wav, resample  # noqa: F401
from thewhisper_tpu.audio.features import (  # noqa: F401
    LogMelFeaturizer,
    mel_filter_bank,
    log_mel_spectrogram,
)

from thewhisper_tpu.models.whisper import (  # noqa: F401
    WhisperParams,
    init_params,
    encoder_forward,
    decoder_prefill,
    decoder_step,
    compute_cross_kv,
)
from thewhisper_tpu.models.load import (  # noqa: F401
    arch_from_hf_config,
    params_from_hf_state_dict,
    load_checkpoint,
)

from thewhisper_tpu.training.train import (  # noqa: F401
    TrainState,
    make_train_step,
    cross_entropy_loss,
    init_train_state,
)

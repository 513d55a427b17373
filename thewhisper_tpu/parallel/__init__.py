from thewhisper_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    param_pspecs,
    param_shardings,
    batch_sharding,
    replicated,
    seq_sharding,
    shard_params,
)

from youku_mplug_tpu.optim import schedulers, zoo
from youku_mplug_tpu.optim.factory import (
    OptimizerConfig,
    merge_params,
    partition_params,
    cosine_schedule,
    create_optimizer,
    decay_mask,
    freeze_mask,
    lr_scale_tree,
)

__all__ = [
    "OptimizerConfig",
    "cosine_schedule",
    "create_optimizer",
    "decay_mask",
    "freeze_mask",
    "lr_scale_tree",
    "merge_params",
    "partition_params",
    "schedulers",
    "zoo",
]

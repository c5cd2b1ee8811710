from youku_mplug_tpu.train.state import TrainState, create_train_state
from youku_mplug_tpu.train.trainer import make_train_step
from youku_mplug_tpu.train.checkpoint import CheckpointManager
from youku_mplug_tpu.train.metrics import MetricLogger, SmoothedValue

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "CheckpointManager",
    "MetricLogger",
    "SmoothedValue",
]

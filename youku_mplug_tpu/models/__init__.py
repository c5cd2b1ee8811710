from youku_mplug_tpu.models.gpt3 import GPT3Config, GPT3Decoder, GPT3LM
from youku_mplug_tpu.models.vision import (
    TimeSformer,
    VisionTransformer,
    AttentionPool,
    VisionConfig,
)

__all__ = [
    "GPT3Config",
    "GPT3Decoder",
    "GPT3LM",
    "TimeSformer",
    "VisionTransformer",
    "AttentionPool",
    "VisionConfig",
]

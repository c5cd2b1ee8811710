from youku_mplug_tpu.models.gpt3 import GPT3Config, GPT3Decoder, GPT3LM
from youku_mplug_tpu.models.bloom import BloomConfig, BloomLM
from youku_mplug_tpu.models.owl import (
    MPLUGOwlVideo,
    MPLUGOwlVideoConfig,
    OwlAbstractorConfig,
    OwlVisualAbstractor,
)
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
    "BloomConfig",
    "BloomLM",
    "MPLUGOwlVideo",
    "MPLUGOwlVideoConfig",
    "OwlAbstractorConfig",
    "OwlVisualAbstractor",
    "TimeSformer",
    "VisionTransformer",
    "AttentionPool",
    "VisionConfig",
]

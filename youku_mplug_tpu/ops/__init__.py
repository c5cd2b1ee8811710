from youku_mplug_tpu.ops.layernorm import layer_norm
from youku_mplug_tpu.ops.attention import dot_product_attention, mha_reference
from youku_mplug_tpu.ops.cross_entropy import (
    cross_entropy_with_logits,
    lm_cross_entropy,
)

__all__ = [
    "layer_norm",
    "dot_product_attention",
    "mha_reference",
    "cross_entropy_with_logits",
    "lm_cross_entropy",
]

"""LayerNorm with a forced fp32 island.

Matches the numerics contract of the reference's ``LayerNormWithForceFP32``
(reference: models/vision_transformer.py:43-75) and megatron fused LayerNorm
(modeling_distributed_gpt3.py:26-28): statistics and normalization are
computed in fp32 regardless of input dtype, result cast back.

On TPU, XLA fuses this chain into the surrounding computation; a Pallas
kernel buys nothing here (the op is bandwidth-bound and already fused), so
the jnp implementation *is* the production path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def layer_norm(x, scale, bias, *, eps: float = 1e-5):
    """fp32-island layernorm over the last axis; returns x.dtype."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(orig_dtype)

"""Mixed-precision policy.

The reference's numerics contract (which downstream accuracy parity depends
on) is: bf16 (or fp16+scaler) parameters/activations with *fp32 islands* at
layernorm, attention softmax and cross-entropy:

- ``LayerNormWithForceFP32`` (reference: models/vision_transformer.py:43-75)
- ``qk_float`` fp32 QK matmul in vision attention (vision_transformer.py:180-183)
- ``attention_softmax_in_fp32`` + per-layer query-key scaling in the decoder
  (modeling_distributed_gpt3.py:699-727)
- fp32 cross-entropy (modeling_distributed_gpt3.py:1356-1359)

TPU-natively we keep fp32 master params (optax state), cast to bf16 for
compute, and force the same fp32 islands explicitly.  No loss scaling is
needed for bf16 (same as the reference's bf16 DeepSpeed path).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32     # master weights
    compute_dtype: jnp.dtype = jnp.bfloat16  # matmul/activation dtype
    norm_dtype: jnp.dtype = jnp.float32      # layernorm accumulation
    softmax_dtype: jnp.dtype = jnp.float32   # attention softmax
    loss_dtype: jnp.dtype = jnp.float32      # cross-entropy

    def cast_to_compute(self, tree):
        def cast(x):
            if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(self.compute_dtype)
            return x
        return jax.tree.map(cast, tree)

    def cast_to_param(self, tree):
        def cast(x):
            if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(self.param_dtype)
            return x
        return jax.tree.map(cast, tree)


DEFAULT_POLICY = Policy()

# Full-fp32 policy for CPU parity tests.
FP32_POLICY = Policy(compute_dtype=jnp.float32)

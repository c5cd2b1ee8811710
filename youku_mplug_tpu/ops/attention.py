"""Scaled-dot-product attention with an fp32 softmax island.

This is the numerics contract shared by both hot loops of the reference:

- decoder: ``attention_softmax_in_fp32`` forced on by per-layer query-key
  scaling (reference: modeling_distributed_gpt3.py:699-727).  The per-layer
  rescaling there (divide scores by ``layer_number`` pre-softmax, multiply
  back inside the fused softmax) is an fp16-range trick that cancels exactly;
  on bf16 TPU we compute the softmax directly in fp32, which is the same
  mathematical function.
- vision: ``qk_float`` fp32 QK matmul (reference: vision_transformer.py:180-183).

Two implementations behind one interface:

- ``mha_reference`` — pure-jnp, used on CPU and as the parity oracle.
- Pallas flash attention (``youku_mplug_tpu.ops.flash_attention``) — the TPU
  production path (online softmax, memory-linear, custom VJP).

``dot_product_attention`` dispatches on backend.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def mha_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    kv_len: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Plain attention. q,k,v: [B, H, S, D]. fp32 softmax, returns q.dtype.

    kv_len: optional [B] int array — keys at positions >= kv_len are masked
    (used for padded variable-length batches).
    dropout_rate/dropout_rng: attention-probability dropout (reference
    modeling_distributed_gpt3.py:778-780 / vision attn_drop) — inverted
    scaling, applied post-softmax.
    """
    orig_dtype = q.dtype
    if scale is None:
        scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    mask_value = jnp.finfo(jnp.float32).min
    if causal:
        sq, sk = q.shape[2], k.shape[2]
        qi = jnp.arange(sq)[:, None] + (sk - sq)
        ki = jnp.arange(sk)[None, :]
        s = jnp.where((qi >= ki)[None, None], s, mask_value)
    if kv_len is not None:
        ki = jnp.arange(k.shape[2])[None, None, None, :]
        s = jnp.where(ki < kv_len[:, None, None, None], s, mask_value)
    p = jax.nn.softmax(s, axis=-1)
    if dropout_rate > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_rate > 0 requires dropout_rng")
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    p.shape)
        p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(orig_dtype), v)
    return out


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    kv_len: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    use_flash: Optional[bool] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Backend-dispatched attention. q,k,v: [B, H, S, D].

    Attention-probability dropout runs on the reference path (the flash
    kernel is inference/frozen-training fast path; training WITH attn
    dropout falls back — same numerics as the reference's partition-local
    dropout under the RNG tracker, distributed_gpt3.py:778-780).
    """
    if use_flash is None:
        use_flash = (
            jax.default_backend() == "tpu"
            and bias is None
            and dropout_rate == 0.0
            and q.shape[2] >= 128  # flash pays off past one query block
        )
    if use_flash and dropout_rate > 0.0:
        raise ValueError(
            "flash attention does not implement attention dropout; "
            "leave use_flash unset to fall back automatically")
    if use_flash and bias is None:
        from youku_mplug_tpu.ops import flash_attention as fa

        # flash requires a static kv_len; per-sample [B] arrays only work
        # on the reference path — fail loudly rather than mis-mask on TPU
        if kv_len is not None and not isinstance(kv_len, int):
            raise TypeError(
                "flash_attention needs a static int kv_len; got "
                f"{type(kv_len).__name__} — pass use_flash=False for "
                "per-sample lengths")
        return fa.flash_attention(
            q, k, v, causal=causal, kv_len=kv_len, scale=scale)
    return mha_reference(
        q, k, v, causal=causal, kv_len=kv_len, bias=bias, scale=scale,
        dropout_rate=dropout_rate, dropout_rng=dropout_rng)

"""LayerNorm with a forced fp32 island.

Matches the numerics contract of the reference's ``LayerNormWithForceFP32``
(reference: models/vision_transformer.py:43-75) and megatron fused LayerNorm
(modeling_distributed_gpt3.py:26-28): statistics and normalization are
computed in fp32 regardless of input dtype, result cast back.

On TPU, XLA fuses this chain into the surrounding computation; a Pallas
kernel buys nothing here (the op is bandwidth-bound and already fused).
The op carries a custom VJP so autodiff saves only ``(x, mean, rstd)``
— without it, XLA keeps multiple fp32 copies of the *widened* input
(e.g. three f32[24,16,208,2048] buffers = 1.8 GB on the flagship
decoder under save-everything rematerialization) because the naive
backward needs the fp32 cast and the normalized activation as
residuals.  The backward recomputes ``xhat`` from the stored
original-dtype input — bitwise the same value the forward used, since
the forward starts from that same cast.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _layer_norm(x, scale, bias, eps):
    y, _ = _layer_norm_fwd(x, scale, bias, eps)
    return y


def _layer_norm_fwd(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = (x32 - mean) * rstd
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype), (x, mean, rstd, scale)


def _layer_norm_bwd(eps, res, g):
    x, mean, rstd, scale = res
    g32 = g.astype(jnp.float32)
    xhat = (x.astype(jnp.float32) - mean) * rstd
    dxhat = g32 * scale.astype(jnp.float32)
    lead = tuple(range(x.ndim - 1))
    dscale = jnp.sum(g32 * xhat, axis=lead).astype(scale.dtype)
    dbias = jnp.sum(g32, axis=lead).astype(scale.dtype)
    mean_dxhat = jnp.mean(dxhat, axis=-1, keepdims=True)
    mean_dxhat_xhat = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = rstd * (dxhat - mean_dxhat - xhat * mean_dxhat_xhat)
    return dx.astype(x.dtype), dscale, dbias


_layer_norm.defvjp(_layer_norm_fwd, _layer_norm_bwd)


def layer_norm(x, scale, bias, *, eps: float = 1e-5):
    """fp32-island layernorm over the last axis; returns x.dtype."""
    return _layer_norm(x, scale, bias, eps)

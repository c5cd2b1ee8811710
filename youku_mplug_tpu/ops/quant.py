"""Int8 weight quantization for the frozen decoder (serving path).

Decode is HBM-bandwidth-bound: every generated token streams the decoder
weights once.  Storing the frozen kernels as int8 with per-output-channel
fp32 scales halves that traffic; compute stays bf16 (int8 -> bf16 convert
fuses into the matmul, and the scale multiplies the OUTPUT channel, so
the inner loop is a plain MXU dot).

Symmetric per-channel quantization: scale = absmax / 127 along the
reduction (input) axis; error is ~0.4% RMS on normal-ish weights, well
inside bf16 decode noise for a frozen model.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp


def quantize_int8(w: jax.Array, reduce_axes) -> Tuple[jax.Array, jax.Array]:
    """-> (q int8 same shape, scale fp32 with reduce_axes collapsed to 1).

    ``reduce_axes``: the axes contracted in the matmul (one scale per
    output channel keeps y = (x @ q) * scale exact up to rounding).
    """
    if isinstance(reduce_axes, int):
        reduce_axes = (reduce_axes,)
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=tuple(reduce_axes), keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize(q: jax.Array, scale: jax.Array, dtype=jnp.bfloat16):
    return (q.astype(jnp.float32) * scale).astype(dtype)


# decoder kernel -> matmul reduction axes (see models/gpt3.py shapes)
_GPT3_REDUCE_AXES = {
    "qkv_kernel": (0,),        # [H, 3, n, d] contracts H
    "out_kernel": (0, 1),      # [n, d, H] contracts n, d
    "fc1_kernel": (0,),        # [H, F]
    "fc2_kernel": (0,),        # [F, H]
}


def quantize_gpt3_decoder(params: Any,
                          include_embedding: bool = False) -> Tuple[Any, Any]:
    """Quantize a GPT3LM param tree's big kernels to int8.

    Returns (q_params, scales): q_params has the same structure with
    int8 kernel leaves (layernorms / biases stay as-is); scales mirrors
    the quantized leaves only.  Works on both scanned ([L, ...]) and
    unrolled layouts — the leading scan dim is never a reduction axis,
    so axes shift by the rank difference.

    include_embedding additionally quantizes the tied embedding with
    per-vocab-row scales (models/gpt3.py TiedEmbedding handles the
    dequant on lookup and scales the logits' output channels): the [V,H]
    table is streamed once per decode step by the tied logits matmul, so
    this halves another ~V*H bytes of per-token HBM traffic.  Off by
    default — unlike the matmul kernels the embedding feeds every layer,
    so enable it for serving, not for frozen-decoder training.
    """
    import jax.tree_util as jtu

    flat = jtu.tree_flatten_with_path(params)[0]
    q_out, s_out = {}, {}

    base_ranks = {"qkv_kernel": 4, "out_kernel": 3,
                  "fc1_kernel": 2, "fc2_kernel": 2}
    reduce_axes = dict(_GPT3_REDUCE_AXES)
    if include_embedding:
        reduce_axes["embedding"] = (1,)  # [V, H] contracts H in logits
        base_ranks["embedding"] = 2

    def assign(tree, path, leaf):
        node = tree
        keys = [getattr(p, "key", None) or str(getattr(p, "idx", p))
                for p in path]
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = leaf

    for path, leaf in flat:
        name = getattr(path[-1], "key", str(path[-1]))
        axes = reduce_axes.get(name)
        if axes is not None and leaf.ndim >= len(axes) + 1:
            shift = leaf.ndim - base_ranks[name]  # scan dim(s)
            q, scale = quantize_int8(
                leaf, tuple(a + shift for a in axes))
            assign(q_out, path, q)
            assign(s_out, path, scale)
        else:
            assign(q_out, path, leaf)
    return q_out, s_out


def decoder_bytes(params: Any) -> int:
    """HBM bytes the decoder weights occupy (for roofline math)."""
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))

"""Quantized (int8) KV-cache helpers shared by the GPT-3 and Bloom
decoders.

The decode hot loop streams the whole KV cache from HBM every step; at
batch 8 / max_len 512 / 1.3B that is ~0.8 GB/step of bf16 K/V next to
~1.3 GB of int8 weights (BENCHLOG round-4 decode table: plain decode
sits at 0.42 of the int8 weight-stream roofline because cache reads and
dequant entered the floor).  Storing K/V as int8 with per-(token, head)
symmetric scales halves that traffic and doubles the context a 16 GB
chip can hold, at ~0.4% RMS quantization error — the same granularity
production serving stacks use for 8-bit KV.

Layout: the packed interleaved cache row [K | V] (2*n*d lanes, see
ops/decode_attention.py) quantizes per HEAD — each head's d lanes share
one scale — so the side array is [..., M, 2*n] fp32: +3% memory at
d = 128, and the in-kernel dequant folds into the existing score /
probability tiles as one [block_k, n] elementwise multiply each (the
per-row scale commutes with the segment-reduce matmul).

A quantized cache is the pytree ``{"kv": int8 [..., M, 2*n*d],
"scale": f32 [..., M, 2*n]}``; every consumer (engine slot slicing,
beam gather, scan carries) already moves caches with ``jax.tree.map``
so the dict threads through unchanged.  The reference has no analog
(fp16 python-dict buffers, modeling_distributed_gpt3.py:1446-1473).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SCALE_EPS = 1e-8


def is_quantized(cache) -> bool:
    return isinstance(cache, dict)


def cache_width(cache, axis: int = 2) -> int:
    """Static M (token capacity): axis 2 of a stacked [L, B, M, ...]
    cache, axis 1 of a per-layer [B, M, ...] slice."""
    return (cache["kv"] if is_quantized(cache) else cache).shape[axis]


def make_cache(num_layers: int, batch: int, max_len: int, hidden: int,
               num_heads: int, dtype, quantized: bool):
    """Fresh packed interleaved cache ([L, B, M, 2*H]); int8 + per-head
    scales when ``quantized``."""
    if not quantized:
        return jnp.zeros((num_layers, batch, max_len, 2 * hidden), dtype)
    return {
        "kv": jnp.zeros((num_layers, batch, max_len, 2 * hidden),
                        jnp.int8),
        "scale": jnp.zeros((num_layers, batch, max_len, 2 * num_heads),
                           jnp.float32),
    }


def quantize_rows(kvp, n: int):
    """[B, S, 2*n*d] float K|V rows -> (int8 rows, f32 scales [B, S, 2*n]).

    Symmetric per-head absmax: each head's d lanes share one scale.
    """
    b, s, nd2 = kvp.shape
    d = nd2 // (2 * n)
    g = kvp.reshape(b, s, 2 * n, d).astype(jnp.float32)
    amax = jnp.max(jnp.abs(g), axis=-1)                     # [B, S, 2n]
    scale = jnp.maximum(amax, SCALE_EPS) / 127.0
    q = jnp.clip(jnp.round(g / scale[..., None]), -127, 127)
    return q.astype(jnp.int8).reshape(b, s, nd2), scale


def dequantize_rows(kv_rows, scales, n: int, dtype):
    """Inverse of :func:`quantize_rows` on [..., M, 2*n*d] int8 rows with
    [..., M, 2*n] scales."""
    shape = kv_rows.shape
    d = shape[-1] // (2 * n)
    g = kv_rows.reshape(shape[:-1] + (2 * n, d)).astype(jnp.float32)
    out = g * scales[..., None]
    return out.reshape(shape).astype(dtype)


def _write_rows(c, rows, lidx, idx, per_sample: bool):
    """One leaf's row write: c [L, B, M, W] (stacked; lidx scalar) or
    [B, M, W]; rows [B, S, W].  per_sample: idx is [B] (continuous
    batching — per-sample fori_loop of row writes; a vmap'd DUS lowers
    to a layout-transposing scatter, see gpt3.py decode comments)."""
    if per_sample:
        def wr(bi, cc):
            row = jax.lax.dynamic_slice_in_dim(rows, bi, 1, axis=0)
            if lidx is not None:
                return jax.lax.dynamic_update_slice(
                    cc, row[None], (lidx, bi, idx[bi], 0))
            return jax.lax.dynamic_update_slice(cc, row, (bi, idx[bi], 0))
        return jax.lax.fori_loop(0, rows.shape[0], wr, c)
    if lidx is not None:
        return jax.lax.dynamic_update_slice(c, rows[None],
                                            (lidx, 0, idx, 0))
    return jax.lax.dynamic_update_slice(c, rows, (0, idx, 0))


def cache_write(cache, kvp, n: int, idx, lidx=None):
    """Write this chunk's K|V rows (kvp [B, S, 2*n*d] float) at ``idx``
    (scalar, or [B] per-sample positions) into layer ``lidx`` (None:
    cache is already the layer slice).  Quantizes on the way in when the
    cache is int8.  Returns the updated cache (same pytree form)."""
    per_sample = jnp.ndim(idx) == 1
    if is_quantized(cache):
        rows_kv, rows_sc = quantize_rows(kvp, n)
        return {
            "kv": _write_rows(cache["kv"], rows_kv, lidx, idx, per_sample),
            "scale": _write_rows(
                cache["scale"], rows_sc.astype(cache["scale"].dtype),
                lidx, idx, per_sample),
        }
    return _write_rows(cache, kvp.astype(cache.dtype), lidx, idx,
                       per_sample)


def layer_slice(cache, lidx):
    """[L, ...] stacked cache -> layer ``lidx``'s slice (same form)."""
    take = lambda c: jax.lax.dynamic_index_in_dim(c, lidx, 0,
                                                  keepdims=False)
    if is_quantized(cache):
        return {"kv": take(cache["kv"]), "scale": take(cache["scale"])}
    return take(cache)


def layer_dequant(layer_cache, n: int, dtype):
    """Layer cache slice -> float [B, M, 2*n*d] rows (the XLA fallback /
    prefill read path; the pallas decode kernel instead dequantizes
    per-block in VMEM — ops/decode_attention.py)."""
    if is_quantized(layer_cache):
        return dequantize_rows(layer_cache["kv"], layer_cache["scale"],
                               n, dtype)
    return layer_cache

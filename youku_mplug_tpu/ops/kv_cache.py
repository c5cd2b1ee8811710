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

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


def _scatter_align(dtype) -> int:
    # minimum legal second-minor block size on TPU (Mosaic tile sublanes)
    return {1: 32, 2: 16, 4: 8}[jnp.dtype(dtype).itemsize]


def _scatter_kernel(meta_ref, *rest, leaves, aligns):
    # rest = (row refs x leaves, aliased cache-in refs x leaves,
    #         cache-out refs x leaves).  Blocks are ALIGN-row windows of
    #         the cache (single-row blocks at dynamic offsets are not
    #         legal TPU block shapes): read the old window through the
    #         alias, merge the new row in with an iota mask, write back.
    bi = pl.program_id(0)
    idx = meta_ref[1 + bi]
    for i in range(leaves):
        a = aligns[i]
        row = rest[i][0]                                  # [1, W]
        old = rest[leaves + i][0, 0]                      # [a, W]
        r = idx - (idx // a) * a
        mask = jax.lax.broadcasted_iota(jnp.int32, (a, 1), 0) == r
        rest[2 * leaves + i][0, 0] = jnp.where(mask, row, old)


def cache_scatter_write(ckv, rows_kv, idx, lidx, csc=None, rows_sc=None,
                        *, interpret: bool = False):
    """Per-sample single-row cache write as ONE pallas kernel (in place).

    The XLA fallback for continuous-batching writes is a fori_loop of
    per-sample dynamic_update_slices — 16 while-loop iterations per leaf
    per layer per decode step (24 layers x 2 leaves = 768 serialized
    tiny updates at 1.3B int8-KV; the measured ~0.6 ms/step gap between
    the int8- and bf16-KV engine paths, BENCHLOG round-4).  Here the
    batch rides the pallas grid and each sample's row lands at
    ``(lidx, b, idx[b])`` through a scalar-prefetched out index map,
    with ``input_output_aliases`` making the write in place: one kernel
    launch per layer regardless of batch.  Writes move the tile-aligned
    row window around ``idx[b]`` (read old window -> mask-merge row ->
    write back; ~16-64 KB per sample per layer, noise next to the
    GB-scale decode streams).

    ckv: stacked cache [L, B, M, W] (any dtype); rows_kv: [B, W] rows
    ALREADY in the cache dtype; idx: [B] int32 row positions; lidx:
    scalar layer.  Optional second leaf (int8 caches): csc
    [L, B, M, 2n] f32 + rows_sc [B, 2n].  Returns the updated cache
    leaf (or (ckv, csc) when scales ride along).
    """
    _, bsz, m, w = ckv.shape
    assert rows_kv.shape == (bsz, w), (rows_kv.shape, ckv.shape)
    assert rows_kv.dtype == ckv.dtype, (rows_kv.dtype, ckv.dtype)
    meta = jnp.concatenate([
        jnp.asarray(lidx, jnp.int32).reshape(1),
        jnp.asarray(idx, jnp.int32).reshape(-1),
    ])

    def row_spec(_w):
        # rows ride as [B, 1, W] with one (1, 1, W) block per grid step:
        # a static per-step window (Mosaic rejects dynamic sublane
        # offsets in an in-kernel row slice)
        return pl.BlockSpec((1, 1, _w), lambda b, m: (b, 0, 0))

    def cache_spec(_a, _w):
        return pl.BlockSpec(
            (1, 1, _a, _w),
            lambda b, m, _a=_a: (m[0], b, m[1 + b] // _a, 0))

    leaves = 1 if csc is None else 2
    aligns = [_scatter_align(ckv.dtype)]
    in_specs = [row_spec(w)]
    out_shape = [jax.ShapeDtypeStruct(ckv.shape, ckv.dtype)]
    out_specs = [cache_spec(aligns[0], w)]
    operands = [rows_kv[:, None]]
    if csc is not None:
        ws = csc.shape[-1]
        assert rows_sc.shape == (bsz, ws), (rows_sc.shape, csc.shape)
        aligns.append(_scatter_align(csc.dtype))
        in_specs.append(row_spec(ws))
        out_shape.append(jax.ShapeDtypeStruct(csc.shape, csc.dtype))
        out_specs.append(cache_spec(aligns[1], ws))
        operands.append(rows_sc.astype(csc.dtype)[:, None])
    assert all(m % a == 0 for a in aligns), (m, aligns)
    in_specs += out_specs  # aliased cache operands fetch the same blocks
    operands += [ckv] + ([csc] if csc is not None else [])
    # flattened-input indices include the scalar-prefetch operand (meta=0)
    aliases = {1 + leaves + i: i for i in range(leaves)}
    out = pl.pallas_call(
        functools.partial(_scatter_kernel, leaves=leaves,
                          aligns=tuple(aligns)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(bsz,),
            in_specs=in_specs, out_specs=out_specs),
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=0, transcendentals=0,
            bytes_accessed=int(2 * sum(r.size * r.dtype.itemsize
                                       for r in operands[:leaves]))),
        interpret=interpret,
    )(meta, *operands)
    return out[0] if csc is None else tuple(out)


def _use_scatter_write(cache) -> bool:
    # "auto" (default): scatter only for quantized caches, where the
    # hardware A/B favors it (int8 pair 2.1 vs 3.3 us/write at B=16;
    # the single-leaf bf16 fallback is already faster than a launch,
    # 1.6 vs 2.2 us).  "all": every per-sample write; "0": never.
    flag = os.environ.get("YMT_SCATTER_WRITE", "auto")
    if flag == "0" or jax.default_backend() != "tpu":
        return False
    if flag != "all" and not is_quantized(cache):
        return False
    # the window blocks need the cache length to be a multiple of each
    # leaf's sublane tile (serving caches are >=128; tiny test caches
    # fall back to the loop)
    leaves = ([cache["kv"], cache["scale"]] if is_quantized(cache)
              else [cache])
    return all(c.shape[-2] % _scatter_align(c.dtype) == 0 for c in leaves)


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


def _write_rows_quant(ckv, csc, rkv, rsc, lidx, idx, per_sample: bool):
    """Both int8-cache leaves in ONE fori_loop (halves the serialized
    while-loop iterations of the per-sample XLA fallback)."""
    if not per_sample:
        return (_write_rows(ckv, rkv, lidx, idx, False),
                _write_rows(csc, rsc, lidx, idx, False))

    def wr(bi, carry):
        ck, cs = carry
        rowk = jax.lax.dynamic_slice_in_dim(rkv, bi, 1, axis=0)
        rows = jax.lax.dynamic_slice_in_dim(rsc, bi, 1, axis=0)
        if lidx is not None:
            ck = jax.lax.dynamic_update_slice(ck, rowk[None],
                                              (lidx, bi, idx[bi], 0))
            cs = jax.lax.dynamic_update_slice(cs, rows[None],
                                              (lidx, bi, idx[bi], 0))
        else:
            ck = jax.lax.dynamic_update_slice(ck, rowk, (bi, idx[bi], 0))
            cs = jax.lax.dynamic_update_slice(cs, rows, (bi, idx[bi], 0))
        return ck, cs

    return jax.lax.fori_loop(0, rkv.shape[0], wr, (ckv, csc))


def cache_write(cache, kvp, n: int, idx, lidx=None):
    """Write this chunk's K|V rows (kvp [B, S, 2*n*d] float) at ``idx``
    (scalar, or [B] per-sample positions) into layer ``lidx`` (None:
    cache is already the layer slice).  Quantizes on the way in when the
    cache is int8.  Returns the updated cache (same pytree form).

    Per-sample single-token writes into a stacked cache (the
    continuous-batching decode hot path) go through the pallas scatter
    kernel (:func:`cache_scatter_write`) on TPU — one launch per layer
    instead of a while loop of per-sample dynamic updates."""
    per_sample = jnp.ndim(idx) == 1
    scatter = (per_sample and kvp.shape[1] == 1 and lidx is not None
               and _use_scatter_write(cache))
    if is_quantized(cache):
        rows_kv, rows_sc = quantize_rows(kvp, n)
        rows_sc = rows_sc.astype(cache["scale"].dtype)
        if scatter:
            ckv, csc = cache_scatter_write(
                cache["kv"], rows_kv[:, 0], idx, lidx,
                csc=cache["scale"], rows_sc=rows_sc[:, 0])
            return {"kv": ckv, "scale": csc}
        ckv, csc = _write_rows_quant(cache["kv"], cache["scale"], rows_kv,
                                     rows_sc, lidx, idx, per_sample)
        return {"kv": ckv, "scale": csc}
    rows = kvp.astype(cache.dtype)
    if scatter:
        return cache_scatter_write(cache, rows[:, 0], idx, lidx)
    return _write_rows(cache, rows, lidx, idx, per_sample)


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

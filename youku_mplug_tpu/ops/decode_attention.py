"""Pallas TPU decode attention over the stacked packed KV cache, in place.

The decode hot loop (models/gpt3.py decode scan) threads the FULL stacked
cache through the layer scan as a carry, in the *packed interleaved*
layout ``[L, B, M, 2*n*d]`` with each row = [K | V] lanes — the
no-head-transpose layout of the packed flash kernel
(ops/flash_attention.py), with K and V fused into one row because the
qkv projection already emits them adjacently: a decode step writes the
new token's K AND V as ONE contiguous [B, 1, 2*n*d] slice of the qkv
output, and this kernel streams both with a single DMA per block
(a [B, n, M, d] cache would waste half of every 128-lane VMEM tile at
d=64, need a scatter per write, and issue twice the DMAs).

Before this kernel, every layer had to materialize its cache slice with
``dynamic_index_in_dim(cache, layer_idx)`` — a [B, M, n*d] gather copy
of K and V per layer per token, tripling decode attention HBM traffic
(read slice + write copy + dot re-reads copy; measured ~3x the K/V
floor, BENCHLOG round-2 decode table).  The reference instead keeps
per-layer python-dict buffers (InferenceParams,
modeling_distributed_gpt3.py:1446-1473), which a jittable scan cannot.

Here the layer index rides scalar prefetch, so the BlockSpec index maps
address layer ``layer_idx``'s key/value blocks directly in the stacked
HBM array.  Cells are blocked over the batch (``bb`` samples per cell)
to amortize per-cell fixed costs, and per-sample sequence lengths bound
the streaming: key blocks entirely outside the cell's live range
``[min valid_from, max cache_len]`` are never fetched (the index map
clamps to the last live block; Pallas skips the DMA when a block index
repeats).  Short sequences in a continuous-batching slot pool
(serving/engine.py) therefore cost their true length, not the static
cache width.

Per-head score math without unpacking heads: with q packed [1, n*d],
scores for ALL heads of one sample are (k * q) @ S — one elementwise
multiply plus one MXU matmul against the constant 0/1 segment matrix
S [n*d, n] that sums each head's d lanes; probabilities broadcast back
to packed lanes through its transpose, and the row reductions also run
on the MXU (ones-vector contractions).  fp32 online softmax; keys at
positions ``valid_from[b] <= j <= cache_len[b]`` attend (the new token's
K/V row is written at ``cache_len[b]`` by the caller before the kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _kernel(meta_ref, q_ref, kv_ref, *rest, block_k, scale, n, bb, nb,
            alibi_slopes=None, quantized=False):
    if quantized:
        # int8 cache: per-(token, head) dequant scales ride as a fourth
        # operand (ops/kv_cache.py layout).  The per-row-per-head scale
        # commutes with the segment-reduce matmuls, so dequant is one
        # [block_k, n] elementwise multiply on the score tile (K) and
        # one on the probability tile (V) — the int8 rows never expand
        # to float in VMEM.
        sc_ref, o_ref, acc_ref, m_ref, l_ref = rest
    else:
        sc_ref = None
        o_ref, acc_ref, m_ref, l_ref = rest
    bi = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    nd = q_ref.shape[1]
    d = nd // n

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    # constant 0/1 segment matrices (iota-built, no runtime transpose):
    # reduce [.., nd] -> [.., n]: X @ seg_nd_n sums each head's d lanes;
    # expand [.., n] -> [.., nd]: X @ seg_n_nd replicates per-head scalars
    seg_nd_n = (jax.lax.broadcasted_iota(jnp.int32, (nd, n), 0) // d
                == jax.lax.broadcasted_iota(jnp.int32, (nd, n), 1)
                ).astype(jnp.float32)
    seg_n_nd = (jax.lax.broadcasted_iota(jnp.int32, (n, nd), 0)
                == jax.lax.broadcasted_iota(jnp.int32, (n, nd), 1) // d
                ).astype(jnp.float32)
    ones_row = jnp.ones((1, block_k), jnp.float32)
    ki_col = j * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_k, n), 0)  # key positions down the rows
    # ALiBi (Bloom decode): the slope ladder is an analytic function of
    # the head index (2^(-8(h+1)/c) with a half-step ladder past the
    # closest power of two c — models/bloom.py alibi_slopes), so the
    # per-head bias slope_h * j is generated from iota + scalar
    # constants in-register: zero extra operands, zero HBM traffic.
    # Absolute key positions are correct under front-padding by softmax
    # shift-invariance (models/bloom.py module docstring).
    alibi_row = None
    if alibi_slopes is not None:
        import math as _math

        c = 2 ** _math.floor(_math.log2(n))
        h_iota = jax.lax.broadcasted_iota(jnp.int32, (block_k, n), 1)
        hf32 = h_iota.astype(jnp.float32)
        expo = jnp.where(h_iota < c, -8.0 * (hf32 + 1.0) / c,
                         -4.0 * (1.0 + 2.0 * (hf32 - c)) / c)
        slope_row = jnp.exp2(expo)                        # [bk, n]
        alibi_row = slope_row * ki_col.astype(jnp.float32)

    for t in range(bb):  # static unroll over the cell's samples
        clen = meta_ref[1 + bi * bb + t]
        vfrom = meta_ref[1 + nb + bi * bb + t]
        live = (j * block_k <= clen) & ((j + 1) * block_k > vfrom)

        @pl.when(live)
        def _compute(t=t, clen=clen, vfrom=vfrom):
            q2 = q_ref[pl.ds(t, 1), :].astype(jnp.float32)   # [1, nd]
            kk = kv_ref[0, t, :, :nd].astype(jnp.float32)    # [bk, nd]
            # per-head scores for all heads in one segment-reduce matmul:
            # (kk * q) @ seg -> s[r, h] = q_h . k_h(row r)
            s = jax.lax.dot_general(
                kk * q2, seg_nd_n, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # [bk, n]
            if sc_ref is not None:
                s = s * sc_ref[0, t, :, :n]       # K dequant, [bk, n]
            if alibi_row is not None:
                s = s + alibi_row
            allowed = (ki_col <= clen) & (ki_col >= vfrom)
            s = jnp.where(allowed, s, NEG_INF)
            m_prev = m_ref[pl.ds(t, 1), :]                   # [1, n]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=0, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)                  # [1, n]
            p = jnp.where(allowed, jnp.exp(s - m_new), 0.0)  # [bk, n]
            l_sum = jax.lax.dot_general(                     # [1, n]
                ones_row, p, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            l_ref[pl.ds(t, 1), :] = l_ref[pl.ds(t, 1), :] * alpha + l_sum
            # broadcast p to packed lanes, weight V, reduce rows on MXU;
            # V dequant folds into p first (same per-head commutation)
            pq = p if sc_ref is None else p * sc_ref[0, t, :, n:]
            p_exp = jax.lax.dot_general(                     # [bk, nd]
                pq, seg_n_nd, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            vv = kv_ref[0, t, :, nd:].astype(jnp.float32)    # [bk, nd]
            pv = jax.lax.dot_general(                        # [1, nd]
                ones_row, p_exp * vv, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            alpha_exp = jax.lax.dot_general(                 # [1, nd]
                alpha, seg_n_nd, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[pl.ds(t, 1), :] = (
                acc_ref[pl.ds(t, 1), :] * alpha_exp + pv)
            m_ref[pl.ds(t, 1), :] = m_new

    @pl.when(j == nj - 1)
    def _finish():
        l = jnp.maximum(l_ref[...], 1e-30)                   # [bb, n]
        l_exp = jax.lax.dot_general(
            l, seg_n_nd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [bb, nd]
        o_ref[...] = (acc_ref[...] / l_exp).astype(o_ref.dtype)


def _pick_geometry(bsz: int, m: int, nd: int, itemsize: int,
                   vmem_budget: int = 8 * 1024 * 1024):
    """-> (bb, block_k): samples per cell and key-block rows, sized so
    double-buffered K+V blocks fit the VMEM budget."""
    for bb in (8, 4, 2, 1):
        if bsz % bb:
            continue
        for bk in (512, 256, 128, 64):
            if m % bk:
                continue
            if 4 * bb * bk * nd * itemsize <= vmem_budget:
                return bb, bk
    return 1, 64


def decode_attention_supported(m: int) -> bool:
    return m % 64 == 0


def decode_attention(q, ckv, n_heads, layer_idx, cache_len,
                     valid_from=None, *, scale=None,
                     alibi_slopes=None, kv_scales=None,
                     interpret: bool = False):
    """Single-token attention against layer ``layer_idx`` of the stacked
    packed interleaved cache, read in place.

    q: [B, n*d] packed; ckv: [L, B, M, 2*n*d] with each row = [K | V]
    lanes (written as one contiguous slice of the qkv projection),
    M % 64 == 0; n_heads: head count n; layer_idx: scalar int;
    cache_len: scalar or [B] (query position — keys at <= cache_len
    attend); valid_from: optional [B] (front-padding mask,
    generation._build_prefix); alibi_slopes: optional [n] per-head ALiBi
    slopes (Bloom), folded into the score tile as compile-time
    constants; kv_scales: optional [L, B, M, 2*n] f32 per-(token, head)
    dequant scales for an int8 ``ckv`` (ops/kv_cache.py).  Returns
    [B, n*d] in q.dtype.
    """
    _, bsz, m, nd2 = ckv.shape
    nd = nd2 // 2
    n = n_heads
    assert q.shape == (bsz, nd), (q.shape, ckv.shape)
    assert m % 64 == 0, f"cache width {m} must be a multiple of 64"
    assert nd % n == 0
    if scale is None:
        scale = (nd // n) ** -0.5

    cache_len = jnp.broadcast_to(
        jnp.asarray(cache_len, jnp.int32).reshape(-1), (bsz,))
    if valid_from is None:
        valid_from = jnp.zeros((bsz,), jnp.int32)
    meta = jnp.concatenate([
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        cache_len.astype(jnp.int32),
        valid_from.astype(jnp.int32),
    ])

    quantized = kv_scales is not None
    if quantized:
        assert ckv.dtype == jnp.int8, ckv.dtype
        assert kv_scales.shape == ckv.shape[:3] + (2 * n,), kv_scales.shape
    bb, block_k = _pick_geometry(bsz, m, nd, ckv.dtype.itemsize)
    nj = m // block_k

    def kv_index(bi, j, meta_ref):
        # clamp to the cell's live block range so out-of-range grid steps
        # repeat the previous block index and Pallas skips the DMA
        lo = meta_ref[1 + bsz + bi * bb]
        hi = meta_ref[1 + bi * bb]
        for t in range(1, bb):
            lo = jnp.minimum(lo, meta_ref[1 + bsz + bi * bb + t])
            hi = jnp.maximum(hi, meta_ref[1 + bi * bb + t])
        return (meta_ref[0], bi, jnp.clip(j, lo // block_k, hi // block_k),
                0)

    in_specs = [
        pl.BlockSpec((bb, nd), lambda bi, j, meta_ref: (bi, 0)),
        pl.BlockSpec((1, bb, block_k, nd2), kv_index),
    ]
    if quantized:
        in_specs.append(pl.BlockSpec((1, bb, block_k, 2 * n), kv_index))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz // bb, nj),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, nd), lambda bi, j, meta_ref: (bi, 0)),
        scratch_shapes=[
            pltpu.VMEM((bb, nd), jnp.float32),
            pltpu.VMEM((bb, n), jnp.float32),
            pltpu.VMEM((bb, n), jnp.float32),
        ],
    )
    if alibi_slopes is not None:
        alibi_slopes = tuple(float(s) for s in np.asarray(alibi_slopes))
        assert len(alibi_slopes) == n
        # the kernel regenerates the ladder analytically from the head
        # index — verify the caller's slopes ARE that ladder
        from youku_mplug_tpu.models.bloom import alibi_slopes as _ladder

        assert np.allclose(alibi_slopes, _ladder(n), rtol=1e-6), \
            "decode_attention only supports the standard ALiBi ladder"
    operands = (meta, q, ckv) + ((kv_scales,) if quantized else ())
    return pl.pallas_call(
        functools.partial(_kernel, block_k=block_k, scale=scale, n=n,
                          bb=bb, nb=bsz, alibi_slopes=alibi_slopes,
                          quantized=quantized),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, nd), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * bsz * m * nd),
            bytes_accessed=int(bsz * m * nd2 * ckv.dtype.itemsize
                               + (bsz * m * 2 * n * 4 if quantized else 0)),
            transcendentals=int(bsz * m * n),
        ),
        interpret=interpret,
    )(*operands)

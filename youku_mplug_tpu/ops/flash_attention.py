"""Pallas TPU flash attention (forward + backward), fp32 softmax island.

The TPU-native replacement for the reference's fused CUDA attention path
(megatron ``FusedScaleMaskSoftmax`` + preallocated ``baddbmm`` buffers,
reference: modeling_distributed_gpt3.py:689-817) and the vision encoder's
``qk_float`` attention (vision_transformer.py:165-207): an online-softmax
kernel that never materializes the [Sq, Sk] score matrix in HBM, with the
softmax accumulated in fp32 (the reference's numerics contract — its
per-layer query-key scaling trick cancels mathematically and exists only to
keep fp16 in range; bf16+fp32-softmax needs no such trick).

Layout: q, k, v are [B, H, S, D].  Sq == Sk is required when causal=True
(always the case here: full-sequence decoder training and vision encoding).
Sequences are padded to block multiples by the wrapper; padded *keys* are
masked via a static `kv_len`, padded query rows are sliced off.

Backward follows the standard FlashAttention-2 recipe: recompute p from
(q, k, lse); dq in one kernel (grid over q blocks), dk/dv in another (grid
over k blocks), all accumulation in fp32.

MXU dtype discipline: every dot keeps its operands in the INPUT dtype and
accumulates in fp32 (``preferred_element_type``).  Upcasting bf16 operands
to fp32 before the dot — the naive reading of the reference's ``qk_float``
contract — is mathematically identical for QK (bf16 x bf16 products are
exact in fp32: 8-bit mantissas) but forces Mosaic onto the multi-pass fp32
MXU path, measured ~3x slower than bf16 passes on v5e.  The probability
and dScore matrices are cast back to the input dtype before their dots
(the standard FlashAttention recipe on every accelerator); softmax, lse,
delta and all accumulators stay fp32.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _pick_block(s: int, preferred: int = 512) -> int:
    """Largest multiple-of-128 block <= preferred that tiles s (s % 128 == 0)."""
    for b in (preferred, 256, 128):
        if s % b == 0:
            return b
    return 128


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, causal,
                kv_len, block_k):
    bq = q_ref.shape[2]
    d = q_ref.shape[3]
    sk = k_ref.shape[2]
    i = pl.program_id(2)
    n_kv = sk // block_k

    q = q_ref[0, 0]  # [bq, d], input dtype (fp32 accumulation via the dots)

    if causal:
        # Skip key blocks strictly above the diagonal for this query block.
        hi = jax.lax.div((i + 1) * bq + block_k - 1, block_k)
        hi = jnp.minimum(hi, n_kv)
    else:
        hi = n_kv

    def body(j, carry):
        acc, m, l = carry
        k = k_ref[0, 0, pl.ds(j * block_k, block_k), :]
        v = v_ref[0, 0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [bq, bk]
        ki = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (bq, block_k), 1)
        if causal:
            qi = i * bq + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), 0)
            s = jnp.where(qi >= ki, s, NEG_INF)
        if kv_len is not None and kv_len < sk:
            s = jnp.where(ki < kv_len, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc * alpha + pv
        return acc, m_new, l

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, hi, body, (acc0, m0, l0))

    l = jnp.maximum(l, 1e-30)
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0, 0] = m + jnp.log(l)  # [bq, 1]


def _fwd(q, k, v, *, scale, causal, kv_len, block_q, block_k):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    grid = (b, h, sq // block_q)
    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=scale, causal=causal, kv_len=kv_len,
            block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i: (b_, h_, i, 0)),
            pl.BlockSpec((1, 1, sk, d), lambda b_, h_, i: (b_, h_, 0, 0)),
            pl.BlockSpec((1, 1, sk, d), lambda b_, h_, i: (b_, h_, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i: (b_, h_, i, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b_, h_, i: (b_, h_, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, sq, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(4 * b * h * sq * sk * d * (0.5 if causal else 1.0)),
            bytes_accessed=int((q.size + k.size + v.size + q.size)
                               * q.dtype.itemsize),
            transcendentals=int(b * h * sq * sk),
        ),
    )(q, k, v)
    return out, lse


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   *, scale, causal, kv_len, block_k):
    bq = q_ref.shape[2]
    d = q_ref.shape[3]
    sk = k_ref.shape[2]
    i = pl.program_id(2)
    n_kv = sk // block_k

    q = q_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0]      # [bq, 1]
    delta = delta_ref[0, 0]  # [bq, 1]

    if causal:
        hi = jax.lax.div((i + 1) * bq + block_k - 1, block_k)
        hi = jnp.minimum(hi, n_kv)
    else:
        hi = n_kv

    def body(j, dq):
        k = k_ref[0, 0, pl.ds(j * block_k, block_k), :]
        v = v_ref[0, 0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        ki = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (bq, block_k), 1)
        if causal:
            qi = i * bq + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), 0)
            s = jnp.where(qi >= ki, s, NEG_INF)
        if kv_len is not None and kv_len < sk:
            s = jnp.where(ki < kv_len, s, NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        dq = dq + jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dq

    dq = jax.lax.fori_loop(0, hi, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, scale, causal, kv_len, block_q):
    bk = k_ref.shape[2]
    d = k_ref.shape[3]
    sq = q_ref.shape[2]
    j = pl.program_id(2)
    n_q = sq // block_q

    k = k_ref[0, 0]
    v = v_ref[0, 0]

    if causal:
        lo = jax.lax.div(j * bk, block_q)
    else:
        lo = 0

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, 0, pl.ds(i * block_q, block_q), :]
        do = do_ref[0, 0, pl.ds(i * block_q, block_q), :]
        lse = lse_ref[0, 0, pl.ds(i * block_q, block_q), :]
        delta = delta_ref[0, 0, pl.ds(i * block_q, block_q), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [bq, bk]
        ki = j * bk + jax.lax.broadcasted_iota(jnp.int32, (block_q, bk), 1)
        if causal:
            qi = i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, bk), 0)
            s = jnp.where(qi >= ki, s, NEG_INF)
        if kv_len is not None and kv_len < k_ref.shape[2] * pl.num_programs(2):
            s = jnp.where(ki < kv_len, s, NEG_INF)
        p = jnp.exp(s - lse)
        dv = dv + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        dk = dk + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk, dv

    dk0 = jnp.zeros((bk, d), jnp.float32)
    dv0 = jnp.zeros((bk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(lo, n_q, body, (dk0, dv0))
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _bwd(scale, causal, kv_len, block_q, block_k, res, g):
    q, k, v, out, lse = res
    b, h, sq, d = q.shape
    sk = k.shape[2]
    do = g
    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1,
        keepdims=True)  # [B,H,Sq,1]

    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, scale=scale, causal=causal, kv_len=kv_len,
            block_k=block_k),
        grid=(b, h, sq // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i: (b_, h_, i, 0)),
            pl.BlockSpec((1, 1, sk, d), lambda b_, h_, i: (b_, h_, 0, 0)),
            pl.BlockSpec((1, 1, sk, d), lambda b_, h_, i: (b_, h_, 0, 0)),
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i: (b_, h_, i, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b_, h_, i: (b_, h_, i, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b_, h_, i: (b_, h_, i, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda b_, h_, i: (b_, h_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
    )(q, k, v, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, scale=scale, causal=causal, kv_len=kv_len,
            block_q=block_q),
        grid=(b, h, sk // block_k),
        in_specs=[
            pl.BlockSpec((1, 1, sq, d), lambda b_, h_, j: (b_, h_, 0, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, j: (b_, h_, j, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, j: (b_, h_, j, 0)),
            pl.BlockSpec((1, 1, sq, d), lambda b_, h_, j: (b_, h_, 0, 0)),
            pl.BlockSpec((1, 1, sq, 1), lambda b_, h_, j: (b_, h_, 0, 0)),
            pl.BlockSpec((1, 1, sq, 1), lambda b_, h_, j: (b_, h_, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, j: (b_, h_, j, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, j: (b_, h_, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sk, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, sk, d), v.dtype),
        ],
    )(q, k, v, do, lse, delta)

    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash(q, k, v, scale, causal, kv_len, block_q, block_k):
    out, _ = _fwd(q, k, v, scale=scale, causal=causal, kv_len=kv_len,
                  block_q=block_q, block_k=block_k)
    return out


def _flash_fwd(q, k, v, scale, causal, kv_len, block_q, block_k):
    out, lse = _fwd(q, k, v, scale=scale, causal=causal, kv_len=kv_len,
                    block_q=block_q, block_k=block_k)
    from jax.ad_checkpoint import checkpoint_name
    lse = checkpoint_name(lse, "flash_lse")
    return out, (q, k, v, out, lse)


_flash.defvjp(_flash_fwd, _bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    kv_len: Optional[int] = None,
    scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 512,
) -> jax.Array:
    """Flash attention over [B, H, S, D] with automatic padding.

    ``kv_len`` (static int): true key length when k/v carry trailing padding.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, h, sq, d = q.shape
    sk = k.shape[2]
    if causal and sq != sk:
        raise ValueError("causal flash attention requires Sq == Sk")

    # No-pad fast path: Mosaic accepts block dims EQUAL to the full array
    # dims, so short ragged sequences (vision 197, decoder 208) run as one
    # whole-sequence block with zero pad/copy overhead (the padded path
    # cost ~15% of device time in traces).
    if ((sq % 128 or sk % 128) and sq * sk <= 1024 * 1024
            and kv_len is None):
        return _flash(q, k, v, float(scale), bool(causal), None, sq, sk)

    sq_pad = -(-sq // 128) * 128
    sk_pad = -(-sk // 128) * 128
    true_kv = kv_len if kv_len is not None else sk
    if sq_pad != sq or sk_pad != sk:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - sq), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))

    bq = min(_pick_block(sq_pad), block_q)
    bk = min(_pick_block(sk_pad), block_k)
    eff_kv = None if true_kv == sk_pad else true_kv

    out = _flash(q, k, v, float(scale), bool(causal), eff_kv, bq, bk)
    if sq_pad != sq:
        out = out[:, :, :sq, :]
    return out


# ---------------------------------------------------------------------------
# Packed-layout variant: q/k/v in [B, S, n_heads*d].  The BlockSpec slices a
# 128-lane strip straight out of the packed last dim, so the model never
# materializes the [B, n, S, d] transpose (the 'copy' tax in profiles).
# When d < 128 (e.g. the d=64 decoder/vision heads) a strip holds
# g = 128 // d heads; the kernel runs g independent online softmaxes over
# lane sub-slices of the strip.  Same math, same masks; lse is [B, n/g, Sq, g].
# ---------------------------------------------------------------------------


def _strip_geometry(n: int, d: int):
    """-> (g, width): heads per 128-lane strip and strip width in lanes."""
    if d % 128 == 0:
        return 1, d
    if 128 % d == 0 and n % (128 // d) == 0:
        return 128 // d, 128
    return None, None


# Cell width cap (lanes).  1024 was measured best with fp32-staged dots
# (2048 exceeded scoped VMEM at S=208); the native-dtype dots (commit
# 2f4220a) halved in-kernel staging, so wider cells may now fit —
# FLASH_MAX_WIDTH=2048 opts in for hardware A/B.
_MAX_WIDTH = int(os.environ.get("FLASH_MAX_WIDTH", "1024"))


def _cell_geometry(n: int, d: int, max_width: int = None):
    if max_width is None:
        max_width = _MAX_WIDTH
    return _cell_geometry_w(n, d, max_width)


def _cell_geometry_w(n: int, d: int, max_width: int):
    """-> (g, width) with multiple base strips packed per grid cell.

    At short S the grid cells of the one-strip kernel hold ~1us of work
    against ~2-3us of fixed per-cell overhead (DMA issue, semaphores,
    prologue) — measured 2.7-3.5us/cell on v5e at S~200, d=64.  Packing m
    strips per cell multiplies the per-cell work without changing the
    math (the kernels loop over g heads generically).  Width is capped so
    fp32 staging of q/k/v blocks fits scoped VMEM: 1024 lanes measured
    best on v5e (41.5% flagship MFU vs 41.1% at 512); 2048 exceeds the
    16 MB scoped-vmem limit at S=208."""
    g, w = _strip_geometry(n, d)
    if g is None:
        return None, None
    strips = n // g
    m = 1
    for cand in range(min(strips, max_width // w), 0, -1):
        if strips % cand == 0:
            m = cand
            break
    return g * m, w * m


def packed_supported(n_heads: int, head_dim: int) -> bool:
    """True when the packed [B,S,n*d] kernel can handle this geometry."""
    return _strip_geometry(n_heads, head_dim)[0] is not None


def _fwd_kernel_packed(*refs, scale, causal, period, block_k, g,
                       diag=False, alibi=False):
    # alibi: a leading [1, 128] slopes ref (lanes 0..g-1 hold this
    # strip's per-head ALiBi slopes); bias slope_h * key_position is
    # computed from block indices in-register — zero extra HBM traffic.
    # ALiBi implies causal (Bloom decoder), so the diag/period paths
    # never see it.
    if alibi:
        sl_ref, q_ref, k_ref, v_ref, o_ref, lse_ref = refs
    else:
        sl_ref = None
        q_ref, k_ref, v_ref, o_ref, lse_ref = refs
    # refs carry block_b samples per grid cell (batch-blocked cells: at
    # short S one sample is ~1-2 us of MXU work against ~2-3 us of fixed
    # cell overhead — same lesson as the decode kernel).
    # diag: period-aligned block-diagonal mode — the k/v refs hold ONLY
    # the q block's own diagonal kv block (period groups never straddle
    # period-aligned block boundaries), so the kv loop is one iteration
    # and global key indices are offset by i * block_k.
    block_b, bq, w = q_ref.shape
    d = w // g
    sk = k_ref.shape[1]
    i = pl.program_id(2)
    n_kv = sk // block_k
    if diag:
        hi = 1
    elif causal:
        hi = jnp.minimum(jax.lax.div((i + 1) * bq + block_k - 1, block_k),
                         n_kv)
    else:
        hi = n_kv

    for s_idx in range(block_b):
        q = q_ref[s_idx]

        def body(j, carry, q=q):
            accs, ms, ls = carry
            kk = k_ref[s_idx, pl.ds(j * block_k, block_k), :]
            vv = v_ref[s_idx, pl.ds(j * block_k, block_k), :]
            if causal or period:
                kbase = i * block_k if diag else j * block_k
                qi = i * bq + jax.lax.broadcasted_iota(jnp.int32,
                                                       (bq, block_k), 0)
                ki = kbase + jax.lax.broadcasted_iota(jnp.int32,
                                                      (bq, block_k), 1)
                mask = (qi >= ki if causal
                        else (qi // period) == (ki // period))
            accs_n, ms_n, ls_n = [], [], []
            for h in range(g):
                sl = slice(h * d, (h + 1) * d)
                s = jax.lax.dot_general(
                    q[:, sl], kk[:, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                if sl_ref is not None:
                    s = s + sl_ref[0, h] * ki.astype(jnp.float32)
                if causal or period:
                    s = jnp.where(mask, s, NEG_INF)
                m_new = jnp.maximum(ms[h], jnp.max(s, axis=1, keepdims=True))
                alpha = jnp.exp(ms[h] - m_new)
                p = jnp.exp(s - m_new)
                l_new = ls[h] * alpha + jnp.sum(p, axis=1, keepdims=True)
                pv = jax.lax.dot_general(
                    p.astype(vv.dtype), vv[:, sl], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                accs_n.append(accs[h] * alpha + pv)
                ms_n.append(m_new)
                ls_n.append(l_new)
            return tuple(accs_n), tuple(ms_n), tuple(ls_n)

        init = (tuple(jnp.zeros((bq, d), jnp.float32) for _ in range(g)),
                tuple(jnp.full((bq, 1), NEG_INF, jnp.float32)
                      for _ in range(g)),
                tuple(jnp.zeros((bq, 1), jnp.float32) for _ in range(g)))
        accs, ms, ls = jax.lax.fori_loop(0, hi, body, init)
        outs, lses = [], []
        for h in range(g):
            l = jnp.maximum(ls[h], 1e-30)
            outs.append(accs[h] / l)
            lses.append(ms[h] + jnp.log(l))
        o_ref[s_idx] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype) \
            if g > 1 else outs[0].astype(o_ref.dtype)
        lse_ref[s_idx, 0] = (jnp.concatenate(lses, axis=1)
                             if g > 1 else lses[0])


# Default: single-sample grid cells.  A/B on real TPU (2026-08-18, v5e
# via the axon relay): the batch-blocked bb=8 geometry FAILS Mosaic
# compilation (remote_compile subprocess exit 1) while single-sample
# cells compile and hit the same measured MFU (48.7%, BENCH r03) the
# batch-blocked path was built for — so batch-blocking buys nothing on
# this workload and is opt-out only (set False to re-enable the
# multi-sample VMEM-sized geometry; the kernels themselves support it
# and tests cover it in interpret mode).
# Default TRUE: the bb=8 batch-blocked geometry failed Mosaic compilation
# on the real chip at round-2 capture (with fp32-staged dots).  The
# native-dtype dots above halve in-kernel staging, so smaller bb may now
# fit — override via env for hardware A/B: FLASH_SINGLE_SAMPLE=0
# [FLASH_MAX_BLOCK_B=2|4|8].
FORCE_SINGLE_SAMPLE_CELLS = os.environ.get(
    "FLASH_SINGLE_SAMPLE", "1") == "1"
_MAX_BLOCK_B = int(os.environ.get("FLASH_MAX_BLOCK_B", "8"))


def _pick_block_b(b: int, sk: int, w: int, arrays: int) -> int:
    """Samples per grid cell: largest power-of-two divisor of b whose
    estimated VMEM residency stays under the ~16 MB scoped limit
    (VMEM is ~16 MB/core; Mosaic double-buffers the refs).

    ``arrays`` approximates how many [S, w]-sized bf16 values are live
    per sample including double-buffering and fp32 casts/accumulators:
    ~8 for the forward kernel, ~16 for the backward kernels (measured:
    the dq kernel at bb=8, S=197, w=768 allocates 33 MB ->
    ~4.1 MB/sample, i.e. ~14 bf16 arrays; 16 adds margin)."""
    if FORCE_SINGLE_SAMPLE_CELLS:
        return 1
    per_sample = sk * w * 2 * arrays
    for cand in (8, 4, 2):
        if cand > _MAX_BLOCK_B:
            continue
        if b % cand == 0 and cand * per_sample <= 12 * 1024 * 1024:
            return cand
    return 1


def _pick_period_block(sq: int, period: int) -> int:
    """Square diagonal block (sublane- and period-aligned, tiling sq)
    for the block-diagonal periodic path, or 0 for whole-sequence cells.

    DEFAULT OFF — measured on the real v5e chip (2026-08-19, flagship
    bench, grouped temporal geometry S=1568/period=8): whole-sequence
    masked cells 384.3 ms/step, diag block 224 (the old auto pick)
    422 ms, diag block 112 neutral at 384.2 ms.  The 7x kv-loop flop
    cut never pays: the op is HBM-bound (kv read traffic is unchanged)
    and one big masked MXU sweep beats 7 small diagonal cells' grid
    overhead.  FLASH_PERIOD_BLOCK=<n> opts the diag path back in for
    A/B; interpret-mode tests keep it correct."""
    env = os.environ.get("FLASH_PERIOD_BLOCK")
    if env is None:
        return 0
    b = int(env)
    return b if (0 < b < sq and sq % b == 0 and b % period == 0
                 and b % 16 == 0) else 0


def _is_diag(period, causal, block_q, block_k, sq, sk):
    """Period-aligned block-diagonal mode: with block_q == block_k a
    multiple of the period, groups never straddle block boundaries, so
    each q block only ever attends its own diagonal kv block."""
    return (period > 0 and not causal and sq == sk
            and block_q == block_k and block_q < sq
            and block_q % period == 0 and sq % block_q == 0)


# Multi-ref cell packing: amortize the ~2-3us fixed per-cell overhead at
# short S by processing m samples per grid cell — NOT via a multi-sample
# leading block dim (the bb>1 rank-3 block geometry fails Mosaic
# compilation on the real chip at every bb tried: 8 at round-2 capture,
# 2 on 2026-08-19), but via m separate singleton-lead refs over the same
# arrays with strided index maps — exactly the block geometry that
# compiles today, just m of them per cell.  FLASH_MULTI_REF=m opts in.
# Non-causal only: the causal kernel body repeated m times crashes the
# Mosaic compiler on the real chip (isolated 2026-08-19: fwd-only b=16
# n=32 s=208 causal fails, the same shape non-causal compiles+runs), so
# dispatch keeps m=1 whenever causal — the decoder path loses nothing
# (it runs ~155 TF/s; the short-S win this targets is the non-causal
# vision tower).
_MULTI_REF = int(os.environ.get("FLASH_MULTI_REF", "1"))


def _pick_multi(b: int, sk: int, w: int, arrays: int) -> int:
    """Samples per cell via the multi-ref scheme, VMEM-bounded the same
    way as _pick_block_b."""
    if _MULTI_REF <= 1:
        return 1
    per_sample = sk * w * 2 * arrays
    for cand in (min(_MULTI_REF, 8), 4, 2):
        if cand <= _MULTI_REF and b % cand == 0 and cand > 1 \
                and cand * per_sample <= 12 * 1024 * 1024:
            return cand
    return 1


def _fwd_kernel_packed_multi(*refs, scale, causal, period, block_k, g, m):
    # refs: m q, m k, m v, m o, m lse — each singleton-lead [1, ...]
    for j in range(m):
        _fwd_kernel_packed(refs[j], refs[m + j], refs[2 * m + j],
                           refs[3 * m + j], refs[4 * m + j], scale=scale,
                           causal=causal, period=period, block_k=block_k,
                           g=g)


def _interleave(parts, b):
    """m arrays holding samples j, j+m, ... -> one array in sample order."""
    m = len(parts)
    if m == 1:
        return parts[0]
    stacked = jnp.stack(parts, axis=1)  # [b//m, m, ...]
    return stacked.reshape((b,) + parts[0].shape[1:])


def _slopes_operand(alibi_slopes, n, g):
    """[n//g, 128] fp32 slopes array (lane 0..g-1 of row h_ hold strip
    h_'s per-head slopes; 128-lane padded for Mosaic tile alignment) and
    its per-strip BlockSpec."""
    sl = np.zeros((n // g, 128), np.float32)
    sl[:, :g] = np.asarray(alibi_slopes, np.float32).reshape(n // g, g)
    spec = pl.BlockSpec((1, 128), lambda b_, h_, i: (h_, 0))
    return jnp.asarray(sl), spec


def _fwd_packed(q, k, v, n, *, scale, causal, period, block_q, block_k,
                alibi_slopes=None):
    b, sq, nd = q.shape
    d = nd // n
    g, w = _cell_geometry(n, d)
    sk = k.shape[1]
    diag = _is_diag(period, causal, block_q, block_k, sq, sk)
    m = 1 if (diag or causal) else _pick_multi(b, sk, w, arrays=8)
    if m > 1:
        grid = (b // m, n // g, sq // block_q)

        def qs(j):
            return pl.BlockSpec((1, block_q, w),
                                lambda b_, h_, i, j=j: (m * b_ + j, i, h_))

        def kvs(j):
            return pl.BlockSpec((1, sk, w),
                                lambda b_, h_, i, j=j: (m * b_ + j, 0, h_))

        def ls(j):
            return pl.BlockSpec((1, 1, block_q, g),
                                lambda b_, h_, i, j=j: (b_, h_, i, 0))

        kv_work = sk * (0.5 if causal else 1.0)
        res = pl.pallas_call(
            functools.partial(_fwd_kernel_packed_multi, scale=scale,
                              causal=causal, period=period,
                              block_k=block_k, g=g, m=m),
            grid=grid,
            in_specs=[qs(j) for j in range(m)]
            + [kvs(j) for j in range(m)] * 2,
            out_specs=[pl.BlockSpec(
                (1, block_q, w), lambda b_, h_, i: (b_, i, h_))
                for _ in range(m)] + [ls(j) for j in range(m)],
            out_shape=[jax.ShapeDtypeStruct((b // m, sq, nd), q.dtype)
                       for _ in range(m)]
            + [jax.ShapeDtypeStruct((b // m, n // g, sq, g), jnp.float32)
               for _ in range(m)],
            cost_estimate=pl.CostEstimate(
                flops=int(4 * b * n * sq * d * kv_work),
                bytes_accessed=int((2 * q.size + k.size + v.size)
                                   * q.dtype.itemsize),
                transcendentals=int(b * n * sq * kv_work),
            ),
        )(*((q,) * m + (k,) * m + (v,) * m))
        return _interleave(res[:m], b), _interleave(res[m:], b)

    bb = _pick_block_b(b, block_k if diag else sk, w, arrays=8)
    grid = (b // bb, n // g, sq // block_q)
    if diag:
        # each q block reads only its own diagonal kv block
        kv_spec = pl.BlockSpec((bb, block_k, w), lambda b_, h_, i: (b_, i, h_))
    else:
        kv_spec = pl.BlockSpec((bb, sk, w), lambda b_, h_, i: (b_, 0, h_))
    kv_work = block_k if diag else (sk * (0.5 if causal else 1.0))
    extra_in, extra_specs = (), []
    if alibi_slopes is not None:
        sl, sl_spec = _slopes_operand(alibi_slopes, n, g)
        extra_in, extra_specs = (sl,), [sl_spec]
    return pl.pallas_call(
        functools.partial(_fwd_kernel_packed, scale=scale, causal=causal,
                          period=period, block_k=block_k, g=g, diag=diag,
                          alibi=alibi_slopes is not None),
        grid=grid,
        in_specs=extra_specs + [
            pl.BlockSpec((bb, block_q, w), lambda b_, h_, i: (b_, i, h_)),
            kv_spec,
            kv_spec,
        ],
        out_specs=[
            pl.BlockSpec((bb, block_q, w), lambda b_, h_, i: (b_, i, h_)),
            pl.BlockSpec((bb, 1, block_q, g),
                         lambda b_, h_, i: (b_, h_, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, sq, nd), q.dtype),
            jax.ShapeDtypeStruct((b, n // g, sq, g), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(4 * b * n * sq * d * kv_work),
            bytes_accessed=int((2 * q.size + k.size + v.size)
                               * q.dtype.itemsize),
            transcendentals=int(b * n * sq * kv_work),
        ),
    )(*extra_in, q, k, v)


def _bwd_dq_kernel_packed(*refs, scale, causal, period, block_k, g,
                          diag=False, alibi=False):
    # alibi bias is additive and independent of q/k/v, so the gradient
    # math is unchanged — only the probability reconstruction p needs
    # the same biased scores as the forward.
    if alibi:
        (sl_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dq_ref) = refs
    else:
        sl_ref = None
        q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref = refs
    block_b, bq, w = q_ref.shape
    d = w // g
    sk = k_ref.shape[1]
    i = pl.program_id(2)
    n_kv = sk // block_k
    if diag:
        hi = 1
    elif causal:
        hi = jnp.minimum(jax.lax.div((i + 1) * bq + block_k - 1, block_k),
                         n_kv)
    else:
        hi = n_kv

    for s_idx in range(block_b):
        q = q_ref[s_idx]
        do = do_ref[s_idx]
        lse = lse_ref[s_idx, 0]      # [bq, g]
        delta = delta_ref[s_idx, 0]  # [bq, g]

        def body(j, dqs, q=q, do=do, lse=lse, delta=delta):
            kk = k_ref[s_idx, pl.ds(j * block_k, block_k), :]
            vv = v_ref[s_idx, pl.ds(j * block_k, block_k), :]
            if causal or period:
                kbase = i * block_k if diag else j * block_k
                qi = i * bq + jax.lax.broadcasted_iota(jnp.int32,
                                                       (bq, block_k), 0)
                ki = kbase + jax.lax.broadcasted_iota(jnp.int32,
                                                      (bq, block_k), 1)
                mask = (qi >= ki if causal
                        else (qi // period) == (ki // period))
            out = []
            for h in range(g):
                sl = slice(h * d, (h + 1) * d)
                s = jax.lax.dot_general(
                    q[:, sl], kk[:, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                if sl_ref is not None:
                    s = s + sl_ref[0, h] * ki.astype(jnp.float32)
                if causal or period:
                    s = jnp.where(mask, s, NEG_INF)
                p = jnp.exp(s - lse[:, h:h + 1])
                dp = jax.lax.dot_general(
                    do[:, sl], vv[:, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                ds = p * (dp - delta[:, h:h + 1]) * scale
                out.append(dqs[h] + jax.lax.dot_general(
                    ds.astype(kk.dtype), kk[:, sl], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            return tuple(out)

        dqs = jax.lax.fori_loop(
            0, hi, body,
            tuple(jnp.zeros((bq, d), jnp.float32) for _ in range(g)))
        dq = jnp.concatenate(dqs, axis=1) if g > 1 else dqs[0]
        dq_ref[s_idx] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel_packed(*refs, scale, causal, period, block_q,
                           g, diag=False, alibi=False):
    if alibi:
        (sl_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dk_ref, dv_ref) = refs
    else:
        sl_ref = None
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dk_ref, dv_ref) = refs
    block_b, bk, w = k_ref.shape
    d = w // g
    sq = q_ref.shape[1]
    j = pl.program_id(2)
    n_q = sq // block_q
    if diag:
        lo, n_q = 0, 1  # q/do refs hold only this kv block's diagonal
    else:
        lo = jax.lax.div(j * bk, block_q) if causal else 0

    for s_idx in range(block_b):
        k = k_ref[s_idx]
        v = v_ref[s_idx]

        def body(i, carry, k=k, v=v):
            dks, dvs = carry
            q = q_ref[s_idx, pl.ds(i * block_q, block_q), :]
            do = do_ref[s_idx, pl.ds(i * block_q, block_q), :]
            lse = lse_ref[s_idx, 0, pl.ds(i * block_q, block_q), :]  # [bq,g]
            delta = delta_ref[s_idx, 0, pl.ds(i * block_q, block_q), :]
            if causal or period:
                qbase = j * block_q if diag else i * block_q
                qi = qbase + jax.lax.broadcasted_iota(jnp.int32,
                                                      (block_q, bk), 0)
                ki = j * bk + jax.lax.broadcasted_iota(jnp.int32,
                                                       (block_q, bk), 1)
                mask = (qi >= ki if causal
                        else (qi // period) == (ki // period))
            dks_n, dvs_n = [], []
            for h in range(g):
                sl = slice(h * d, (h + 1) * d)
                s = jax.lax.dot_general(
                    q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                if sl_ref is not None:
                    s = s + sl_ref[0, h] * ki.astype(jnp.float32)
                if causal or period:
                    s = jnp.where(mask, s, NEG_INF)
                p = jnp.exp(s - lse[:, h:h + 1])
                dvs_n.append(dvs[h] + jax.lax.dot_general(
                    p.astype(do.dtype), do[:, sl], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
                dp = jax.lax.dot_general(
                    do[:, sl], v[:, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                ds = p * (dp - delta[:, h:h + 1]) * scale
                dks_n.append(dks[h] + jax.lax.dot_general(
                    ds.astype(q.dtype), q[:, sl], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            return tuple(dks_n), tuple(dvs_n)

        zeros = tuple(jnp.zeros((bk, d), jnp.float32) for _ in range(g))
        dks, dvs = jax.lax.fori_loop(lo, n_q, body, (zeros, zeros))
        dk = jnp.concatenate(dks, axis=1) if g > 1 else dks[0]
        dv = jnp.concatenate(dvs, axis=1) if g > 1 else dvs[0]
        dk_ref[s_idx] = dk.astype(dk_ref.dtype)
        dv_ref[s_idx] = dv.astype(dv_ref.dtype)


def _bwd_dq_kernel_packed_multi(*refs, scale, causal, period, block_k, g,
                                m):
    # refs: m x (q, k, v, do, lse, delta) grouped by operand, then m dq
    for j in range(m):
        _bwd_dq_kernel_packed(
            refs[j], refs[m + j], refs[2 * m + j], refs[3 * m + j],
            refs[4 * m + j], refs[5 * m + j], refs[6 * m + j],
            scale=scale, causal=causal, period=period, block_k=block_k,
            g=g)


def _bwd_dkv_kernel_packed_multi(*refs, scale, causal, period, block_q, g,
                                 m):
    for j in range(m):
        _bwd_dkv_kernel_packed(
            refs[j], refs[m + j], refs[2 * m + j], refs[3 * m + j],
            refs[4 * m + j], refs[5 * m + j], refs[6 * m + j],
            refs[7 * m + j],
            scale=scale, causal=causal, period=period, block_q=block_q,
            g=g)


def _bwd_packed_multi(n, scale, causal, period, block_q, block_k, m,
                      q, k, v, do, lse, delta):
    b, sq, nd = q.shape
    d = nd // n
    g, w = _cell_geometry(n, d)
    sk = k.shape[1]

    # per-j specs over the shared operands; sample index = m*b_ + j
    q_specs = [pl.BlockSpec(
        (1, block_q, w), (lambda b_, h_, i, j=j: (m * b_ + j, i, h_)))
        for j in range(m)]
    kv_specs = [pl.BlockSpec(
        (1, sk, w), (lambda b_, h_, i, j=j: (m * b_ + j, 0, h_)))
        for j in range(m)]
    ld_specs = [pl.BlockSpec(
        (1, 1, block_q, g),
        (lambda b_, h_, i, j=j: (m * b_ + j, h_, i, 0)))
        for j in range(m)]
    dq_parts = pl.pallas_call(
        functools.partial(_bwd_dq_kernel_packed_multi, scale=scale,
                          causal=causal, period=period, block_k=block_k,
                          g=g, m=m),
        grid=(b // m, n // g, sq // block_q),
        in_specs=(q_specs + kv_specs + kv_specs + q_specs + ld_specs
                  + ld_specs),
        out_specs=[pl.BlockSpec((1, block_q, w),
                                lambda b_, h_, i: (b_, i, h_))
                   for _ in range(m)],
        out_shape=[jax.ShapeDtypeStruct((b // m, sq, nd), q.dtype)
                   for _ in range(m)],
    )(*((q,) * m + (k,) * m + (v,) * m + (do,) * m + (lse,) * m
        + (delta,) * m))
    dq = _interleave(list(dq_parts), b)

    q_full_specs = [pl.BlockSpec(
        (1, sq, w), (lambda b_, h_, j_, jj=jj: (m * b_ + jj, 0, h_)))
        for jj in range(m)]
    kv_blk_specs = [pl.BlockSpec(
        (1, block_k, w), (lambda b_, h_, j_, jj=jj: (m * b_ + jj, j_, h_)))
        for jj in range(m)]
    ld_full_specs = [pl.BlockSpec(
        (1, 1, sq, g), (lambda b_, h_, j_, jj=jj: (m * b_ + jj, h_, 0, 0)))
        for jj in range(m)]
    res = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel_packed_multi, scale=scale,
                          causal=causal, period=period, block_q=block_q,
                          g=g, m=m),
        grid=(b // m, n // g, sk // block_k),
        in_specs=(q_full_specs + kv_blk_specs + kv_blk_specs
                  + q_full_specs + ld_full_specs + ld_full_specs),
        out_specs=[pl.BlockSpec((1, block_k, w),
                                lambda b_, h_, j_: (b_, j_, h_))
                   for _ in range(2 * m)],
        out_shape=[jax.ShapeDtypeStruct((b // m, sk, nd), k.dtype)
                   for _ in range(2 * m)],
    )(*((q,) * m + (k,) * m + (v,) * m + (do,) * m + (lse,) * m
        + (delta,) * m))
    dk = _interleave(list(res[:m]), b)
    dv = _interleave(list(res[m:]), b)
    return dq, dk, dv


def _bwd_packed(n, scale, causal, period, block_q, block_k, res, grad,
                alibi_slopes=None):
    q, k, v, out, lse = res
    b, sq, nd = q.shape
    d = nd // n
    g, w = _cell_geometry(n, d)
    sk = k.shape[1]
    do = grad
    # delta = rowsum(do * out) per head: [B, n/g, Sq, g]
    prod = (do.astype(jnp.float32) * out.astype(jnp.float32)).reshape(
        b, sq, n // g, g, d).sum(-1)          # [B, Sq, n/g, g]
    delta = prod.transpose(0, 2, 1, 3)         # [B, n/g, Sq, g]

    diag = _is_diag(period, causal, block_q, block_k, sq, sk)
    m = 1 if (diag or causal) else _pick_multi(b, max(sk, sq), w, arrays=16)
    if m > 1:
        return _bwd_packed_multi(n, scale, causal, period, block_q,
                                 block_k, m, q, k, v, do, lse, delta)
    bb = _pick_block_b(b, block_k if diag else max(sk, sq), w, arrays=16)
    extra_in, extra_specs = (), []
    if alibi_slopes is not None:
        sl, sl_spec = _slopes_operand(alibi_slopes, n, g)
        extra_in, extra_specs = (sl,), [sl_spec]
    if diag:
        dq_kv_spec = pl.BlockSpec((bb, block_k, w),
                                  lambda b_, h_, i: (b_, i, h_))
    else:
        dq_kv_spec = pl.BlockSpec((bb, sk, w), lambda b_, h_, i: (b_, 0, h_))
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel_packed, scale=scale, causal=causal,
                          period=period, block_k=block_k, g=g, diag=diag,
                          alibi=alibi_slopes is not None),
        grid=(b // bb, n // g, sq // block_q),
        in_specs=extra_specs + [
            pl.BlockSpec((bb, block_q, w), lambda b_, h_, i: (b_, i, h_)),
            dq_kv_spec,
            dq_kv_spec,
            pl.BlockSpec((bb, block_q, w), lambda b_, h_, i: (b_, i, h_)),
            pl.BlockSpec((bb, 1, block_q, g),
                         lambda b_, h_, i: (b_, h_, i, 0)),
            pl.BlockSpec((bb, 1, block_q, g),
                         lambda b_, h_, i: (b_, h_, i, 0)),
        ],
        out_specs=pl.BlockSpec((bb, block_q, w),
                               lambda b_, h_, i: (b_, i, h_)),
        out_shape=jax.ShapeDtypeStruct((b, sq, nd), q.dtype),
    )(*extra_in, q, k, v, do, lse, delta)

    if diag:
        dkv_q_spec = pl.BlockSpec((bb, block_q, w),
                                  lambda b_, h_, j: (b_, j, h_))
        dkv_ld_spec = pl.BlockSpec((bb, 1, block_q, g),
                                   lambda b_, h_, j: (b_, h_, j, 0))
    else:
        dkv_q_spec = pl.BlockSpec((bb, sq, w), lambda b_, h_, j: (b_, 0, h_))
        dkv_ld_spec = pl.BlockSpec((bb, 1, sq, g),
                                   lambda b_, h_, j: (b_, h_, 0, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel_packed, scale=scale,
                          causal=causal, period=period, block_q=block_q,
                          g=g, diag=diag,
                          alibi=alibi_slopes is not None),
        grid=(b // bb, n // g, sk // block_k),
        in_specs=extra_specs + [
            dkv_q_spec,
            pl.BlockSpec((bb, block_k, w), lambda b_, h_, j: (b_, j, h_)),
            pl.BlockSpec((bb, block_k, w), lambda b_, h_, j: (b_, j, h_)),
            dkv_q_spec,
            dkv_ld_spec,
            dkv_ld_spec,
        ],
        out_specs=[
            pl.BlockSpec((bb, block_k, w), lambda b_, h_, j: (b_, j, h_)),
            pl.BlockSpec((bb, block_k, w), lambda b_, h_, j: (b_, j, h_)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, sk, nd), k.dtype),
            jax.ShapeDtypeStruct((b, sk, nd), v.dtype),
        ],
    )(*extra_in, q, k, v, do, lse, delta)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _flash_packed(q, k, v, n, scale, causal, period, block_q, block_k,
                  alibi_slopes=None):
    out, _ = _fwd_packed(q, k, v, n, scale=scale, causal=causal,
                         period=period, block_q=block_q, block_k=block_k,
                         alibi_slopes=alibi_slopes)
    return out


def _flash_packed_fwd(q, k, v, n, scale, causal, period, block_q, block_k,
                      alibi_slopes=None):
    out, lse = _fwd_packed(q, k, v, n, scale=scale, causal=causal,
                           period=period, block_q=block_q, block_k=block_k,
                           alibi_slopes=alibi_slopes)
    # name the lse residual so remat policies can save it — otherwise the
    # backward re-runs the forward flash kernel just to rebuild lse
    from jax.ad_checkpoint import checkpoint_name
    lse = checkpoint_name(lse, "flash_lse")
    return out, (q, k, v, out, lse)


def _flash_packed_bwd(n, scale, causal, period, block_q, block_k,
                      alibi_slopes, res, g):
    return _bwd_packed(n, scale, causal, period, block_q, block_k, res, g,
                       alibi_slopes=alibi_slopes)


_flash_packed.defvjp(_flash_packed_fwd, _flash_packed_bwd)


def flash_attention_packed(q, k, v, n_heads: int, *, causal: bool = False,
                           period: int = 0,
                           scale: Optional[float] = None,
                           block_q: int = 512, block_k: int = 512,
                           alibi_slopes=None):
    """Flash attention over packed [B, S, n_heads*d] layouts (no head
    transposes).  Sq must equal Sk when causal.

    Mosaic lane blocks must be 128-divisible, so heads with d < 128 are
    packed g = 128 // d per strip and computed as g independent online
    softmaxes inside one grid cell (d=64: two heads per strip — the hot
    decoder/vision geometry).

    alibi_slopes: optional [n_heads] per-head ALiBi slopes (Bloom);
    requires causal.  The bias slope_h * key_position is generated
    in-kernel from block indices — no bias tensor ever touches HBM."""
    b, sq, nd = q.shape
    # NOTE (measured negative result): folding period-aligned chunks into
    # the batch dim ([16,1568,w] -> [112,224,w], 7x fewer score flops and
    # 7x less KV traffic) REGRESSED the flagship step 382.9 -> 483.7 ms.
    # The masked whole-sequence cell wins despite its wasted flops —
    # don't re-add the fold without a trace explaining why.
    d = nd // n_heads
    g, _ = _strip_geometry(n_heads, d)
    if g is None:
        raise ValueError(
            f"flash_attention_packed needs head_dim % 128 == 0 or "
            f"(128 % head_dim == 0 and n_heads % (128//head_dim) == 0); "
            f"got n={n_heads}, d={d} — use flash_attention instead")
    if scale is None:
        scale = d ** -0.5
    if alibi_slopes is not None:
        assert causal, "alibi requires causal attention"
        assert len(alibi_slopes) == n_heads
        alibi_slopes = tuple(float(s) for s in np.asarray(alibi_slopes))
    sk = k.shape[1]
    if period and not causal and sq == sk:
        # period-aligned block-diagonal mode: groups never straddle
        # period-aligned block boundaries, so square blocks that are
        # multiples of lcm(period, 16) turn the masked whole-sequence
        # sweep into diagonal blocks only — an sq/block flop cut on the
        # grouped temporal geometry (S=1568: 7x at block 224) with the
        # SAME layout (the measured-negative batch-fold above moved
        # data; this only shrinks the kv loop).  Env override
        # FLASH_PERIOD_BLOCK=<n> (0 = whole-sequence cells).
        bdiag = _pick_period_block(sq, period)
        if bdiag:
            return _flash_packed(q, k, v, n_heads, float(scale), False,
                                 int(period), bdiag, bdiag)
    if sq % 128 or sk % 128:
        bq, bk = sq, sk  # whole-sequence blocks (no-pad rule)
    else:
        bq = min(_pick_block(sq), block_q)
        bk = min(_pick_block(sk), block_k)
    return _flash_packed(q, k, v, n_heads, float(scale), bool(causal),
                         int(period), bq, bk, alibi_slopes)

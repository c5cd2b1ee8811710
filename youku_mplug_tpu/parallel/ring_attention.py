"""Ring attention: exact attention over a sequence sharded across chips.

Context parallelism for long sequences (SURVEY §5.7 extension; absent
upstream — the reference is capped at 2048 tokens): q/k/v live sharded
over a ``sp`` mesh axis ([B, H, S/P, D] per device).  Each device keeps
its query block resident and the K/V blocks rotate around the ring via
``jax.lax.ppermute`` (ICI neighbor traffic only); softmax is accumulated
online in fp32 exactly like flash attention, so the result equals full
attention bit-for-epsilon with O(S/P) memory per chip.

Causal masking uses global positions derived from the ring step, so the
block skip pattern (no compute for fully-masked blocks) falls out of the
mask itself; XLA overlaps the ppermute with the current block's matmuls.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _block_attend(q, k, v, q_off, k_off, *, scale, causal):
    """One (q_block, kv_block) online-softmax partial.

    q: [B,H,Sq,D], k/v: [B,H,Sk,D]; offsets are global token offsets.
    Returns (acc [B,H,Sq,D] fp32, m [B,H,Sq,1], l [B,H,Sq,1]).
    """
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if causal:
        qi = q_off + jnp.arange(q.shape[2])[:, None]
        ki = k_off + jnp.arange(k.shape[2])[None, :]
        s = jnp.where((qi >= ki)[None, None], s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    # fully-masked rows: keep exp() finite
    m_safe = jnp.maximum(m, NEG_INF / 2)
    p = jnp.exp(s - m_safe)
    p = jnp.where(m <= NEG_INF / 2, 0.0, p)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return acc, jnp.where(m <= NEG_INF / 2, NEG_INF, m), l


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "sp",
    causal: bool = False,
    scale: Optional[float] = None,
) -> jax.Array:
    """Exact attention with the sequence dim sharded over ``axis``.

    q, k, v: [B, H, S, D] GLOBAL shapes (S divisible by the axis size).
    Returns [B, H, S, D] with the same sharding as q.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n_dev = mesh.shape[axis]
    ring = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    s_loc = q.shape[2] // n_dev

    def spmd(q, k, v):
        idx = jax.lax.axis_index(axis)
        q32 = q.astype(jnp.float32)
        q_off = idx * s_loc

        def step(i, carry):
            acc, m, l, kk, vv = carry
            # kv currently held came from device (idx - i) mod P
            src = jax.lax.rem(idx - i + n_dev, n_dev)
            k_off = src * s_loc
            a, m_b, l_b = _block_attend(q32, kk.astype(jnp.float32), vv,
                                        q_off, k_off, scale=scale,
                                        causal=causal)
            m_new = jnp.maximum(m, m_b)
            alpha = jnp.exp(jnp.maximum(m, NEG_INF / 2) - m_new)
            alpha = jnp.where(m <= NEG_INF / 2, 0.0, alpha)
            beta = jnp.exp(jnp.maximum(m_b, NEG_INF / 2) - m_new)
            beta = jnp.where(m_b <= NEG_INF / 2, 0.0, beta)
            acc = acc * alpha + a * beta
            l = l * alpha + l_b * beta
            kk = jax.lax.ppermute(kk, axis, ring)
            vv = jax.lax.ppermute(vv, axis, ring)
            return acc, m_new, l, kk, vv

        b, h, _, d = q.shape
        acc0 = jnp.zeros((b, h, s_loc, d), jnp.float32)
        m0 = jnp.full((b, h, s_loc, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((b, h, s_loc, 1), jnp.float32)
        acc, m, l, _, _ = jax.lax.fori_loop(
            0, n_dev, step, (acc0, m0, l0, k, v))
        return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)

    spec = P(None, None, axis, None)
    fn = jax.shard_map(spmd, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec, check_vma=False)
    return fn(q, k, v)


def ulysses_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "sp",
    causal: bool = False,
    scale: Optional[float] = None,
) -> jax.Array:
    """DeepSpeed-Ulysses-style context parallelism: all_to_all scatters
    HEADS and gathers the sequence, so each device runs ordinary full
    attention on H/P heads; a second all_to_all restores the sequence
    sharding.  Exact, two collectives per call; needs H % P == 0.

    q, k, v: [B, H, S, D] global, S sharded over ``axis``.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n_dev = mesh.shape[axis]
    if q.shape[1] % n_dev:
        raise ValueError(
            f"ulysses needs heads ({q.shape[1]}) divisible by the axis "
            f"size ({n_dev}); use ring_attention instead")

    from youku_mplug_tpu.ops.attention import mha_reference

    def spmd(q, k, v):
        # local: [B, H, S/P, D] -> scatter heads, gather sequence
        def to_heads(x):
            return jax.lax.all_to_all(x, axis, split_axis=1, concat_axis=2,
                                      tiled=True)

        def to_seq(x):
            return jax.lax.all_to_all(x, axis, split_axis=2, concat_axis=1,
                                      tiled=True)

        qh, kh, vh = to_heads(q), to_heads(k), to_heads(v)
        out = mha_reference(qh, kh, vh, causal=causal, scale=scale)
        return to_seq(out)

    spec = P(None, None, axis, None)
    fn = jax.shard_map(spmd, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec, check_vma=False)
    return fn(q, k, v)

"""Pallas decode attention (in-place packed interleaved stacked-cache
read) vs reference math.

Runs the kernel in interpret mode on CPU; the oracle is mha_reference on
the explicitly gathered + unpacked layer slice with the decode mask the
model builds (models/gpt3.py full-stack decode branch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from youku_mplug_tpu.ops.attention import mha_reference
from youku_mplug_tpu.ops.decode_attention import decode_attention


def _oracle(q, ckv, n, lidx, cache_len, valid_from):
    """q [B,nd]; ckv [L,B,M,2nd] rows = [K|V]; masks as in decode."""
    b, nd = q.shape
    m = ckv.shape[2]
    d = nd // n
    qh = np.moveaxis(q.reshape(b, 1, n, d), 2, 1)        # [B,n,1,d]
    kh = np.moveaxis(ckv[lidx, :, :, :nd].reshape(b, m, n, d), 2, 1)
    vh = np.moveaxis(ckv[lidx, :, :, nd:].reshape(b, m, n, d), 2, 1)
    cache_len = np.broadcast_to(np.asarray(cache_len).reshape(-1), (b,))
    ki = np.arange(m)[None, :]
    allowed = ki <= cache_len[:, None]
    if valid_from is not None:
        allowed = allowed & (ki >= np.asarray(valid_from)[:, None])
    bias = np.where(allowed, 0.0, float(np.finfo(np.float32).min))
    out = mha_reference(jnp.asarray(qh), jnp.asarray(kh), jnp.asarray(vh),
                        bias=jnp.asarray(bias, jnp.float32)[:, None, None])
    return np.asarray(out[:, :, 0]).reshape(b, nd)


def _rand(rng, *shape):
    return rng.normal(size=shape).astype(np.float32)


@pytest.mark.parametrize("lidx", [0, 2])
def test_matches_reference_scalar_len(lidx):
    rng = np.random.default_rng(0)
    L, B, n, M, d = 3, 2, 4, 256, 32
    q = _rand(rng, B, n * d)
    ckv = _rand(rng, L, B, M, 2 * n * d)
    clen = 130  # second block, partially filled
    got = decode_attention(jnp.asarray(q), jnp.asarray(ckv),
                           n, jnp.int32(lidx), jnp.int32(clen), None,
                           interpret=True)
    want = _oracle(q, ckv, n, lidx, clen, None)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_per_sample_len_and_valid_from():
    rng = np.random.default_rng(1)
    L, B, n, M, d = 2, 4, 3, 384, 16
    q = _rand(rng, B, n * d)
    ckv = _rand(rng, L, B, M, 2 * n * d)
    clen = np.array([5, 120, 200, 383], np.int32)   # 1, 1, 2, 3 blocks live
    vfrom = np.array([0, 3, 130, 260], np.int32)    # incl. whole-block skips
    got = decode_attention(jnp.asarray(q), jnp.asarray(ckv),
                           n, jnp.int32(1), jnp.asarray(clen),
                           jnp.asarray(vfrom), interpret=True)
    want = _oracle(q, ckv, n, 1, clen, vfrom)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_single_valid_position():
    """cache_len == valid_from: attention is a pure copy of that V row."""
    rng = np.random.default_rng(2)
    L, B, n, M, d = 1, 2, 2, 128, 8
    q = _rand(rng, B, n * d)
    ckv = _rand(rng, L, B, M, 2 * n * d)
    clen = np.array([7, 40], np.int32)
    got = decode_attention(jnp.asarray(q), jnp.asarray(ckv),
                           n, jnp.int32(0), jnp.asarray(clen),
                           jnp.asarray(clen), interpret=True)
    want = np.stack([ckv[0, b, clen[b], n * d:] for b in range(B)])
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_flagship_geometry_bf16():
    """1.3B geometry (n=32, d=64) with a batch wide enough to exercise
    multi-sample cells (bb>1) and several key blocks."""
    rng = np.random.default_rng(3)
    L, B, n, M, d = 2, 8, 32, 256, 64
    q = jnp.asarray(_rand(rng, B, n * d), jnp.bfloat16)
    ckv = jnp.asarray(_rand(rng, L, B, M, 2 * n * d), jnp.bfloat16)
    clen = np.arange(8, dtype=np.int32) * 31 + 10  # spread across blocks
    got = decode_attention(q, ckv, n, jnp.int32(1), jnp.asarray(clen),
                           None, interpret=True)
    want = _oracle(np.asarray(q, np.float32), np.asarray(ckv, np.float32),
                   n, 1, clen, None)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               rtol=2e-2, atol=2e-2)

"""Ring attention (context parallelism): exact equality with full
attention while the sequence is sharded across the mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import Mesh

from youku_mplug_tpu.ops.attention import mha_reference
from youku_mplug_tpu.parallel.ring_attention import ring_attention


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("sp", [4, 8])
def test_ring_attention_matches_full(causal, sp):
    rng = np.random.default_rng(0)
    b, h, s, d = 2, 3, 8 * 8, 16
    q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))

    want = mha_reference(q, k, v, causal=causal)

    mesh = Mesh(np.asarray(jax.devices()[:sp]), ("sp",))
    with jax.set_mesh(mesh):
        got = jax.jit(lambda q_, k_, v_: ring_attention(
            q_, k_, v_, mesh=mesh, axis="sp", causal=causal))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ring_attention_long_context_memory_shape():
    """The point of CP: each device only ever holds S/P keys — check the
    sharded call runs at a sequence length whose full score matrix would
    be big, and output sharding follows the sequence axis."""
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("sp",))
    b, h, s, d = 1, 2, 8 * 256, 32
    q = jnp.ones((b, h, s, d), jnp.float32)
    k = jnp.ones((b, h, s, d), jnp.float32)
    v = jnp.ones((b, h, s, d), jnp.float32)
    with jax.set_mesh(mesh):
        out = jax.jit(lambda a, b_, c: ring_attention(
            a, b_, c, mesh=mesh, axis="sp", causal=True))(q, k, v)
    assert out.shape == (b, h, s, d)
    # uniform values: attention output equals v
    np.testing.assert_allclose(np.asarray(out)[0, 0, -1], np.ones(d),
                               rtol=1e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_ulysses_attention_matches_full(causal):
    from youku_mplug_tpu.parallel.ring_attention import ulysses_attention

    rng = np.random.default_rng(3)
    b, h, s, d = 2, 8, 64, 16
    q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    want = mha_reference(q, k, v, causal=causal)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("sp",))
    with jax.set_mesh(mesh):
        got = jax.jit(lambda q_, k_, v_: ulysses_attention(
            q_, k_, v_, mesh=mesh, axis="sp", causal=causal))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ulysses_rejects_indivisible_heads():
    from youku_mplug_tpu.parallel.ring_attention import ulysses_attention

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("sp",))
    q = jnp.ones((1, 3, 16, 8))
    with pytest.raises(ValueError):
        ulysses_attention(q, q, q, mesh=mesh, axis="sp")

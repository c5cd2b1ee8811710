"""MoE expert-parallel FFN: routing correctness, capacity semantics,
load-balance aux, and expert-sharded execution on the mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from youku_mplug_tpu.parallel.moe import MoEMLP, moe_rules, top_k_routing


def test_top1_routing_equals_argmax_expert():
    """With k=1 and ample capacity, each token's output must be its top
    expert's FFN output times the gate value."""
    rng = np.random.default_rng(0)
    g, s, m, e, f = 2, 8, 16, 4, 32
    x = jnp.asarray(rng.normal(size=(g, s, m)).astype(np.float32))
    model = MoEMLP(num_experts=e, ffn_dim=f, k=1, capacity_factor=8.0)
    params = model.init(jax.random.key(0), x)["params"]
    y, aux = model.apply({"params": params}, x)

    gates = jax.nn.softmax(
        jnp.einsum("gsm,me->gse", x, params["router"]), axis=-1)
    top = np.asarray(jnp.argmax(gates, -1))
    w1, b1 = np.asarray(params["w1"]), np.asarray(params["b1"])
    w2, b2 = np.asarray(params["w2"]), np.asarray(params["b2"])
    for gi in range(g):
        for si in range(s):
            ei = top[gi, si]
            h = jax.nn.gelu(np.asarray(x)[gi, si] @ w1[ei] + b1[ei])
            want = (np.asarray(h) @ w2[ei] + b2[ei]) * float(
                gates[gi, si, ei])
            np.testing.assert_allclose(np.asarray(y)[gi, si], want,
                                       rtol=2e-4, atol=2e-4)
    assert float(aux) > 0


def test_top2_combines_two_experts():
    rng = np.random.default_rng(1)
    g, s, m, e, f = 1, 6, 8, 4, 16
    x = jnp.asarray(rng.normal(size=(g, s, m)).astype(np.float32))
    model = MoEMLP(num_experts=e, ffn_dim=f, k=2, capacity_factor=8.0)
    params = model.init(jax.random.key(0), x)["params"]
    y2, _ = model.apply({"params": params}, x)
    model1 = MoEMLP(num_experts=e, ffn_dim=f, k=1, capacity_factor=8.0)
    y1, _ = model1.apply({"params": params}, x)
    # top-2 output strictly includes the top-1 contribution plus more
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_capacity_drops_overflow():
    """Capacity 1 with all tokens preferring one expert: only the first
    token gets routed, the rest emit zeros (dropped)."""
    g, s, m, e, f = 1, 4, 8, 2, 8
    x = jnp.ones((g, s, m), jnp.float32)  # identical tokens -> same expert
    gates = jax.nn.softmax(jnp.tile(jnp.asarray([[5.0, 0.0]]), (s, 1)))[
        None]
    dispatch, combine, _ = top_k_routing(gates, k=1, capacity=1)
    assert int(dispatch.sum()) == 1  # one slot filled
    assert float(combine[0, 0].sum()) > 0
    assert float(combine[0, 1:].sum()) == 0  # overflow dropped


def test_moe_expert_sharded_matches_replicated():
    from jax.sharding import Mesh

    from youku_mplug_tpu.parallel.sharding import shard_params

    rng = np.random.default_rng(2)
    g, s, m, e, f = 4, 8, 16, 4, 32
    x = jnp.asarray(rng.normal(size=(g, s, m)).astype(np.float32))
    model = MoEMLP(num_experts=e, ffn_dim=f, k=2, capacity_factor=4.0)
    params = model.init(jax.random.key(0), x)["params"]
    y_ref, _ = model.apply({"params": params}, x)

    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "model"))
    rules = moe_rules() + ((r".*", jax.sharding.PartitionSpec()),)
    with jax.set_mesh(mesh):
        p_sh = shard_params({"moe": params}, mesh, rules)["moe"]
        assert "model" in p_sh["w1"].sharding.spec
        y_sh, _ = jax.jit(lambda p, x_: model.apply({"params": p}, x_))(
            p_sh, x)
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)

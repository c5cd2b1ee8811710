import jax
import jax.numpy as jnp
import numpy as np
import pytest

from youku_mplug_tpu.models.gpt3 import GPT3Config, GPT3LM
from youku_mplug_tpu.runtime.precision import FP32_POLICY

CFG = GPT3Config(
    vocab_size=97, hidden_size=32, num_hidden_layers=3,
    num_attention_heads=4, max_position_embeddings=64,
    hidden_dropout=0.0, attention_dropout=0.0, layernorm_epsilon=1e-5)


@pytest.fixture(scope="module")
def model_and_params():
    model = GPT3LM(CFG, policy=FP32_POLICY)
    tokens = jnp.zeros((2, 10), jnp.int32)
    params = model.init(jax.random.key(0), tokens)["params"]
    return model, params


def test_forward_shapes(model_and_params):
    model, params = model_and_params
    tokens = jnp.arange(20).reshape(2, 10) % CFG.vocab_size
    out = model.apply({"params": params}, tokens, return_logits=True)
    assert out["last_hidden_state"].shape == (2, 10, 32)
    assert out["logits"].shape == (2, 10, 97)


def test_loss_masking_semantics(model_and_params):
    """Masked-mean loss: positions with mask 0 must not affect the loss."""
    model, params = model_and_params
    tokens = jnp.asarray(np.random.default_rng(1).integers(0, 97, (2, 8)))
    # shift targets like the runner does (reference distributed_gpt3:142-143)
    labels = jnp.concatenate([tokens[:, 1:], tokens[:, :1]], axis=1)
    mask = jnp.ones((2, 7), jnp.int32)
    out = model.apply({"params": params}, tokens, labels=labels,
                      loss_mask=mask)
    # corrupting a label at a masked position must not change the loss
    mask2 = mask.at[0, 3].set(0)
    labels2 = labels.at[0, 3].set((labels[0, 3] + 5) % 97)
    out2 = model.apply({"params": params}, tokens, labels=labels2,
                       loss_mask=mask2)
    out3 = model.apply({"params": params}, tokens, labels=labels,
                       loss_mask=mask2)
    np.testing.assert_allclose(float(out2["loss"]), float(out3["loss"]),
                               rtol=1e-6)
    assert not np.isclose(float(out["loss"]), float(out2["loss"]))


def test_scan_matches_unrolled():
    tokens = jnp.arange(12).reshape(2, 6) % CFG.vocab_size
    m_scan = GPT3LM(CFG, policy=FP32_POLICY)
    p_scan = m_scan.init(jax.random.key(0), tokens)["params"]

    cfg_unroll = GPT3Config(**{**CFG.__dict__, "scan_layers": False})
    m_un = GPT3LM(cfg_unroll, policy=FP32_POLICY)
    p_un = m_un.init(jax.random.key(0), tokens)["params"]

    # move scanned (stacked) params into per-layer dicts
    stacked = p_scan["decoder"]["layers"]
    for i in range(CFG.num_hidden_layers):
        p_un["decoder"][f"layers_{i}"] = jax.tree.map(
            lambda x: x[i], stacked)

    out_s = m_scan.apply({"params": p_scan}, tokens, return_logits=True)
    out_u = m_un.apply({"params": p_un}, tokens, return_logits=True)
    np.testing.assert_allclose(np.asarray(out_s["logits"]),
                               np.asarray(out_u["logits"]),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize(
    "policy", ["nothing", "dots", "attn", "names", "narrow", "nofc1"])
def test_remat_policies_same_loss_and_grad(policy):
    # every remat policy is a pure recompute/memory tradeoff: loss and
    # grads must match the no-remat forward bit-for-bit-ish (fp32)
    tokens = jnp.arange(12).reshape(2, 6) % CFG.vocab_size

    def loss_with(cfg):
        model = GPT3LM(cfg, policy=FP32_POLICY)
        params = model.init(jax.random.key(0), tokens)["params"]

        def f(p):
            out = model.apply({"params": p}, tokens, return_logits=True)
            return jnp.mean(out["logits"].astype(jnp.float32) ** 2)

        return jax.value_and_grad(f)(params)

    base_cfg = GPT3Config(**{**CFG.__dict__, "remat": False})
    want_loss, want_grad = loss_with(base_cfg)
    cfg = GPT3Config(**{**CFG.__dict__, "remat": True,
                        "remat_policy": policy})
    got_loss, got_grad = loss_with(cfg)
    np.testing.assert_allclose(float(got_loss), float(want_loss),
                               rtol=1e-6)
    flat_w = jax.tree_util.tree_leaves(want_grad)
    flat_g = jax.tree_util.tree_leaves(got_grad)
    for w, g in zip(flat_w, flat_g):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-5)


def test_decode_matches_full_forward(model_and_params):
    """Prefill + incremental decode must reproduce full-forward logits."""
    model, params = model_and_params
    rng = np.random.default_rng(2)
    tokens = jnp.asarray(rng.integers(0, 97, (2, 9)))

    full = model.apply({"params": params}, tokens, return_logits=True)
    full_logits = np.asarray(full["logits"])

    cache = model.apply({"params": params}, 2, 16, jnp.float32,
                        method=GPT3LM.init_cache)
    # prefill on the first 5 tokens
    emb5 = model.apply({"params": params}, tokens[:, :5],
                       method=GPT3LM.embed)
    logits5, cache = model.apply({"params": params}, emb5, cache,
                                 jnp.int32(0), method=GPT3LM.decode_step)
    np.testing.assert_allclose(np.asarray(logits5), full_logits[:, 4],
                               rtol=2e-4, atol=2e-4)
    # then single-token decode for the rest
    for t in range(5, 9):
        emb1 = model.apply({"params": params}, tokens[:, t:t + 1],
                           method=GPT3LM.embed)
        logits1, cache = model.apply({"params": params}, emb1, cache,
                                     jnp.int32(t), method=GPT3LM.decode_step)
        np.testing.assert_allclose(np.asarray(logits1), full_logits[:, t],
                                   rtol=2e-4, atol=2e-4)


def test_query_prefix_embeddings(model_and_params):
    """Query-prefix forward: mixed input_embeds path works and loss masks
    query positions (reference distributed_gpt3.py:155-165)."""
    model, params = model_and_params
    rng = np.random.default_rng(3)
    tokens = jnp.asarray(rng.integers(0, 97, (2, 6)))
    queries = jnp.asarray(rng.normal(size=(2, 4, 32)), jnp.float32)

    tok_emb = model.apply({"params": params}, tokens, method=GPT3LM.embed)
    input_embeds = jnp.concatenate([queries, tok_emb], axis=1)

    targets = jnp.concatenate([tokens[:, 1:], tokens[:, :1]], axis=1)
    empty = jnp.full((2, 4), 100 % 97, jnp.int32)
    labels = jnp.concatenate([empty, targets], axis=1)
    loss_mask = jnp.concatenate(
        [jnp.zeros((2, 4), jnp.int32), jnp.ones((2, 5), jnp.int32)], axis=1)

    out = model.apply({"params": params}, input_embeds=input_embeds,
                      labels=labels, loss_mask=loss_mask)
    assert out["losses"].shape == (2, 10)
    assert np.isfinite(float(out["loss"]))


def test_sharded_forward_matches_single_device(model_and_params):
    """TP=4/DP=2 sharded forward == replicated forward (the TPU analog of
    the reference's TP=1-collapse test story, SURVEY §4)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from youku_mplug_tpu.parallel import shard_params, GPT3_SHARDING_RULES
    from youku_mplug_tpu.runtime import MeshConfig, make_mesh

    model, params = model_and_params
    tokens = jnp.arange(16).reshape(2, 8) % CFG.vocab_size
    want = model.apply({"params": params}, tokens, return_logits=True)

    mesh = make_mesh(MeshConfig(data=2, model=4))
    with jax.set_mesh(mesh):
        sharded = shard_params(params, mesh)
        tok_sharded = jax.device_put(
            tokens, NamedSharding(mesh, P("data", None)))
        got = jax.jit(
            lambda p, t: model.apply({"params": p}, t, return_logits=True)
        )(sharded, tok_sharded)
    np.testing.assert_allclose(np.asarray(got["logits"]),
                               np.asarray(want["logits"]),
                               rtol=2e-4, atol=2e-4)


def test_eva_vit_g_preset_shapes():
    """EVA-g preset builds and runs (scaled to a tiny image for CPU)."""
    import dataclasses

    from youku_mplug_tpu.models.vision import EVA_VIT_G, VisionTransformer
    from youku_mplug_tpu.runtime.precision import FP32_POLICY

    assert EVA_VIT_G.embed_dim == 1408 and EVA_VIT_G.depth == 40
    assert EVA_VIT_G.embed_dim // EVA_VIT_G.num_heads == 88
    tiny = dataclasses.replace(EVA_VIT_G, img_size=28, depth=1,
                               embed_dim=176, num_heads=2, grad_ckpt=False,
                               drop_path=0.0)
    model = VisionTransformer(tiny, policy=FP32_POLICY)
    import numpy as np

    x = jnp.asarray(np.zeros((1, 3, 28, 28), np.float32))
    params = model.init(jax.random.key(0), x)["params"]
    pooled, tokens = model.apply({"params": params}, x)
    assert tokens.shape == (1, 1 + 4, 176)
    # mlp hidden uses the fractional ratio
    assert params["blocks_0"]["mlp"]["fc1_kernel"].shape[1] == int(
        176 * 4.3637)


def test_attention_dropout_is_applied(model_and_params):
    """attention_dropout > 0 must change the training forward in an
    rng-dependent way (reference attn dropout under the RNG tracker,
    modeling_distributed_gpt3.py:778-780) — and grads must depend on it."""
    import dataclasses

    model, params = model_and_params
    cfg_d = dataclasses.replace(CFG, attention_dropout=0.5)
    model_d = GPT3LM(cfg_d, policy=FP32_POLICY)
    tokens = jnp.asarray(np.random.default_rng(2).integers(0, 97, (2, 8)))
    labels = jnp.concatenate([tokens[:, 1:], tokens[:, :1]], axis=1)
    mask = jnp.ones((2, 7), jnp.int32)

    def loss(p, rng, model_, det):
        out = model_.apply({"params": p}, tokens, labels=labels,
                           loss_mask=mask, deterministic=det,
                           rngs=None if det else {"dropout": rng})
        return out["loss"]

    l_det = loss(params, None, model_d, True)
    l_a = loss(params, jax.random.key(1), model_d, False)
    l_b = loss(params, jax.random.key(2), model_d, False)
    # dropout active: rng-dependent, differs from deterministic
    assert not np.isclose(float(l_a), float(l_b))
    assert not np.isclose(float(l_a), float(l_det))
    # rate 0: training forward == deterministic forward
    l0 = loss(params, jax.random.key(1), model, False)
    np.testing.assert_allclose(float(l0), float(loss(params, None, model,
                                                     True)), rtol=1e-6)
    # grads are rng-dependent too
    g_a = jax.grad(lambda p: loss(p, jax.random.key(1), model_d, False))(
        params)
    g_b = jax.grad(lambda p: loss(p, jax.random.key(2), model_d, False))(
        params)
    leaf_a = g_a["decoder"]["layers"]["attn"]["qkv_kernel"]
    leaf_b = g_b["decoder"]["layers"]["attn"]["qkv_kernel"]
    assert not np.allclose(np.asarray(leaf_a), np.asarray(leaf_b))


def test_vision_attention_dropout_is_applied():
    import dataclasses

    from youku_mplug_tpu.models.vision import TimeSformer, VisionConfig

    cfg = VisionConfig(img_size=32, patch_size=16, embed_dim=32, depth=1,
                       num_heads=2, num_frames=2, mlp_ratio=2.0,
                       attn_drop_rate=0.5)
    model = TimeSformer(cfg, policy=FP32_POLICY)
    video = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 3, 2, 32, 32)).astype(np.float32))
    params = model.init(jax.random.key(0), video)["params"]

    def fwd(rng, det):
        cls, _ = model.apply({"params": params}, video, deterministic=det,
                             rngs=None if det else {"dropout": rng})
        return np.asarray(cls)

    a = fwd(jax.random.key(1), False)
    b = fwd(jax.random.key(2), False)
    assert not np.allclose(a, b)
    # rate 0 path unchanged
    cfg0 = dataclasses.replace(cfg, attn_drop_rate=0.0)
    model0 = TimeSformer(cfg0, policy=FP32_POLICY)
    a0 = model0.apply({"params": params}, video, deterministic=False,
                      rngs={"dropout": jax.random.key(1)})
    d0 = model0.apply({"params": params}, video, deterministic=True)
    np.testing.assert_allclose(np.asarray(a0[0]), np.asarray(d0[0]),
                               rtol=1e-6)

"""LoRA adapters on the (frozen) GPT-3 decoder.

Ours, not the reference's: the reference can only fully freeze or fully
train its decoder (distributed_gpt3.py:88-95); lora_rank>0 adds rank-r
trainable deltas on qkv/out/fc1/fc2 while the 1.3B base stays frozen
(and optionally int8).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from youku_mplug_tpu.models.gpt3 import GPT3Config, GPT3LM
from youku_mplug_tpu.optim.factory import freeze_mask
from youku_mplug_tpu.runtime.precision import FP32_POLICY

BASE = dict(vocab_size=97, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, max_position_embeddings=64,
            hidden_dropout=0.0, attention_dropout=0.0,
            layernorm_epsilon=1e-5)


def _logits(cfg, params, tokens):
    model = GPT3LM(cfg, policy=FP32_POLICY)
    return model.apply({"params": params}, tokens,
                       return_logits=True)["logits"]


def test_zero_init_lora_is_identity():
    tokens = jnp.arange(12).reshape(2, 6) % 97
    cfg0 = GPT3Config(**BASE)
    cfg4 = GPT3Config(**BASE, lora_rank=4)
    p4 = GPT3LM(cfg4, policy=FP32_POLICY).init(jax.random.key(0),
                                               tokens)["params"]
    lora_names = [k for k in jax.tree_util.tree_leaves_with_path(p4)
                  if "lora_" in jax.tree_util.keystr(k[0])]
    # scanned layers stack per-name: 4 targets x (a, b), leading dim = L
    assert len(lora_names) == 8
    assert all(leaf.shape[0] == 2 for _, leaf in lora_names)

    # rank-0 model applied to the SAME base weights must match exactly
    # (b zero-init => the adapters are a no-op until trained)
    def strip(tree):
        if not isinstance(tree, dict):
            return tree
        return {k: strip(v) for k, v in tree.items()
                if not k.startswith("lora_")}

    p_base = strip(p4)
    np.testing.assert_array_equal(np.asarray(_logits(cfg4, p4, tokens)),
                                  np.asarray(_logits(cfg0, p_base, tokens)))


def test_lora_trainable_under_frozen_decoder():
    tokens = jnp.ones((1, 4), jnp.int32)
    cfg = GPT3Config(**BASE, lora_rank=2)
    params = GPT3LM(cfg, policy=FP32_POLICY).init(jax.random.key(0),
                                                  tokens)["params"]
    mask = freeze_mask({"text_decoder": params}, True, False)
    leaves = jax.tree_util.tree_leaves_with_path(mask)
    lora = [(jax.tree_util.keystr(p), v) for p, v in leaves
            if "lora_" in jax.tree_util.keystr(p)]
    base = [(jax.tree_util.keystr(p), v) for p, v in leaves
            if "lora_" not in jax.tree_util.keystr(p)]
    assert lora and all(v is False for _, v in lora)
    assert base and all(v is True for _, v in base)


def test_lora_b_grads_flow_a_grads_zero_at_init():
    tokens = jnp.arange(12).reshape(2, 6) % 97
    cfg = GPT3Config(**BASE, lora_rank=4)
    model = GPT3LM(cfg, policy=FP32_POLICY)
    params = model.init(jax.random.key(0), tokens)["params"]

    def loss(p):
        out = model.apply({"params": p}, tokens, return_logits=True)
        return jnp.mean(out["logits"].astype(jnp.float32) ** 2)

    g = jax.grad(loss)(params)
    for path, leaf in jax.tree_util.tree_leaves_with_path(g):
        name = jax.tree_util.keystr(path)
        if "lora_" in name and name.endswith("_b']"):
            assert float(jnp.abs(leaf).max()) > 0, name
        if "lora_" in name and name.endswith("_a']"):
            # dL/da = x^T (g b^T); b == 0 at init => exactly zero
            assert float(jnp.abs(leaf).max()) == 0, name


def test_vision_lora_identity_and_freeze():
    """Vision-tower adapters: zero-init no-op + trainable under
    freeze_vit (temporal params and lora_* both stay trainable)."""
    from youku_mplug_tpu.models.vision import TimeSformer, VisionConfig

    base = dict(img_size=32, patch_size=16, embed_dim=32, depth=2,
                num_heads=2, num_frames=2, mlp_ratio=2.0)
    x = jnp.ones((2, 3, 2, 32, 32), jnp.float32)
    m4 = TimeSformer(VisionConfig(**base, lora_rank=4))
    p4 = m4.init(jax.random.key(0), x)["params"]

    def strip(tree):
        if not isinstance(tree, dict):
            return tree
        return {k: strip(v) for k, v in tree.items()
                if not k.startswith("lora_")}

    m0 = TimeSformer(VisionConfig(**base))
    got = m4.apply({"params": p4}, x)[1]
    want = m0.apply({"params": strip(p4)}, x)[1]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    mask = freeze_mask({"visual_encoder": p4}, False, True)
    leaves = jax.tree_util.tree_leaves_with_path(mask)
    lora = [v for p, v in leaves if "lora_" in jax.tree_util.keystr(p)]
    assert lora and not any(lora)
    frozen_spatial = [v for p, v in leaves
                      if "lora_" not in jax.tree_util.keystr(p)
                      and "temporal" not in jax.tree_util.keystr(p)
                      and "time" not in jax.tree_util.keystr(p)]
    assert frozen_spatial and all(frozen_spatial)


def test_merge_lora_matches_adapter_forward():
    """merge_lora folds trained adapters into base kernels: the rank-0
    model on merged weights == the rank-r model with live adapters."""
    from youku_mplug_tpu.ops.lora import merge_lora

    tokens = jnp.arange(12).reshape(2, 6) % 97
    cfg4 = GPT3Config(**BASE, lora_rank=4, lora_alpha=8.0)
    cfg0 = GPT3Config(**BASE)
    p4 = GPT3LM(cfg4, policy=FP32_POLICY).init(jax.random.key(0),
                                               tokens)["params"]
    # non-trivial adapters
    p4 = jax.tree_util.tree_map_with_path(
        lambda p, x: (jax.random.normal(jax.random.key(7), x.shape,
                                        x.dtype) * 0.1
                      if "lora_" in jax.tree_util.keystr(p) else x), p4)
    want = _logits(cfg4, p4, tokens)

    merged = merge_lora(p4, cfg4.lora_rank, cfg4.lora_alpha)
    for path, _ in jax.tree_util.tree_leaves_with_path(merged):
        assert "lora_" not in jax.tree_util.keystr(path)
    got = _logits(cfg0, merged, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_merge_lora_vision_tower():
    """merge_lora also folds the vision adapters (qkv/proj/fc1/fc2)."""
    from youku_mplug_tpu.models.vision import TimeSformer, VisionConfig
    from youku_mplug_tpu.ops.lora import merge_lora

    base = dict(img_size=32, patch_size=16, embed_dim=32, depth=2,
                num_heads=2, num_frames=2, mlp_ratio=2.0)
    x = jnp.linspace(-1, 1, 2 * 3 * 2 * 32 * 32,
                     dtype=jnp.float32).reshape(2, 3, 2, 32, 32)
    # FP32 policy: under the default bf16 compute policy the two
    # formulations (W@x + (a@b)@x vs (W+a@b)@x) legitimately differ by
    # bf16 rounding; fp32 pins the algebraic identity tightly
    m4 = TimeSformer(VisionConfig(**base, lora_rank=4, lora_alpha=8.0),
                     policy=FP32_POLICY)
    p4 = m4.init(jax.random.key(0), x)["params"]
    p4 = jax.tree_util.tree_map_with_path(
        lambda p, v: (jax.random.normal(jax.random.key(5), v.shape,
                                        v.dtype) * 0.1
                      if "lora_" in jax.tree_util.keystr(p) else v), p4)
    want = m4.apply({"params": p4}, x)[1]

    merged = merge_lora(p4, 4, 8.0)
    for path, _ in jax.tree_util.tree_leaves_with_path(merged):
        assert "lora_" not in jax.tree_util.keystr(path)
    m0 = TimeSformer(VisionConfig(**base), policy=FP32_POLICY)
    got = m0.apply({"params": merged}, x)[1]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_qlora_int8_base_lora_grads_flow():
    """QLoRA composition: int8 frozen base + trainable LoRA adapters —
    the forward consumes the qscales collection, grads reach lora_b."""
    from youku_mplug_tpu.ops.quant import quantize_gpt3_decoder

    tokens = jnp.arange(12).reshape(2, 6) % 97
    cfg = GPT3Config(**BASE, lora_rank=4)
    model = GPT3LM(cfg, policy=FP32_POLICY)
    params = model.init(jax.random.key(0), tokens)["params"]
    qparams, scales = quantize_gpt3_decoder(params)

    # differentiate only the (float) LoRA leaves; the int8 base is data
    keystr = jax.tree_util.keystr
    lora = {keystr(p): x
            for p, x in jax.tree_util.tree_leaves_with_path(qparams)
            if "lora_" in keystr(p)}

    def loss(lora_leaves):
        p = jax.tree_util.tree_map_with_path(
            lambda pth, x: lora_leaves.get(keystr(pth), x), qparams)
        out = model.apply({"params": p, "qscales": scales}, tokens,
                          return_logits=True)
        return jnp.mean(out["logits"].astype(jnp.float32) ** 2)

    val, g = jax.value_and_grad(loss)(lora)
    assert np.isfinite(float(val))
    b_names = [k for k in g if k.endswith("_b']")]
    assert len(b_names) == 4
    for k in b_names:
        assert float(jnp.abs(g[k]).max()) > 0, k


def test_lora_decode_matches_full_forward():
    cfg = GPT3Config(**BASE, lora_rank=4)
    model = GPT3LM(cfg, policy=FP32_POLICY)
    tokens = (jnp.arange(16).reshape(2, 8) * 5) % 97
    params = model.init(jax.random.key(0), tokens)["params"]
    # make the adapters non-trivial so the decode path actually exercises
    # the LoRA deltas
    params = jax.tree_util.tree_map_with_path(
        lambda p, x: (jax.random.normal(jax.random.key(1), x.shape,
                                        x.dtype) * 0.05
                      if "lora_" in jax.tree_util.keystr(p) else x), params)

    full = model.apply({"params": params}, tokens, return_logits=True)
    want = np.asarray(full["logits"])

    # incremental decode over the same tokens (embed -> decode_step)
    cache = model.apply({"params": params}, 2, 16, jnp.float32,
                        method=GPT3LM.init_cache)
    for t in range(tokens.shape[1]):
        emb = model.apply({"params": params}, tokens[:, t:t + 1],
                          method=GPT3LM.embed)
        logits, cache = model.apply({"params": params}, emb, cache,
                                    jnp.int32(t), method=GPT3LM.decode_step)
        np.testing.assert_allclose(np.asarray(logits), want[:, t],
                                   rtol=2e-4, atol=2e-4)


def test_extract_inject_adapters_roundtrip():
    from youku_mplug_tpu.ops.lora import extract_adapters, inject_adapters

    tokens = jnp.ones((1, 4), jnp.int32)
    cfg = GPT3Config(**BASE, lora_rank=2)
    p = GPT3LM(cfg, policy=FP32_POLICY).init(jax.random.key(0),
                                             tokens)["params"]
    trained = jax.tree_util.tree_map_with_path(
        lambda pt, x: (x + 1.0 if "lora_" in jax.tree_util.keystr(pt)
                       else x), p)
    adapters = extract_adapters(trained)
    assert len(adapters) == 8 and all("lora_" in k for k in adapters)
    back = inject_adapters(p, adapters)
    for pt, x in jax.tree_util.tree_leaves_with_path(back):
        k = jax.tree_util.keystr(pt)
        if "lora_" in k:
            np.testing.assert_array_equal(np.asarray(x),
                                          np.asarray(adapters[k]))
    with pytest.raises(ValueError):
        inject_adapters(p, {**adapters, "bogus": np.zeros(2)})

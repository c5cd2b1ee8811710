"""Pair-scan decoder (GPT3Config.layer_pairing): exact equivalence with
the plain scanned stack — forward logits, gradients through the prefix,
and the KV-cache decode path — given the same per-layer weights."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from youku_mplug_tpu.models.gpt3 import GPT3Config, GPT3LM
from youku_mplug_tpu.runtime.precision import FP32_POLICY

V, H, L, N = 53, 32, 4, 4
BASE = GPT3Config(vocab_size=V, hidden_size=H, num_hidden_layers=L,
                  num_attention_heads=N, max_position_embeddings=64,
                  hidden_dropout=0.0, attention_dropout=0.0,
                  scan_layers=True, remat=True)
PAIR = dataclasses.replace(BASE, layer_pairing=True)


def _restack_to_pairs(params):
    """[L, ...] scanned layer leaves -> {'a': [L/2,...], 'b': [L/2,...]}"""
    params = jax.tree.map(lambda x: x, params)  # deep copy
    layers = params["decoder"]["layers"]
    params["decoder"]["layers"] = {
        "a": jax.tree.map(lambda x: x[0::2], layers),
        "b": jax.tree.map(lambda x: x[1::2], layers),
    }
    return params


@pytest.fixture(scope="module")
def both_params():
    model = GPT3LM(BASE, policy=FP32_POLICY)
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, 4), jnp.int32))["params"]
    return params, _restack_to_pairs(params)


def test_pairing_active_guards():
    assert PAIR.pairing_active
    odd = dataclasses.replace(PAIR, num_hidden_layers=3)
    assert not odd.pairing_active
    noscan = dataclasses.replace(PAIR, scan_layers=False)
    assert not noscan.pairing_active


def test_pairing_logits_match(both_params):
    params, pair_params = both_params
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, V, (2, 10)), jnp.int32)
    base = GPT3LM(BASE, policy=FP32_POLICY).apply(
        {"params": params}, ids, return_logits=True)["logits"]
    pair = GPT3LM(PAIR, policy=FP32_POLICY).apply(
        {"params": pair_params}, ids, return_logits=True)["logits"]
    np.testing.assert_allclose(np.asarray(pair), np.asarray(base),
                               rtol=1e-5, atol=1e-5)


def test_pairing_param_shapes(both_params):
    _, pair_params = both_params
    model = GPT3LM(PAIR, policy=FP32_POLICY)
    fresh = model.init(jax.random.key(1),
                       jnp.zeros((1, 4), jnp.int32))["params"]
    want = jax.tree.map(lambda x: x.shape, fresh)
    got = jax.tree.map(lambda x: x.shape, pair_params)
    assert want == got  # restacked tree is exactly the native pair layout


def test_pairing_grads_match(both_params):
    """Gradients through a query prefix (the trained path when the
    decoder is frozen) must be identical."""
    params, pair_params = both_params
    rng = np.random.default_rng(1)
    emb = jnp.asarray(rng.normal(size=(2, 6, H)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, V, (2, 6)), jnp.int32)
    mask = jnp.ones((2, 5), jnp.float32)

    def loss(e, cfg, p):
        out = GPT3LM(cfg, policy=FP32_POLICY).apply(
            {"params": p}, input_embeds=e, labels=labels, loss_mask=mask)
        return out["loss"]

    g_base = jax.grad(loss)(emb, BASE, params)
    g_pair = jax.grad(loss)(emb, PAIR, pair_params)
    np.testing.assert_allclose(np.asarray(g_pair), np.asarray(g_base),
                               rtol=1e-5, atol=1e-5)


def test_pairing_decode_matches(both_params):
    """KV-cache decode (prefill + steps) under the pair cache reshape."""
    params, pair_params = both_params
    rng = np.random.default_rng(2)
    emb = jnp.asarray(rng.normal(size=(2, 5, H)).astype(np.float32))

    def decode(cfg, p):
        model = GPT3LM(cfg, policy=FP32_POLICY)
        cache = model.apply({"params": p}, 2, 16,
                            method=GPT3LM.init_cache)
        logits, cache = model.apply({"params": p}, emb, cache,
                                    jnp.int32(0), method=GPT3LM.decode_step)
        toks = [jnp.argmax(logits, -1)]
        for t in range(3):
            e = model.apply({"params": p}, toks[-1][:, None],
                            method=GPT3LM.embed)
            logits, cache = model.apply(
                {"params": p}, e, cache, jnp.int32(5 + t),
                method=GPT3LM.decode_step)
            toks.append(jnp.argmax(logits, -1))
        return np.asarray(jnp.stack(toks, 1))

    np.testing.assert_array_equal(decode(PAIR, pair_params),
                                  decode(BASE, params))


def test_pairing_importer_layout():
    """gpt3_params_from_torch(layer_pairing=True) produces the native
    pair layout for a synthetic megatron state dict."""
    from youku_mplug_tpu.models.importers import gpt3_params_from_torch

    rng = np.random.default_rng(3)
    h, n, L_ = H, N, 4
    sd = {}
    lm = "language_model."
    sd[lm + "embedding.word_embeddings.weight"] = rng.normal(
        size=(V, h)).astype(np.float32)
    sd[lm + "embedding.position_embeddings.weight"] = rng.normal(
        size=(64, h)).astype(np.float32)
    sd[lm + "transformer.final_layernorm.weight"] = np.ones(h, np.float32)
    sd[lm + "transformer.final_layernorm.bias"] = np.zeros(h, np.float32)
    for i in range(L_):
        t = lm + f"transformer.layers.{i}."
        sd[t + "input_layernorm.weight"] = np.ones(h, np.float32)
        sd[t + "input_layernorm.bias"] = np.zeros(h, np.float32)
        sd[t + "post_attention_layernorm.weight"] = np.ones(h, np.float32)
        sd[t + "post_attention_layernorm.bias"] = np.zeros(h, np.float32)
        sd[t + "attention.query_key_value.weight"] = rng.normal(
            size=(3 * h, h)).astype(np.float32)
        sd[t + "attention.query_key_value.bias"] = rng.normal(
            size=(3 * h,)).astype(np.float32)
        sd[t + "attention.dense.weight"] = rng.normal(
            size=(h, h)).astype(np.float32)
        sd[t + "attention.dense.bias"] = np.zeros(h, np.float32)
        sd[t + "mlp.dense_h_to_4h.weight"] = rng.normal(
            size=(4 * h, h)).astype(np.float32)
        sd[t + "mlp.dense_h_to_4h.bias"] = np.zeros(4 * h, np.float32)
        sd[t + "mlp.dense_4h_to_h.weight"] = rng.normal(
            size=(h, 4 * h)).astype(np.float32)
        sd[t + "mlp.dense_4h_to_h.bias"] = np.zeros(h, np.float32)

    flat = gpt3_params_from_torch(sd, BASE, scan_layers=True)
    paired = gpt3_params_from_torch(sd, PAIR, scan_layers=True,
                                    layer_pairing=True)
    pl = paired["decoder"]["layers"]
    assert set(pl) == {"a", "b"}
    np.testing.assert_array_equal(
        pl["a"]["attn"]["qkv_kernel"],
        flat["decoder"]["layers"]["attn"]["qkv_kernel"][0::2])
    np.testing.assert_array_equal(
        pl["b"]["mlp"]["fc1_kernel"],
        flat["decoder"]["layers"]["mlp"]["fc1_kernel"][1::2])

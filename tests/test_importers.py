"""Torch-checkpoint importer tests: saved torch checkpoints load into our
param trees and reproduce the oracle's outputs."""

import os
from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from youku_mplug_tpu.models.gpt3 import GPT3Config, GPT3LM
from youku_mplug_tpu.models.importers import (
    gpt3_params_from_torch,
    load_torch_gpt3_state,
    merge_into,
    resize_pos_embed,
    resize_temporal_embed,
    vision_params_from_torch,
)
from youku_mplug_tpu.models.vision import TimeSformer, VisionConfig
from youku_mplug_tpu.runtime.precision import FP32_POLICY

from tests.oracle import load_reference_module

torch = pytest.importorskip("torch")

V, H, L, N = 97, 32, 2, 4


@pytest.fixture(scope="module")
def oracle_ckpt(tmp_path_factory):
    mod = load_reference_module("models/modeling_gpt3.py", "ref_gpt3_imp")
    cfg = mod.GPT3Config(
        vocab_size=V, hidden_size=H, num_hidden_layers=L,
        num_attention_heads=N, max_position_embeddings=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layernorm_epsilon=1e-5)
    torch.manual_seed(7)
    model = mod.GPT3Model(cfg).eval()
    for layer in model.language_model.transformer.layers:
        layer.mlp.activation_func = (
            lambda x: torch.nn.functional.gelu(x, approximate="tanh"))
    d = tmp_path_factory.mktemp("ckpt")
    torch.save({"module": model.state_dict()},
               str(d / "pytorch_model.bin"))
    return model, str(d)


def test_gpt3_import_twin_layout(oracle_ckpt):
    """pytorch_model.bin (twin layout) -> our decoder -> logits parity."""
    oracle, model_dir = oracle_ckpt
    sd = load_torch_gpt3_state(model_dir)
    cfg = GPT3Config(vocab_size=V, hidden_size=H, num_hidden_layers=L,
                     num_attention_heads=N, max_position_embeddings=64,
                     layernorm_epsilon=1e-5, hidden_dropout=0.0,
                     attention_dropout=0.0)
    imported = gpt3_params_from_torch(sd, cfg, megatron_qkv=False)

    ours = GPT3LM(cfg, policy=FP32_POLICY)
    params = ours.init(jax.random.key(0),
                       jnp.zeros((1, 4), jnp.int32))["params"]
    n = merge_into(params, imported)
    assert n > 10

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, V, size=(2, 7))
    with torch.no_grad():
        want = oracle(input_ids=torch.tensor(tokens))["logits"].numpy()
    got = ours.apply({"params": params}, jnp.asarray(tokens),
                     return_logits=True)["logits"]
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_megatron_qkv_interleave(oracle_ckpt):
    """Reordering twin-layout QKV rows into megatron's head-major layout
    and importing with megatron_qkv=True must give identical kernels."""
    _, model_dir = oracle_ckpt
    sd = load_torch_gpt3_state(model_dir)
    cfg = GPT3Config(vocab_size=V, hidden_size=H, num_hidden_layers=L,
                     num_attention_heads=N, max_position_embeddings=64)
    twin = gpt3_params_from_torch(sd, cfg, megatron_qkv=False)

    d = H // N
    sd2 = dict(sd)
    for i in range(L):
        key = f"language_model.transformer.layers.{i}." \
              f"attention.query_key_value."
        w = sd[key + "weight"]  # [3H, H], rows (3, n, d)
        sd2[key + "weight"] = w.reshape(3, N, d, H).transpose(
            1, 0, 2, 3).reshape(3 * H, H)
        b = sd[key + "bias"]
        sd2[key + "bias"] = b.reshape(3, N, d).transpose(1, 0, 2).reshape(-1)
    mega = gpt3_params_from_torch(sd2, cfg, megatron_qkv=True)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(mega["decoder"])[0]),
        np.asarray(jax.tree.leaves(twin["decoder"])[0]))
    qk_t = twin["decoder"]["layers"]["attn"]["qkv_kernel"]
    qk_m = mega["decoder"]["layers"]["attn"]["qkv_kernel"]
    np.testing.assert_allclose(np.asarray(qk_m), np.asarray(qk_t))


def test_vision_import_from_reference_timesformer():
    ref_mod = load_reference_module("models/vision_transformer.py",
                                    "ref_vision_imp")
    torch.manual_seed(3)
    ref = ref_mod.TimeSformer(
        img_size=16, num_frames=2, patch_size=8, embed_dim=16, depth=2,
        num_heads=2, mlp_ratio=4.0, qkv_bias=True,
        norm_layer=partial(ref_mod.LayerNormWithForceFP32, eps=1e-6),
        init_std=0.02).eval()
    with torch.no_grad():
        ref.temporal_embed.normal_(0, 0.02)
        ref.cls_token.normal_(0, 0.02)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    # fuse q/v biases back into qkv.bias form to exercise the converter
    for i in range(2):
        b = f"blocks.{i}."
        for a in ("attn.", "temporal_attn."):
            q = sd.pop(b + a + "q_bias")
            v = sd.pop(b + a + "v_bias")
            sd[b + a + "qkv.bias"] = np.concatenate(
                [q, np.zeros_like(q), v])

    cfg = VisionConfig(img_size=16, patch_size=8, embed_dim=16, depth=2,
                       num_heads=2, num_frames=2, mlp_ratio=4.0)
    imported = vision_params_from_torch(sd, cfg)

    ours = TimeSformer(cfg, policy=FP32_POLICY)
    video = np.random.default_rng(0).normal(
        size=(2, 3, 2, 16, 16)).astype(np.float32)
    params = ours.init(jax.random.key(0), jnp.asarray(video))["params"]
    merge_into(params, imported)

    with torch.no_grad():
        want_pooled, want_tokens = ref(torch.tensor(video))
    pooled, tokens = ours.apply({"params": params}, jnp.asarray(video))
    np.testing.assert_allclose(np.asarray(tokens), want_tokens.numpy(),
                               rtol=5e-4, atol=5e-4)


def test_pos_embed_resize():
    posemb = np.random.default_rng(0).normal(
        size=(1, 1 + 4, 8)).astype(np.float32)
    out = resize_pos_embed(posemb, 16)  # 2x2 -> 4x4 grid
    assert out.shape == (1, 17, 8)
    np.testing.assert_allclose(out[:, 0], posemb[:, 0])  # cls kept


def test_pos_embed_resize_matches_torch():
    """Exact vs the reference's F.interpolate(mode='bilinear',
    align_corners=False) (vision_transformer.py:731-749), including a
    1024-dim grid (where the old cv2 path crashed at OpenCV's
    512-channel cap — the ViT-L regression the full-shape owl import
    test caught)."""
    for gs_old, gs_new, dim in ((14, 16, 1024), (7, 14, 768),
                                (16, 10, 32)):
        posemb = np.random.default_rng(gs_old).normal(
            size=(1, 1 + gs_old * gs_old, dim)).astype(np.float32)
        out = resize_pos_embed(posemb, gs_new * gs_new)
        grid = torch.tensor(posemb[0, 1:]).reshape(
            1, gs_old, gs_old, dim).permute(0, 3, 1, 2)
        want = torch.nn.functional.interpolate(
            grid, size=(gs_new, gs_new), mode="bilinear"
        ).permute(0, 2, 3, 1).reshape(1, gs_new * gs_new, dim).numpy()
        np.testing.assert_allclose(out[:, 1:], want, rtol=2e-5,
                                   atol=2e-6)
        np.testing.assert_allclose(out[:, 0], posemb[:, 0])


def test_temporal_embed_resize_matches_torch():
    temb = np.random.default_rng(1).normal(size=(1, 4, 6)).astype(
        np.float32)
    out = resize_temporal_embed(temb, 8)
    want = torch.nn.functional.interpolate(
        torch.tensor(temb).permute(0, 2, 1), 8,
        mode="linear").permute(0, 2, 1).numpy()
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)


def test_multi_shard_mp_rank_merge(tmp_path, oracle_ckpt):
    """Split the oracle checkpoint into two megatron-style mp_rank shards
    and verify load_torch_gpt3_state reassembles the exact tensors."""
    import os

    from youku_mplug_tpu.models.importers import (
        _partition_dim,
        load_torch_gpt3_state,
    )

    _, model_dir = oracle_ckpt
    full = load_torch_gpt3_state(model_dir)

    shard_dir = tmp_path / "sharded" / "model"
    os.makedirs(shard_dir)
    shards = [{}, {}]
    for name, arr in full.items():
        dim = _partition_dim(name)
        t = torch.tensor(arr)
        if dim is None:
            shards[0][name] = t
            shards[1][name] = t
        else:
            a, b = torch.chunk(t, 2, dim=dim)
            shards[0][name], shards[1][name] = a, b
    for r in range(2):
        torch.save({"module": shards[r]},
                   str(shard_dir / f"mp_rank_0{r}_model_states.pt"))

    merged = load_torch_gpt3_state(str(tmp_path / "sharded"))
    assert set(merged) == set(full)
    for name in full:
        np.testing.assert_array_equal(merged[name], full[name],
                                      err_msg=name)

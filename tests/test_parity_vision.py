"""Vision encoder parity vs the reference TimeSformer / AttentionPool
(/root/reference/models/vision_transformer.py) on identical weights."""

from functools import partial

import numpy as np
import pytest

import jax.numpy as jnp

from youku_mplug_tpu.models.vision import (
    AttentionPool,
    TimeSformer,
    VisionConfig,
    VisionTransformer,
)
from youku_mplug_tpu.runtime.precision import FP32_POLICY

from tests.oracle import load_reference_module

torch = pytest.importorskip("torch")

# tiny geometry: 16px image, 8px patches -> N=4 patches, T=2 frames
DIM, HEADS, DEPTH, T, IMG, PATCH = 16, 2, 2, 2, 16, 8
HD = DIM // HEADS


@pytest.fixture(scope="module")
def ref_mod():
    return load_reference_module(
        "models/vision_transformer.py", "ref_vision")


def _attn_params(prefix, sd):
    return {
        "qkv_kernel": jnp.asarray(
            sd[prefix + "qkv.weight"].T.reshape(DIM, 3, HEADS, HD)),
        "q_bias": jnp.asarray(sd[prefix + "q_bias"].reshape(HEADS, HD)),
        "v_bias": jnp.asarray(sd[prefix + "v_bias"].reshape(HEADS, HD)),
        "proj_kernel": jnp.asarray(
            sd[prefix + "proj.weight"].T.reshape(HEADS, HD, DIM)),
        "proj_bias": jnp.asarray(sd[prefix + "proj.bias"]),
    }


def _ln(prefix, sd):
    return {"scale": jnp.asarray(sd[prefix + "weight"]),
            "bias": jnp.asarray(sd[prefix + "bias"])}


def _mlp(prefix, sd):
    return {
        "fc1_kernel": jnp.asarray(sd[prefix + "fc1.weight"].T),
        "fc1_bias": jnp.asarray(sd[prefix + "fc1.bias"]),
        "fc2_kernel": jnp.asarray(sd[prefix + "fc2.weight"].T),
        "fc2_bias": jnp.asarray(sd[prefix + "fc2.bias"]),
    }


def test_timesformer_parity(ref_mod):
    torch.manual_seed(0)
    ref = ref_mod.TimeSformer(
        img_size=IMG, num_frames=T, patch_size=PATCH, embed_dim=DIM,
        depth=DEPTH, num_heads=HEADS, mlp_ratio=4.0, qkv_bias=True,
        norm_layer=partial(ref_mod.LayerNormWithForceFP32, eps=1e-6),
        init_std=0.02).eval()
    # make the learned embeddings non-trivial
    with torch.no_grad():
        ref.temporal_embed.normal_(0, 0.02)
        ref.cls_token.normal_(0, 0.02)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    params = {
        "patch_embed": {
            "kernel": jnp.asarray(
                sd["patch_embed.proj.weight"].reshape(DIM, -1).T),
            "bias": jnp.asarray(sd["patch_embed.proj.bias"]),
        },
        "cls_token": jnp.asarray(sd["cls_token"]),
        "pos_embed": jnp.asarray(sd["pos_embed"]),
        "temporal_embed": jnp.asarray(sd["temporal_embed"]),
        "norm": _ln("norm.", sd),
    }
    for i in range(DEPTH):
        b = f"blocks.{i}."
        params[f"blocks_{i}"] = {
            "temporal_ln": _ln(b + "temporal_ln.", sd),
            "temporal_attn": _attn_params(b + "temporal_attn.", sd),
            "temporal_fc_kernel": jnp.asarray(sd[b + "temporal_fc.weight"].T),
            "temporal_fc_bias": jnp.asarray(sd[b + "temporal_fc.bias"]),
            "norm1": _ln(b + "norm1.", sd),
            "attn": _attn_params(b + "attn.", sd),
            "norm2": _ln(b + "norm2.", sd),
            "mlp": _mlp(b + "mlp.", sd),
        }

    # gelu="erf" pinned explicitly: reference uses torch nn.GELU (exact
    # erf); the production default is the tanh approximation (PARITY.md),
    # which is deliberately NOT what this strict-parity test exercises.
    cfg = VisionConfig(img_size=IMG, patch_size=PATCH, embed_dim=DIM,
                       depth=DEPTH, num_heads=HEADS, num_frames=T,
                       mlp_ratio=4.0, gelu="erf")
    ours = TimeSformer(cfg, policy=FP32_POLICY)

    rng = np.random.default_rng(0)
    video = rng.normal(size=(2, 3, T, IMG, IMG)).astype(np.float32)

    with torch.no_grad():
        ref_pooled, ref_tokens = ref(torch.tensor(video))

    pooled, tokens = ours.apply({"params": params}, jnp.asarray(video))
    np.testing.assert_allclose(np.asarray(tokens), ref_tokens.numpy(),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled.numpy(),
                               rtol=5e-4, atol=5e-4)


def test_attention_pool_parity(ref_mod):
    torch.manual_seed(1)
    ref = ref_mod.AttentionPool(
        DIM, num_heads=HEADS, mlp_ratio=4.0,
        norm_layer=partial(ref_mod.LayerNormWithForceFP32, eps=1e-6)).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    w = sd["attn.in_proj_weight"]  # [3D, D]
    bias = sd["attn.in_proj_bias"]
    params = {
        "norm1": _ln("norm1.", sd),
        "normk": _ln("normk.", sd),
        "norm2": _ln("norm2.", sd),
        "q_kernel": jnp.asarray(w[:DIM].T),
        "k_kernel": jnp.asarray(w[DIM:2 * DIM].T),
        "v_kernel": jnp.asarray(w[2 * DIM:].T),
        "q_bias": jnp.asarray(bias[:DIM]),
        "k_bias": jnp.asarray(bias[DIM:2 * DIM]),
        "v_bias": jnp.asarray(bias[2 * DIM:]),
        "bias_k": jnp.asarray(sd["attn.bias_k"]),
        "bias_v": jnp.asarray(sd["attn.bias_v"]),
        "out_kernel": jnp.asarray(sd["attn.out_proj.weight"].T),
        "out_bias": jnp.asarray(sd["attn.out_proj.bias"]),
        "mlp": _mlp("mlp.", sd),
    }

    ours = AttentionPool(DIM, HEADS, mlp_ratio=4.0, gelu="erf")
    rng = np.random.default_rng(2)
    queries = rng.normal(size=(2, 5, DIM)).astype(np.float32)
    keys = rng.normal(size=(2, 9, DIM)).astype(np.float32)

    with torch.no_grad():
        want = ref(torch.tensor(queries), torch.tensor(keys))
    got = ours.apply({"params": params}, jnp.asarray(queries),
                     jnp.asarray(keys))
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=5e-4, atol=5e-4)


def test_vit_parity(ref_mod):
    torch.manual_seed(3)
    ref = ref_mod.VisionTransformer(
        img_size=IMG, patch_size=PATCH, embed_dim=DIM, depth=DEPTH,
        num_heads=HEADS, mlp_ratio=4.0, qkv_bias=True,
        norm_layer=partial(ref_mod.LayerNormWithForceFP32, eps=1e-6)).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    params = {
        "patch_embed": {
            "kernel": jnp.asarray(
                sd["patch_embed.proj.weight"].reshape(DIM, -1).T),
            "bias": jnp.asarray(sd["patch_embed.proj.bias"]),
        },
        "cls_token": jnp.asarray(sd["cls_token"]),
        "pos_embed": jnp.asarray(sd["pos_embed"]),
        "norm": _ln("norm.", sd),
    }
    for i in range(DEPTH):
        b = f"blocks.{i}."
        params[f"blocks_{i}"] = {
            "norm1": _ln(b + "norm1.", sd),
            "attn": _attn_params(b + "attn.", sd),
            "norm2": _ln(b + "norm2.", sd),
            "mlp": _mlp(b + "mlp.", sd),
        }

    cfg = VisionConfig(img_size=IMG, patch_size=PATCH, embed_dim=DIM,
                       depth=DEPTH, num_heads=HEADS, mlp_ratio=4.0,
                       gelu="erf")
    ours = VisionTransformer(cfg, policy=FP32_POLICY)

    rng = np.random.default_rng(4)
    images = rng.normal(size=(2, 3, IMG, IMG)).astype(np.float32)
    with torch.no_grad():
        ref_pooled, ref_tokens = ref(torch.tensor(images))
    pooled, tokens = ours.apply({"params": params}, jnp.asarray(images))
    np.testing.assert_allclose(np.asarray(tokens), ref_tokens.numpy(),
                               rtol=5e-4, atol=5e-4)


def test_mlp_gelu_flavors():
    """VisionConfig.gelu: "erf" matches torch nn.GELU exactly; the
    production "tanh" default stays within bf16 resolution of it across
    the full activation range (the TPU default trades a <1e-3 abs
    approximation for ~2.7x faster fc2 fusions — BENCHLOG session 5)."""
    import torch.nn.functional as F

    from youku_mplug_tpu.models.vision import Mlp

    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 64), scale=3.0).astype(np.float32)
    kp = {"fc1_kernel": jnp.eye(64), "fc1_bias": jnp.zeros(64),
          "fc2_kernel": jnp.eye(64), "fc2_bias": jnp.zeros(64)}

    exact = Mlp(64, 64, gelu="erf").apply({"params": kp}, jnp.asarray(x))
    approx = Mlp(64, 64, gelu="tanh").apply({"params": kp}, jnp.asarray(x))
    ref = F.gelu(torch.tensor(x), approximate="none").numpy()

    np.testing.assert_allclose(np.asarray(exact), ref, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(approx), ref, atol=2e-3)

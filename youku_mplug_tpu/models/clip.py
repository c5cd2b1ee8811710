"""OpenAI CLIP (ViT visual tower + causal text transformer), TPU-native.

Re-implements the reference's vendored CLIP (reference:
models/clip/model.py — ResidualAttentionBlock:171, Transformer:196,
VisualTransformer:255, CLIP text stack + build_model:468), which the
GPT-3 runners use as the vision weight source and the XCLIP path builds
on.  QuickGELU (x * sigmoid(1.702x)), pre-LN residual blocks, fp32-island
layernorms; the visual tower ends in ln_post + projection, the text tower
in ln_final + text_projection at the argmax (EOT) token.

Includes a one-way importer from OpenAI CLIP state dicts
(clip_params_from_torch), reusing the torch MHA packed-QKV layout.
ModifiedResNet towers are out of scope (no config in the reference uses
them for video).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from youku_mplug_tpu.ops.attention import mha_reference
from youku_mplug_tpu.ops.layernorm import layer_norm
from youku_mplug_tpu.runtime.precision import Policy, DEFAULT_POLICY


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    image_resolution: int = 224
    vision_width: int = 768
    vision_layers: int = 12
    vision_patch_size: int = 16
    embed_dim: int = 512
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12

    @property
    def vision_heads(self) -> int:
        return self.vision_width // 64


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class _LN(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return layer_norm(x, scale, bias, eps=1e-5)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    causal: bool = False

    @nn.compact
    def __call__(self, x):
        d = self.width // self.heads
        h = _LN(self.width, name="ln_1")(x)
        qkv = nn.Dense(3 * self.width, name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, s = x.shape[:2]

        def split(t):
            return t.reshape(b, s, self.heads, d).transpose(0, 2, 1, 3)

        out = mha_reference(split(q), split(k), split(v),
                            causal=self.causal)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, self.width)
        x = x + nn.Dense(self.width, name="out_proj")(out)
        h = _LN(self.width, name="ln_2")(x)
        h = nn.Dense(self.width * 4, name="c_fc")(h)
        h = quick_gelu(h)
        x = x + nn.Dense(self.width, name="c_proj")(h)
        return x


class CLIPVisionTower(nn.Module):
    cfg: CLIPConfig
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, images):
        """images [B, 3, H, W] -> (projected patch tokens [B, N, E],
        raw tokens [B, 1+N, W]).  NB: the reference's vendored visual
        tower drops the cls token and projects ALL patch tokens
        (clip/model.py:300-308) — it is a feature extractor."""
        cfg = self.cfg
        w = cfg.vision_width
        p = cfg.vision_patch_size
        b, c, hh, ww = images.shape
        gh, gw = hh // p, ww // p
        kernel = self.param("conv1", nn.initializers.normal(w ** -0.5),
                            (c * p * p, w))
        x = images.astype(self.policy.compute_dtype)
        x = x.reshape(b, c, gh, p, gw, p).transpose(0, 2, 4, 1, 3, 5)
        x = x.reshape(b, gh * gw, c * p * p) @ kernel.astype(x.dtype)
        cls = self.param("class_embedding",
                         nn.initializers.normal(w ** -0.5), (w,))
        pos = self.param("positional_embedding",
                         nn.initializers.normal(w ** -0.5),
                         (gh * gw + 1, w))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, w)).astype(x.dtype), x], axis=1)
        x = x + pos.astype(x.dtype)
        x = _LN(w, name="ln_pre")(x)
        for i in range(cfg.vision_layers):
            x = ResidualAttentionBlock(w, cfg.vision_heads,
                                       name=f"block_{i}")(x)
        patches = _LN(w, name="ln_post")(x[:, 1:, :])
        proj = self.param("proj", nn.initializers.normal(w ** -0.5),
                          (w, cfg.embed_dim))
        return patches @ proj.astype(patches.dtype), x


class CLIPTextTower(nn.Module):
    cfg: CLIPConfig
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, text_ids):
        cfg = self.cfg
        w = cfg.transformer_width
        tok = nn.Embed(cfg.vocab_size, w,
                       embedding_init=nn.initializers.normal(0.02),
                       name="token_embedding")(text_ids)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01),
                         (cfg.context_length, w))
        s = text_ids.shape[1]
        x = tok + pos[:s].astype(tok.dtype)
        for i in range(cfg.transformer_layers):
            x = ResidualAttentionBlock(w, cfg.transformer_heads, causal=True,
                                       name=f"block_{i}")(x)
        x = _LN(w, name="ln_final")(x)
        proj = self.param("text_projection",
                          nn.initializers.normal(w ** -0.5),
                          (w, cfg.embed_dim))
        eot = jnp.argmax(text_ids, axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eot]
        return pooled @ proj.astype(x.dtype), x


class CLIP(nn.Module):
    """Dual tower with learned logit scale (reference CLIP class)."""

    cfg: CLIPConfig
    policy: Policy = DEFAULT_POLICY

    def setup(self):
        self.visual = CLIPVisionTower(self.cfg, policy=self.policy,
                                      name="visual")
        self.text = CLIPTextTower(self.cfg, policy=self.policy, name="text")
        self.logit_scale = self.param(
            "logit_scale", lambda k: jnp.asarray(np.log(1 / 0.07),
                                                 jnp.float32))

    def encode_image(self, images):
        feat, _ = self.visual(images)
        return feat

    def encode_text(self, text_ids):
        feat, _ = self.text(text_ids)
        return feat

    def __call__(self, images, text_ids):
        # the vendored tower yields patch features; pool for the
        # contrastive logits (its own forward path is dormant upstream)
        im = self.encode_image(images).mean(axis=1).astype(jnp.float32)
        tx = self.encode_text(text_ids).astype(jnp.float32)
        im = im / jnp.linalg.norm(im, axis=-1, keepdims=True)
        tx = tx / jnp.linalg.norm(tx, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        return scale * im @ tx.T, scale * tx @ im.T


def clip_params_from_torch(sd: dict, cfg: CLIPConfig) -> dict:
    """OpenAI CLIP state dict (numpy values) -> our param tree."""
    def ln(p):
        return {"scale": sd[p + ".weight"], "bias": sd[p + ".bias"]}

    def block(prefix):
        return {
            "ln_1": ln(prefix + ".ln_1"),
            "ln_2": ln(prefix + ".ln_2"),
            "in_proj": {"kernel": sd[prefix + ".attn.in_proj_weight"].T,
                        "bias": sd[prefix + ".attn.in_proj_bias"]},
            "out_proj": {"kernel": sd[prefix + ".attn.out_proj.weight"].T,
                         "bias": sd[prefix + ".attn.out_proj.bias"]},
            "c_fc": {"kernel": sd[prefix + ".mlp.c_fc.weight"].T,
                     "bias": sd[prefix + ".mlp.c_fc.bias"]},
            "c_proj": {"kernel": sd[prefix + ".mlp.c_proj.weight"].T,
                       "bias": sd[prefix + ".mlp.c_proj.bias"]},
        }

    conv = sd["visual.conv1.weight"]  # [W, 3, p, p]
    visual = {
        "conv1": conv.reshape(conv.shape[0], -1).T,
        "class_embedding": sd["visual.class_embedding"],
        "positional_embedding": sd["visual.positional_embedding"],
        "ln_pre": ln("visual.ln_pre"),
        "ln_post": ln("visual.ln_post"),
        "proj": sd["visual.proj"],
    }
    for i in range(cfg.vision_layers):
        visual[f"block_{i}"] = block(f"visual.transformer.resblocks.{i}")
    text = {
        "token_embedding": {"embedding": sd["token_embedding.weight"]},
        "positional_embedding": sd["positional_embedding"],
        "ln_final": ln("ln_final"),
        "text_projection": sd["text_projection"],
    }
    for i in range(cfg.transformer_layers):
        text[f"block_{i}"] = block(f"transformer.resblocks.{i}")
    out = {"visual": visual, "text": text}
    if "logit_scale" in sd:
        out["logit_scale"] = sd["logit_scale"]
    return jax.tree.map(jnp.asarray, out)

"""GPT-2 multimodal decoder + MPLUG-COCA pretraining model.

TPU-native re-design of the reference's GPT-2 family (reference:
models/modelling_gpt2.py — GPT2MultiModalBlock:687 (per-mode MLP branches,
optional cross-attention), GPT2LMHeadMultiModalModel:1917;
models/model_pretrain_gpt.py — MPLUG_COCA:29-184 with its mixed
visual/text causal mask:160-178 and masked-image-modeling cosine loss).

GPT-2 specifics kept: learned positions, pre-LN blocks, tanh-approx GELU,
scaled init on residual projections, weight-tied LM head optional (the
reference uses an untied lm_head Linear).  The multimodal block owns TWO
FFNs — ``mlp`` (text mode) and ``mlp_vision`` (vision mode) — selected per
forward; the mixed causal mask lets text attend to all visual tokens while
visual tokens stay bidirectional.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from youku_mplug_tpu.models.vision import LayerNormFP32, VisionConfig, \
    VisionTransformer
from youku_mplug_tpu.ops.attention import mha_reference
from youku_mplug_tpu.ops.cross_entropy import cross_entropy_with_logits
from youku_mplug_tpu.runtime.precision import Policy, DEFAULT_POLICY


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 50257
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    layer_norm_epsilon: float = 1e-5
    initializer_range: float = 0.02
    add_cross_attention: bool = False

    @property
    def head_dim(self):
        return self.n_embd // self.n_head

    @classmethod
    def from_json_file(cls, path: str, **overrides):
        import json

        raw = json.load(open(path))
        known = {f.name for f in dataclasses.fields(cls)}
        mapped = {k: v for k, v in raw.items() if k in known}
        mapped.update(overrides)
        return cls(**mapped)


def _init(std):
    return nn.initializers.normal(stddev=std)


class GPT2Attention(nn.Module):
    cfg: GPT2Config
    is_cross: bool = False

    @nn.compact
    def __call__(self, x, attn_bias=None, kv=None):
        cfg = self.cfg
        n, d, e = cfg.n_head, cfg.head_dim, cfg.n_embd
        kv = x if kv is None else kv
        std = cfg.initializer_range
        scaled = std / (2 * cfg.n_layer) ** 0.5
        if self.is_cross:
            q = nn.Dense(e, kernel_init=_init(std), name="q_attn")(x)
            kvp = nn.Dense(2 * e, kernel_init=_init(std), name="c_attn")(kv)
            k, v = jnp.split(kvp, 2, axis=-1)
        else:
            qkv = nn.Dense(3 * e, kernel_init=_init(std), name="c_attn")(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        b, sq = x.shape[:2]
        sk = kv.shape[1]

        def split(t, s):
            return t.reshape(b, s, n, d).transpose(0, 2, 1, 3)

        out = mha_reference(split(q, sq), split(k, sk), split(v, sk),
                            bias=attn_bias)
        out = out.transpose(0, 2, 1, 3).reshape(b, sq, e)
        return nn.Dense(e, kernel_init=_init(scaled), name="c_proj")(out)


class GPT2MLP(nn.Module):
    cfg: GPT2Config

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        scaled = cfg.initializer_range / (2 * cfg.n_layer) ** 0.5
        h = nn.Dense(4 * cfg.n_embd, kernel_init=_init(cfg.initializer_range),
                     name="c_fc")(x)
        h = jax.nn.gelu(h, approximate=True)
        return nn.Dense(cfg.n_embd, kernel_init=_init(scaled),
                        name="c_proj")(h)


class GPT2MultiModalBlock(nn.Module):
    """Pre-LN block with per-mode FFN branches (reference
    GPT2MultiModalBlock:687-786)."""

    cfg: GPT2Config

    @nn.compact
    def __call__(self, x, attn_bias=None, enc=None, enc_bias=None,
                 mode: str = "text"):
        cfg = self.cfg
        e = cfg.n_embd
        h = LayerNormFP32(e, cfg.layer_norm_epsilon, name="ln_1")(x)
        x = x + GPT2Attention(cfg, name="attn")(h, attn_bias)
        if enc is not None:
            h = LayerNormFP32(e, cfg.layer_norm_epsilon,
                              name="ln_cross_attn")(x)
            x = x + GPT2Attention(cfg, is_cross=True,
                                  name="crossattention")(h, enc_bias, kv=enc)
        if mode == "text":
            h = LayerNormFP32(e, cfg.layer_norm_epsilon, name="ln_2")(x)
            x = x + GPT2MLP(cfg, name="mlp")(h)
        else:  # vision branch FFN
            h = LayerNormFP32(e, cfg.layer_norm_epsilon,
                              name="ln_2_vision")(x)
            x = x + GPT2MLP(cfg, name="mlp_vision")(h)
        return x


def mixed_causal_bias(visual_len: int, text_len: int, attention_mask,
                      mask_v2t: bool = True, full: bool = False):
    """COCA's mixed mask (reference model_pretrain_gpt.py:160-178):
    visual-visual bidirectional, text-text causal, text->visual allowed,
    visual->text blocked (unless full)."""
    s = visual_len + text_len
    m = jnp.zeros((s, s), jnp.float32)
    m = m.at[:visual_len, :visual_len].set(1.0)
    tri = jnp.tril(jnp.ones((text_len, text_len), jnp.float32))
    m = m.at[visual_len:, visual_len:].set(tri)
    m = m.at[visual_len:, :visual_len].set(1.0)  # text attends to visual
    if not mask_v2t or full:
        m = m.at[:visual_len, visual_len:].set(1.0)
    if full:
        m = jnp.ones((s, s), jnp.float32)
    ext = m[None] * attention_mask[:, None, :].astype(jnp.float32)
    return ((1.0 - ext) * -1e4)[:, None]


class GPT2MultiModalModel(nn.Module):
    """Embeddings + multimodal blocks + final LN + untied LM head."""

    cfg: GPT2Config
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, input_ids=None, inputs_embeds=None,
                 attn_bias=None, enc=None, enc_bias=None, mode="text",
                 position_ids=None):
        cfg = self.cfg
        if inputs_embeds is None:
            inputs_embeds = nn.Embed(
                cfg.vocab_size, cfg.n_embd, embedding_init=_init(0.02),
                name="wte")(input_ids)
        b, s = inputs_embeds.shape[:2]
        if position_ids is None:
            position_ids = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
        pos = nn.Embed(cfg.n_positions, cfg.n_embd,
                       embedding_init=_init(0.01), name="wpe")(position_ids)
        x = inputs_embeds + pos.astype(inputs_embeds.dtype)
        for i in range(cfg.n_layer):
            x = GPT2MultiModalBlock(cfg, name=f"h_{i}")(
                x, attn_bias, enc, enc_bias, mode)
        x = LayerNormFP32(cfg.n_embd, cfg.layer_norm_epsilon,
                          name="ln_f")(x)
        logits = nn.Dense(cfg.vocab_size, use_bias=False,
                          kernel_init=_init(0.02), name="lm_head")(
            x.astype(jnp.float32))
        return x, logits


@dataclasses.dataclass(frozen=True)
class COCAConfig:
    vision: VisionConfig = VisionConfig()
    gpt2: GPT2Config = GPT2Config()
    predict_feature_dim: int = 512
    only_masked: bool = False


class MPLUGCOCA(nn.Module):
    """COCA-style pretrain: caption LM + masked-image-modeling cosine loss
    (reference MPLUG_COCA.forward:97-157)."""

    cfg: COCAConfig
    policy: Policy = DEFAULT_POLICY

    def setup(self):
        cfg = self.cfg
        self.visual_encoder = VisionTransformer(cfg.vision,
                                                policy=self.policy,
                                                name="visual_encoder")
        self.text_decoder = GPT2MultiModalModel(cfg.gpt2,
                                                policy=self.policy,
                                                name="text_decoder")
        self.multimodal_decoder = GPT2MultiModalModel(
            cfg.gpt2, policy=self.policy, name="multimodal_decoder")
        self.visual_lm_head = nn.Dense(cfg.predict_feature_dim,
                                       name="visual_lm_head")
        self.mismatch = cfg.gpt2.n_embd != cfg.vision.embed_dim
        if self.mismatch:
            self.visual_fc = nn.Dense(cfg.gpt2.n_embd, name="visual_fc")
            self.visual_norm = LayerNormFP32(cfg.gpt2.n_embd, 1e-6,
                                             name="visual_norm")

    def _project(self, image_embeds):
        if self.mismatch:
            image_embeds = self.visual_norm(self.visual_fc(image_embeds))
        return image_embeds

    def __call__(self, images, input_ids, attention_mask,
                 bool_masked_pos=None, image_target=None,
                 deterministic=True):
        """-> dict(loss, loss_caption, loss_mim).

        bool_masked_pos: [B, N] patch mask for MIM; image_target: [B, N, F]
        regression targets (e.g. dVAE/feature targets).
        """
        _, image_embeds = self.visual_encoder(images,
                                              deterministic=deterministic)
        image_embeds = self._project(image_embeds)
        b, lv, _ = image_embeds.shape
        image_atts = jnp.ones((b, lv), jnp.int32)

        # text decoder provides text token features
        text_embeds, _ = self.text_decoder(
            input_ids=input_ids,
            attn_bias=mixed_causal_bias(0, input_ids.shape[1],
                                        attention_mask))

        lt = input_ids.shape[1]
        joint = jnp.concatenate([image_embeds, text_embeds], axis=1)
        joint_mask = jnp.concatenate([image_atts, attention_mask], axis=1)

        # caption branch: text-causal mixed mask, text-mode FFN
        _, logits = self.multimodal_decoder(
            inputs_embeds=joint,
            attn_bias=mixed_causal_bias(lv, lt, joint_mask), mode="text")
        logits = logits[:, lv:]
        shift_logits = logits[:, :-1]
        labels = input_ids[:, 1:]
        mask = attention_mask[:, 1:].astype(jnp.float32)
        losses = cross_entropy_with_logits(shift_logits, labels) * mask
        loss_caption = losses.sum() / jnp.maximum(mask.sum(), 1.0)

        out = {"loss_caption": loss_caption}
        loss_mim = jnp.asarray(0.0, jnp.float32)
        if bool_masked_pos is not None and image_target is not None:
            # MIM branch: full attention, vision-mode FFN, masked image
            # embeddings (mask token = zeros at masked patches)
            masked_embeds = self._project(jnp.where(
                bool_masked_pos[:, :, None], 0.0,
                self.visual_encoder(images,
                                    deterministic=deterministic)[1][:, 1:]))
            masked_joint = jnp.concatenate(
                [image_embeds[:, :1], masked_embeds, text_embeds], axis=1)
            feats, _ = self.multimodal_decoder(
                inputs_embeds=masked_joint,
                attn_bias=mixed_causal_bias(lv, lt, joint_mask, full=True),
                mode="vision")
            patch_feats = feats[:, 1:lv]  # drop cls
            pred = self.visual_lm_head(patch_feats.astype(jnp.float32))
            tgt = image_target.astype(jnp.float32)
            cos = jnp.sum(pred * tgt, -1) / (
                jnp.linalg.norm(pred, axis=-1)
                * jnp.linalg.norm(tgt, axis=-1) + 1e-8)
            m = bool_masked_pos.astype(jnp.float32)
            loss_mim = 1.0 - (cos * m).sum() / jnp.maximum(m.sum(), 1.0)
        out["loss_mim"] = loss_mim
        out["loss"] = loss_caption + loss_mim
        return out


def blockwise_mask(rng, batch: int, grid: int, num_masked: int):
    """Random patch mask for MIM (the capability of the reference's
    masking_generator.py, simplified to uniform sampling under jit)."""
    n = grid * grid
    scores = jax.random.uniform(rng, (batch, n))
    thresh = jnp.sort(scores, axis=1)[:, num_masked - 1][:, None]
    return scores <= thresh

"""ALPRO video-text models (ALBEF-style split-BERT fusion).

TPU-native re-design of the reference's ALPRO family (reference:
models/alpro.py — ALPRO_Pretrain:30, ALPRO_Retrieval:247, ALPRO_Cls:414;
models/modeling_alpro.py BertEncoder text/fusion modes:522-560):

- TimeSformer video encoder with **temporal mean pooling** of patch tokens
  (frames averaged before fusion, alpro.py:96-99)
- ONE BERT whose first ``fusion_layer`` layers encode text ('text' mode)
  and whose remaining layers self-attend over the concatenated
  [text; image] sequence ('fusion' mode) — expressed via the BertModel
  ``layer_range`` argument over a single parameter set
- ITA over the global batch (the reference's all_gather + rank-offset
  diagonal targets collapse to an identity target under GSPMD),
  hard-negative ITM, MLM through text+fusion.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from youku_mplug_tpu.models.bert import BertConfig, BertLayerNorm, \
    BertLMHead, BertModel
from youku_mplug_tpu.models.vision import TimeSformer, VisionConfig
from youku_mplug_tpu.ops.cross_entropy import cross_entropy_with_logits
from youku_mplug_tpu.runtime.precision import Policy, DEFAULT_POLICY


@dataclasses.dataclass(frozen=True)
class ALPROConfig:
    vision: VisionConfig = VisionConfig()
    bert: BertConfig = BertConfig()
    embed_dim: int = 256
    temp: float = 0.07
    mlm_probability: float = 0.15
    num_classes: int = 0


class ALPRO(nn.Module):
    cfg: ALPROConfig
    policy: Policy = DEFAULT_POLICY

    def setup(self):
        cfg = self.cfg
        self.visual_encoder = TimeSformer(cfg.vision, policy=self.policy,
                                          name="visual_encoder")
        self.bert = BertModel(cfg.bert, policy=self.policy,
                              name="text_encoder")
        self.mlm_head = BertLMHead(cfg.bert, name="mlm_head")
        w = cfg.bert.hidden_size
        self.large = w != cfg.vision.embed_dim
        if self.large:
            self.visn_fc = nn.Dense(w, name="visn_fc")
            self.visn_layer_norm = BertLayerNorm(w, 1e-12,
                                                 name="visn_layer_norm")
        self.vision_proj = nn.Dense(cfg.embed_dim, name="vision_proj")
        self.text_proj = nn.Dense(cfg.embed_dim, name="text_proj")
        self.itm_head = nn.Dense(2, name="itm_head")
        if cfg.num_classes:
            self.cls_fc1 = nn.Dense(w, name="cls_fc1")
            self.cls_fc2 = nn.Dense(cfg.num_classes, name="cls_fc2")
        self.temp = self.param(
            "temp", lambda k: jnp.asarray(cfg.temp, jnp.float32))

    # ------------------------------------------------------------------

    def encode_image(self, video, deterministic=True):
        """TimeSformer tokens with temporal mean over frames
        (reference alpro.py:96-99)."""
        t = video.shape[2]
        _, tokens = self.visual_encoder(video, deterministic=deterministic)
        cls_tok, patches = tokens[:, :1], tokens[:, 1:]
        b, tn, c = patches.shape
        patches = patches.reshape(b, t, tn // t, c).mean(axis=1)
        image_embeds = jnp.concatenate([cls_tok, patches], axis=1)
        if self.large:
            image_embeds = self.visn_layer_norm(self.visn_fc(image_embeds))
        return image_embeds

    def encode_text(self, input_ids, attention_mask, deterministic=True):
        return self.bert(input_ids, attention_mask,
                         layer_range=(0, self.cfg.bert.fusion_layer),
                         deterministic=deterministic)

    def fuse(self, text_embeds, text_mask, image_embeds, image_mask,
             deterministic=True):
        """Joint self-attention over [text; image] through the upper
        layers (reference 'fusion' mode)."""
        joint = jnp.concatenate([text_embeds, image_embeds], axis=1)
        mask = jnp.concatenate([text_mask, image_mask], axis=1)
        return self.bert(
            encoder_embeds=joint, attention_mask=mask,
            layer_range=(self.cfg.bert.fusion_layer,
                         self.cfg.bert.num_hidden_layers),
            deterministic=deterministic)

    # ------------------------------------------------------------------

    def pretrain_loss(self, video, input_ids, attention_mask,
                      mlm_input_ids, mlm_labels, rng=None,
                      deterministic=True):
        cfg = self.cfg
        temp = jnp.clip(self.temp, 0.001, 0.5)
        b = video.shape[0]
        image_embeds = self.encode_image(video, deterministic)
        image_atts = jnp.ones(image_embeds.shape[:2], jnp.int32)
        image_feat = self.vision_proj(image_embeds[:, 0].astype(jnp.float32))
        image_feat = image_feat / jnp.linalg.norm(image_feat, -1,
                                                  keepdims=True)
        text_embeds = self.encode_text(input_ids, attention_mask,
                                       deterministic)
        text_feat = self.text_proj(text_embeds[:, 0].astype(jnp.float32))
        text_feat = text_feat / jnp.linalg.norm(text_feat, -1, keepdims=True)

        sim_i2t = image_feat @ text_feat.T / temp
        sim_t2i = text_feat @ image_feat.T / temp
        targets = jnp.eye(b)
        loss_ita = 0.5 * (
            -(jax.nn.log_softmax(sim_i2t, -1) * targets).sum(-1).mean()
            - (jax.nn.log_softmax(sim_t2i, -1) * targets).sum(-1).mean())

        # ITM with in-batch hard negatives
        fused_pos = self.fuse(text_embeds, attention_mask, image_embeds,
                              image_atts, deterministic)
        neg_rng = rng if rng is not None else self.make_rng("dropout")
        k1, k2 = jax.random.split(jax.random.fold_in(neg_rng, 11))
        diag = jnp.where(jnp.eye(b, dtype=bool), -1e9, 0.0)
        neg_img = jax.random.categorical(k1, sim_t2i + diag, axis=1)
        neg_txt = jax.random.categorical(k2, sim_i2t + diag, axis=1)
        text_all = jnp.concatenate([text_embeds, text_embeds[neg_txt]], 0)
        tmask_all = jnp.concatenate([attention_mask,
                                     attention_mask[neg_txt]], 0)
        image_all = jnp.concatenate([image_embeds[neg_img], image_embeds], 0)
        imask_all = jnp.concatenate([image_atts, image_atts], 0)
        fused_neg = self.fuse(text_all, tmask_all, image_all, imask_all,
                              deterministic)
        vl = jnp.concatenate([fused_pos[:, 0], fused_neg[:, 0]], 0)
        itm_logits = self.itm_head(vl.astype(jnp.float32))
        itm_labels = jnp.concatenate(
            [jnp.ones(b, jnp.int32), jnp.zeros(2 * b, jnp.int32)])
        loss_itm = cross_entropy_with_logits(itm_logits, itm_labels).mean()

        # MLM through text + fusion
        mlm_text = self.encode_text(mlm_input_ids, attention_mask,
                                    deterministic)
        fused = self.fuse(mlm_text, attention_mask, image_embeds,
                          image_atts, deterministic)
        txt_len = input_ids.shape[1]
        mlm_logits = self.mlm_head(fused[:, :txt_len])
        mask = (mlm_labels != -100).astype(jnp.float32)
        safe = jnp.where(mlm_labels == -100, 0, mlm_labels)
        losses = cross_entropy_with_logits(mlm_logits, safe) * mask
        loss_mlm = losses.sum() / jnp.maximum(mask.sum(), 1.0)

        return {"loss": loss_ita + loss_itm + loss_mlm,
                "loss_ita": loss_ita, "loss_itm": loss_itm,
                "loss_mlm": loss_mlm}

    # ------------------------------------------------------------------

    def retrieval_loss(self, video, input_ids, attention_mask, idx,
                       rng=None, deterministic=True):
        """idx-matched ITA + hard-negative ITM (reference
        ALPRO_Retrieval.forward:308-410)."""
        temp = jnp.clip(self.temp, 0.001, 0.5)
        b = video.shape[0]
        image_embeds = self.encode_image(video, deterministic)
        image_atts = jnp.ones(image_embeds.shape[:2], jnp.int32)
        image_feat = self.vision_proj(image_embeds[:, 0].astype(jnp.float32))
        image_feat = image_feat / jnp.linalg.norm(image_feat, -1,
                                                  keepdims=True)
        text_embeds = self.encode_text(input_ids, attention_mask,
                                       deterministic)
        text_feat = self.text_proj(text_embeds[:, 0].astype(jnp.float32))
        text_feat = text_feat / jnp.linalg.norm(text_feat, -1, keepdims=True)

        pos = (idx.reshape(-1, 1) == idx.reshape(1, -1)).astype(jnp.float32)
        targets = pos / pos.sum(1, keepdims=True)
        sim_i2t = image_feat @ text_feat.T / temp
        sim_t2i = text_feat @ image_feat.T / temp
        loss_ita = 0.5 * (
            -(jax.nn.log_softmax(sim_i2t, -1) * targets).sum(-1).mean()
            - (jax.nn.log_softmax(sim_t2i, -1) * targets).sum(-1).mean())

        fused_pos = self.fuse(text_embeds, attention_mask, image_embeds,
                              image_atts, deterministic)
        neg_rng = rng if rng is not None else self.make_rng("dropout")
        k1, k2 = jax.random.split(jax.random.fold_in(neg_rng, 13))
        same = jnp.where(pos > 0, -1e9, 0.0)
        neg_img = jax.random.categorical(k1, sim_t2i + same, axis=1)
        neg_txt = jax.random.categorical(k2, sim_i2t + same, axis=1)
        text_all = jnp.concatenate([text_embeds, text_embeds[neg_txt]], 0)
        tmask_all = jnp.concatenate([attention_mask,
                                     attention_mask[neg_txt]], 0)
        image_all = jnp.concatenate([image_embeds[neg_img], image_embeds], 0)
        imask_all = jnp.concatenate([image_atts, image_atts], 0)
        fused_neg = self.fuse(text_all, tmask_all, image_all, imask_all,
                              deterministic)
        vl = jnp.concatenate([fused_pos[:, 0], fused_neg[:, 0]], 0)
        itm_logits = self.itm_head(vl.astype(jnp.float32))
        itm_labels = jnp.concatenate(
            [jnp.ones(b, jnp.int32), jnp.zeros(2 * b, jnp.int32)])
        loss_itm = cross_entropy_with_logits(itm_logits, itm_labels).mean()
        return {"loss": loss_ita + loss_itm, "loss_ita": loss_ita,
                "loss_itm": loss_itm, "image_feat": image_feat,
                "text_feat": text_feat}

    def cls_forward(self, video, input_ids, attention_mask, labels=None,
                    deterministic=True):
        """Fused-CLS classification (reference ALPRO_Cls.forward:473)."""
        image_embeds = self.encode_image(video, deterministic)
        image_atts = jnp.ones(image_embeds.shape[:2], jnp.int32)
        text_embeds = self.encode_text(input_ids, attention_mask,
                                       deterministic)
        fused = self.fuse(text_embeds, attention_mask, image_embeds,
                          image_atts, deterministic)
        h = nn.relu(self.cls_fc1(fused[:, 0].astype(jnp.float32)))
        logits = self.cls_fc2(h)
        out = {"logits": logits}
        if labels is not None:
            out["loss"] = cross_entropy_with_logits(logits, labels).mean()
        return out

    def full_init(self, video, input_ids, attention_mask):
        mlm_labels = jnp.where(input_ids >= 0, input_ids, -100)
        out = self.pretrain_loss(video, input_ids, attention_mask,
                                 input_ids, mlm_labels,
                                 rng=jax.random.key(0))
        if self.cfg.num_classes:
            _ = self.cls_forward(video, input_ids, attention_mask)
        return out

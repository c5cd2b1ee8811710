"""mPLUG BERT-fusion task models (the legacy video-language family).

TPU-native re-design of the reference's ALBEF/mPLUG-style models
(reference: models/mplug.py — mPLUG_Pretrain:29, mPLUG_Cls:386,
mPLUG_Caption:481, mPLUG_Retrieval:593): TimeSformer video encoder,
BERT text encoder, skip-connected FusionEncoder, BERT prefix decoder,
with ITC (momentum distillation + MoCo queues), ITM (in-batch hard
negatives) and MLM objectives.

Functional momentum design: the reference mutates EMA twins and queues as
module buffers inside forward (mplug.py:162-191, 690-750).  Under jit that
state is explicit: :class:`MomentumState` (EMA params + feature/idx queues
+ pointer) is threaded through the train step —
    feats_m = model.apply({'params': state.ema}, ..., method=momentum_features)
    losses  = model.apply({'params': params}, ..., feats_m, queues, alpha)
    state   = update_momentum(state, params, feats_m)
Hard-negative multinomial draws use jax.random.categorical on the masked
similarity logits (the reference's torch.multinomial per row).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax import struct

from youku_mplug_tpu.models.bert import (
    BertConfig,
    BertLayerNorm,
    BertLMHead,
    BertModel,
    BertPrefixModel,
    FusionModel,
)
from youku_mplug_tpu.models.vision import TimeSformer, VisionConfig
from youku_mplug_tpu.ops.cross_entropy import cross_entropy_with_logits
from youku_mplug_tpu.runtime.precision import Policy, DEFAULT_POLICY


@dataclasses.dataclass(frozen=True)
class MPLUGConfig:
    vision: VisionConfig = VisionConfig()
    bert: BertConfig = BertConfig()
    embed_dim: int = 256
    temp: float = 0.07
    queue_size: int = 65536
    momentum: float = 0.995
    mlm_probability: float = 0.15
    distill: bool = True
    num_classes: int = 0


@struct.dataclass
class MomentumState:
    """EMA params + MoCo queues (reference register_buffer queues,
    mplug.py:46-52)."""

    ema_params: Any
    image_queue: jax.Array  # [E, Q]
    text_queue: jax.Array   # [E, Q]
    idx_queue: jax.Array    # [1, Q] (retrieval)
    ptr: jax.Array


def init_momentum_state(params, embed_dim, queue_size, rng=None):
    rng = rng or jax.random.key(0)
    k1, k2 = jax.random.split(rng)
    iq = jax.random.normal(k1, (embed_dim, queue_size))
    tq = jax.random.normal(k2, (embed_dim, queue_size))
    iq = iq / jnp.linalg.norm(iq, axis=0, keepdims=True)
    tq = tq / jnp.linalg.norm(tq, axis=0, keepdims=True)
    return MomentumState(
        ema_params=jax.tree.map(jnp.asarray, params),
        image_queue=iq, text_queue=tq,
        idx_queue=jnp.full((1, queue_size), -100, jnp.int32),
        ptr=jnp.zeros((), jnp.int32))


def update_momentum(state: MomentumState, params, image_feat_m, text_feat_m,
                    idx=None, momentum: float = 0.995) -> MomentumState:
    """EMA + dequeue/enqueue (reference _momentum_update /
    _dequeue_and_enqueue, mplug.py copy_params pattern)."""
    ema = jax.tree.map(lambda e, p: e * momentum + p * (1.0 - momentum),
                       state.ema_params, params)
    b = image_feat_m.shape[0]
    q = state.image_queue.shape[1]
    ptr = state.ptr
    iq = jax.lax.dynamic_update_slice(state.image_queue, image_feat_m.T,
                                      (0, ptr))
    tq = jax.lax.dynamic_update_slice(state.text_queue, text_feat_m.T,
                                      (0, ptr))
    idxq = state.idx_queue
    if idx is not None:
        idxq = jax.lax.dynamic_update_slice(
            idxq, idx.reshape(1, -1).astype(jnp.int32), (0, ptr))
    return MomentumState(ema_params=ema, image_queue=iq, text_queue=tq,
                         idx_queue=idxq, ptr=(ptr + b) % q)


def mlm_mask_tokens(rng, input_ids, attention_mask, vocab_size,
                    mlm_probability=0.15, mask_token_id=103,
                    special_ids=(0, 101, 102)):
    """BERT 80/10/10 masking (reference mplug.py mask()), jax-native."""
    k1, k2, k3 = jax.random.split(rng, 3)
    special = jnp.zeros_like(input_ids, jnp.bool_)
    for sid in special_ids:
        special = special | (input_ids == sid)
    prob = jax.random.uniform(k1, input_ids.shape)
    masked = (prob < mlm_probability) & ~special & (attention_mask == 1)
    labels = jnp.where(masked, input_ids, -100)
    decision = jax.random.uniform(k2, input_ids.shape)
    rand_tok = jax.random.randint(k3, input_ids.shape, 0, vocab_size)
    out = jnp.where(masked & (decision < 0.8), mask_token_id, input_ids)
    out = jnp.where(masked & (decision >= 0.8) & (decision < 0.9),
                    rand_tok, out)
    return out, labels


class MPLUG(nn.Module):
    """Shared mPLUG backbone with pretrain/cls/caption/retrieval methods."""

    cfg: MPLUGConfig
    policy: Policy = DEFAULT_POLICY

    def setup(self):
        cfg = self.cfg
        self.visual_encoder = TimeSformer(cfg.vision, policy=self.policy,
                                          name="visual_encoder")
        enc_cfg = dataclasses.replace(
            cfg.bert, num_hidden_layers=cfg.bert.text_encoder_layers)
        self.text_encoder = BertModel(enc_cfg, policy=self.policy,
                                      name="text_encoder")
        self.fusion = FusionModel(cfg.bert, policy=self.policy,
                                  name="fusion_encoder")
        self.mlm_head = BertLMHead(cfg.bert, name="mlm_head")
        self.text_decoder = BertPrefixModel(cfg.bert, policy=self.policy,
                                            name="text_decoder")
        w = cfg.bert.hidden_size
        self.large = cfg.bert.hidden_size != cfg.vision.embed_dim
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
        _, image_embeds = self.visual_encoder(video,
                                              deterministic=deterministic)
        if self.large:
            image_embeds = self.visn_layer_norm(
                self.visn_fc(image_embeds))
        return image_embeds

    def encode_text(self, input_ids, attention_mask, deterministic=True):
        return self.text_encoder(input_ids, attention_mask,
                                 deterministic=deterministic)

    def momentum_features(self, video, input_ids, attention_mask):
        """Features computed with EMA params (apply with ema_params)."""
        image_embeds = self.encode_image(video, True)
        image_feat = self.vision_proj(image_embeds[:, 0].astype(jnp.float32))
        image_feat = image_feat / jnp.linalg.norm(image_feat, axis=-1,
                                                  keepdims=True)
        text_embeds = self.encode_text(input_ids, attention_mask, True)
        text_feat = self.text_proj(text_embeds[:, 0].astype(jnp.float32))
        text_feat = text_feat / jnp.linalg.norm(text_feat, axis=-1,
                                                keepdims=True)
        return {"image_feat": image_feat, "text_feat": text_feat,
                "image_embeds": image_embeds}

    # ------------------------------------------------------------------
    # pretrain (reference mPLUG_Pretrain.forward:150-340)
    # ------------------------------------------------------------------

    def pretrain_loss(self, video, input_ids, attention_mask,
                      mlm_input_ids, mlm_labels, feats_m=None,
                      image_queue=None, text_queue=None, alpha: float = 0.0,
                      rng=None, deterministic=True):
        cfg = self.cfg
        temp = jnp.clip(self.temp, 0.001, 0.5)
        b = video.shape[0]
        image_embeds = self.encode_image(video, deterministic)
        image_atts = jnp.ones(image_embeds.shape[:2], jnp.int32)
        image_feat = self.vision_proj(image_embeds[:, 0].astype(jnp.float32))
        image_feat = image_feat / jnp.linalg.norm(image_feat, axis=-1,
                                                  keepdims=True)
        text_embeds = self.encode_text(input_ids, attention_mask,
                                       deterministic)
        text_feat = self.text_proj(text_embeds[:, 0].astype(jnp.float32))
        text_feat = text_feat / jnp.linalg.norm(text_feat, axis=-1,
                                                keepdims=True)

        # ---- ITC with momentum queues ---------------------------------
        if feats_m is None:
            feats_m = {"image_feat": image_feat, "text_feat": text_feat,
                       "image_embeds": image_embeds}
        if image_queue is None:
            text_all = feats_m["text_feat"].T
            image_all = feats_m["image_feat"].T
        else:
            text_all = jnp.concatenate([feats_m["text_feat"].T, text_queue],
                                       axis=1)
            image_all = jnp.concatenate([feats_m["image_feat"].T,
                                         image_queue], axis=1)
        sim_i2t = image_feat @ text_all / temp
        sim_t2i = text_feat @ image_all / temp
        n_all = sim_i2t.shape[1]
        sim_targets = jnp.eye(b, n_all)
        sim_i2t_m = feats_m["image_feat"] @ text_all / temp
        sim_t2i_m = feats_m["text_feat"] @ image_all / temp
        i2t_targets = alpha * jax.nn.softmax(sim_i2t_m, -1) + \
            (1 - alpha) * sim_targets
        t2i_targets = alpha * jax.nn.softmax(sim_t2i_m, -1) + \
            (1 - alpha) * sim_targets
        loss_i2t = -(jax.nn.log_softmax(sim_i2t, -1) * i2t_targets).sum(-1)
        loss_t2i = -(jax.nn.log_softmax(sim_t2i, -1) * t2i_targets).sum(-1)
        loss_ita = 0.5 * (loss_i2t.mean() + loss_t2i.mean())

        # ---- ITM with in-batch hard negatives --------------------------
        img_pos, txt_pos = self.fusion(text_embeds, attention_mask,
                                       image_embeds, image_atts,
                                       deterministic)
        neg_rng = rng if rng is not None else self.make_rng("dropout")
        k1, k2 = jax.random.split(jax.random.fold_in(neg_rng, 17))
        diag_mask = jnp.where(jnp.eye(b, dtype=bool), -1e9, 0.0)
        neg_img_idx = jax.random.categorical(
            k1, sim_t2i[:, :b] + diag_mask, axis=1)
        neg_txt_idx = jax.random.categorical(
            k2, sim_i2t[:, :b] + diag_mask, axis=1)
        text_all_e = jnp.concatenate(
            [text_embeds, text_embeds[neg_txt_idx]], 0)
        text_all_m = jnp.concatenate(
            [attention_mask, attention_mask[neg_txt_idx]], 0)
        image_all_e = jnp.concatenate(
            [image_embeds[neg_img_idx], image_embeds], 0)
        image_all_m = jnp.concatenate([image_atts, image_atts], 0)
        _, txt_neg = self.fusion(text_all_e, text_all_m, image_all_e,
                                 image_all_m, deterministic)
        vl = jnp.concatenate([txt_pos[:, 0], txt_neg[:, 0]], 0)
        itm_logits = self.itm_head(vl.astype(jnp.float32))
        itm_labels = jnp.concatenate(
            [jnp.ones(b, jnp.int32), jnp.zeros(2 * b, jnp.int32)])
        loss_itm = cross_entropy_with_logits(itm_logits, itm_labels).mean()

        # ---- MLM through the fusion network ----------------------------
        mlm_text = self.encode_text(mlm_input_ids, attention_mask,
                                    deterministic)
        _, mlm_fused = self.fusion(mlm_text, attention_mask, image_embeds,
                                   image_atts, deterministic)
        mlm_logits = self.mlm_head(mlm_fused)
        mask = (mlm_labels != -100).astype(jnp.float32)
        safe = jnp.where(mlm_labels == -100, 0, mlm_labels)
        mlm_losses = cross_entropy_with_logits(mlm_logits, safe) * mask
        loss_mlm = mlm_losses.sum() / jnp.maximum(mask.sum(), 1.0)

        loss = loss_ita + loss_itm + loss_mlm
        return {"loss": loss, "loss_ita": loss_ita, "loss_itm": loss_itm,
                "loss_mlm": loss_mlm,
                "image_feat": image_feat, "text_feat": text_feat}

    # ------------------------------------------------------------------
    # classification (reference mPLUG_Cls.forward:452-473)
    # ------------------------------------------------------------------

    def cls_forward(self, video, input_ids, attention_mask, labels=None,
                    deterministic=True):
        image_embeds = self.encode_image(video, deterministic)
        image_atts = jnp.ones(image_embeds.shape[:2], jnp.int32)
        text_embeds = self.encode_text(input_ids, attention_mask,
                                       deterministic)
        _, fused = self.fusion(text_embeds, attention_mask, image_embeds,
                               image_atts, deterministic)
        h = nn.relu(self.cls_fc1(fused[:, 0].astype(jnp.float32)))
        logits = self.cls_fc2(h)
        out = {"logits": logits}
        if labels is not None:
            out["loss"] = cross_entropy_with_logits(logits, labels).mean()
        return out

    # ------------------------------------------------------------------
    # caption (reference mPLUG_Caption.forward:545-585)
    # ------------------------------------------------------------------

    def caption_loss(self, video, caption_ids, caption_mask, pad_id=0,
                     input_ids=None, attention_mask=None,
                     deterministic=True):
        image_embeds = self.encode_image(video, deterministic)
        image_atts = jnp.ones(image_embeds.shape[:2], jnp.int32)
        if input_ids is not None:
            text_embeds = self.encode_text(input_ids, attention_mask,
                                           deterministic)
            img_f, txt_f = self.fusion(text_embeds, attention_mask,
                                       image_embeds, image_atts,
                                       deterministic)
            fusion_out = jnp.concatenate([img_f, txt_f], 1)
            fusion_att = jnp.concatenate([image_atts, attention_mask], 1)
        else:
            fusion_out, fusion_att = image_embeds, image_atts
        labels = jnp.where(caption_ids == pad_id, -100, caption_ids)
        out = self.text_decoder(caption_ids, caption_mask,
                                encoder_hidden_states=fusion_out,
                                encoder_attention_mask=fusion_att,
                                labels=labels, deterministic=deterministic)
        return {"loss": out["loss"]}

    # ------------------------------------------------------------------
    # retrieval (reference mPLUG_Retrieval.forward:707-800)
    # ------------------------------------------------------------------

    def retrieval_loss(self, video, input_ids, attention_mask, idx,
                       feats_m=None, image_queue=None, text_queue=None,
                       idx_queue=None, alpha: float = 0.0, rng=None,
                       deterministic=True):
        """ITC with idx-matched targets against queues + ITM hard
        negatives; returns feats for queue updates."""
        out = {}
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

        if feats_m is None:
            feats_m = {"image_feat": image_feat, "text_feat": text_feat}
        if image_queue is None:
            text_all = feats_m["text_feat"].T
            image_all = feats_m["image_feat"].T
            idx_all = idx.reshape(1, -1)
        else:
            text_all = jnp.concatenate([feats_m["text_feat"].T, text_queue],
                                       1)
            image_all = jnp.concatenate([feats_m["image_feat"].T,
                                         image_queue], 1)
            idx_all = jnp.concatenate(
                [idx.reshape(1, -1), idx_queue], 1)
        pos = (idx.reshape(-1, 1) == idx_all).astype(jnp.float32)
        sim_targets = pos / pos.sum(1, keepdims=True)
        sim_i2t = image_feat @ text_all / temp
        sim_t2i = text_feat @ image_all / temp
        sim_i2t_m = feats_m["image_feat"] @ text_all / temp
        sim_t2i_m = feats_m["text_feat"] @ image_all / temp
        i2t_t = alpha * jax.nn.softmax(sim_i2t_m, -1) + \
            (1 - alpha) * sim_targets
        t2i_t = alpha * jax.nn.softmax(sim_t2i_m, -1) + \
            (1 - alpha) * sim_targets
        loss_ita = 0.5 * (
            -(jax.nn.log_softmax(sim_i2t, -1) * i2t_t).sum(-1).mean()
            - (jax.nn.log_softmax(sim_t2i, -1) * t2i_t).sum(-1).mean())

        # ITM hard negatives (same recipe as pretrain)
        img_pos, txt_pos = self.fusion(text_embeds, attention_mask,
                                       image_embeds, image_atts,
                                       deterministic)
        neg_rng = rng if rng is not None else self.make_rng("dropout")
        k1, k2 = jax.random.split(jax.random.fold_in(neg_rng, 29))
        same = (idx.reshape(-1, 1) == idx.reshape(1, -1))
        mask_neg = jnp.where(same, -1e9, 0.0)
        neg_img_idx = jax.random.categorical(k1, sim_t2i[:, :b] + mask_neg,
                                             axis=1)
        neg_txt_idx = jax.random.categorical(k2, sim_i2t[:, :b] + mask_neg,
                                             axis=1)
        text_all_e = jnp.concatenate([text_embeds,
                                      text_embeds[neg_txt_idx]], 0)
        text_all_m = jnp.concatenate([attention_mask,
                                      attention_mask[neg_txt_idx]], 0)
        image_all_e = jnp.concatenate([image_embeds[neg_img_idx],
                                       image_embeds], 0)
        image_all_m = jnp.concatenate([image_atts, image_atts], 0)
        _, txt_neg = self.fusion(text_all_e, text_all_m, image_all_e,
                                 image_all_m, deterministic)
        vl = jnp.concatenate([txt_pos[:, 0], txt_neg[:, 0]], 0)
        itm_logits = self.itm_head(vl.astype(jnp.float32))
        itm_labels = jnp.concatenate(
            [jnp.ones(b, jnp.int32), jnp.zeros(2 * b, jnp.int32)])
        loss_itm = cross_entropy_with_logits(itm_logits, itm_labels).mean()

        return {"loss": loss_ita + loss_itm, "loss_ita": loss_ita,
                "loss_itm": loss_itm, "image_feat": image_feat,
                "text_feat": text_feat}

    def itm_rerank_score(self, video, input_ids, attention_mask,
                         deterministic=True):
        """P(match) from the ITM head (retrieval rerank stage)."""
        image_embeds = self.encode_image(video, deterministic)
        image_atts = jnp.ones(image_embeds.shape[:2], jnp.int32)
        text_embeds = self.encode_text(input_ids, attention_mask,
                                       deterministic)
        _, fused = self.fusion(text_embeds, attention_mask, image_embeds,
                               image_atts, deterministic)
        logits = self.itm_head(fused[:, 0].astype(jnp.float32))
        return jax.nn.softmax(logits, -1)[:, 1]

    def full_init(self, video, input_ids, attention_mask):
        rng = jnp.zeros((), jnp.uint32)
        mlm_ids = input_ids
        mlm_labels = jnp.where(input_ids >= 0, input_ids, -100)
        out = self.pretrain_loss(video, input_ids, attention_mask, mlm_ids,
                                 mlm_labels, rng=jax.random.key(0))
        _ = self.caption_loss(video, input_ids, attention_mask,
                              input_ids=input_ids,
                              attention_mask=attention_mask)
        if self.cfg.num_classes:
            _ = self.cls_forward(video, input_ids, attention_mask)
        return out


def mplug_generate(model: MPLUG, params, video, bos_id: int, eos_id: int,
                   max_new_tokens: int = 30, input_ids=None,
                   attention_mask=None, beam_size: int = 1,
                   min_length: int = 0, alpha: float = 0.6):
    """Caption generation for the BERT prefix decoder — greedy and beam
    (reference: models/predictor_mplug.py TextGenerator:33-423; Wu length
    penalty ((5+len)/6)**alpha with alpha=0.6 :61,213; min-length EOS
    suppression :207-208).

    The BERT decoder is small and captions short, so each step re-runs the
    full fixed-length decoder forward under one jit (static shapes; the
    causal mask hides future positions).  Returns token ids
    [B, max_new_tokens].
    """
    import jax

    b = video.shape[0]
    image_embeds = model.apply({"params": params}, video,
                               method=MPLUG.encode_image)
    image_atts = jnp.ones(image_embeds.shape[:2], jnp.int32)
    if input_ids is not None:
        text_embeds = model.apply({"params": params}, input_ids,
                                  attention_mask,
                                  method=MPLUG.encode_text)
        img_f, txt_f = model.apply({"params": params}, text_embeds,
                                   attention_mask, image_embeds, image_atts,
                                   method=lambda m, *a: m.fusion(*a))
        enc = jnp.concatenate([img_f, txt_f], 1)
        enc_mask = jnp.concatenate([image_atts, attention_mask], 1)
    else:
        enc, enc_mask = image_embeds, image_atts

    if beam_size > 1:
        return mplug_beam_search(
            model, params, enc, enc_mask, bos_id=bos_id, eos_id=eos_id,
            max_new_tokens=max_new_tokens, beam_size=beam_size,
            min_length=min_length, alpha=alpha)

    max_len = max_new_tokens + 1
    dec_apply = jax.jit(lambda p, ids, m: model.apply(
        {"params": p}, ids, m, encoder_hidden_states=enc,
        encoder_attention_mask=enc_mask,
        method=lambda mm, *a, **kw: mm.text_decoder(*a, **kw))["logits"])

    ids = jnp.full((b, max_len), eos_id, jnp.int32)
    ids = ids.at[:, 0].set(bos_id)
    done = jnp.zeros((b,), bool)
    for t in range(1, max_len):
        mask = (jnp.arange(max_len)[None, :] < t).astype(jnp.int32)
        logits = dec_apply(params, ids, jnp.broadcast_to(mask,
                                                         (b, max_len)))
        nxt = jnp.argmax(logits[:, t - 1], axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, eos_id, nxt)
        ids = ids.at[:, t].set(nxt)
        done = done | (nxt == eos_id)
    return ids[:, 1:]


def mplug_beam_search(model: MPLUG, params, enc, enc_mask, *, bos_id: int,
                      eos_id: int, max_new_tokens: int, beam_size: int,
                      min_length: int = 0, alpha: float = 0.6):
    """In-jit beam search over the BERT prefix decoder.

    Matches the reference TextGenerator's ONMT-style semantics
    (predictor_mplug.py:133-310): running beam scores are raw log-prob
    sums; candidates are ranked by score / wu(len) where
    wu(len) = ((5+len)/6)**alpha; EOS candidates move to a finished pool
    at their penalized score; EOS is suppressed while step < min_length.
    Returns token ids [B, max_new_tokens] of the best hypothesis.
    """
    import functools

    import jax

    neg_inf = jnp.float32(jnp.finfo(jnp.float32).min)
    b = enc.shape[0]
    k = beam_size
    max_len = max_new_tokens + 1  # bos + generated

    enc_t = jnp.repeat(enc, k, axis=0)
    enc_mask_t = jnp.repeat(enc_mask, k, axis=0)

    def decode_logits(ids_flat, t):
        """logits of position t-1 for fixed-length ids [B*K, max_len]."""
        mask = (jnp.arange(max_len)[None, :] < t).astype(jnp.int32)
        mask = jnp.broadcast_to(mask, (b * k, max_len))
        out = model.apply({"params": params}, ids_flat, mask,
                          encoder_hidden_states=enc_t,
                          encoder_attention_mask=enc_mask_t,
                          method=lambda mm, *a, **kw: mm.text_decoder(
                              *a, **kw))["logits"]
        return out[:, t - 1]

    def wu(step):  # step: 1-based generated length
        return ((5.0 + step) / 6.0) ** alpha

    @functools.partial(jax.jit)
    def run():
        ids = jnp.full((b, k, max_len), eos_id, jnp.int32)
        ids = ids.at[:, :, 0].set(bos_id)

        # step 1: all beams identical — take top-K of beam 0
        logp = jax.nn.log_softmax(
            decode_logits(ids.reshape(b * k, max_len), 1).astype(
                jnp.float32)).reshape(b, k, -1)[:, 0]
        v = logp.shape[-1]
        if min_length > 0:
            logp = logp.at[:, eos_id].set(-1e20)
        top_scores, top_tokens = jax.lax.top_k(logp, k)
        ids = ids.at[:, :, 1].set(top_tokens)
        is_eos0 = top_tokens == eos_id
        alive_score = jnp.where(is_eos0, neg_inf, top_scores)
        fin_seq = jnp.where(is_eos0[..., None], ids, jnp.zeros_like(ids))
        fin_score = jnp.where(is_eos0, top_scores / wu(1), neg_inf)

        def body(t, carry):
            ids, alive_score, fin_seq, fin_score = carry
            logp = jax.nn.log_softmax(decode_logits(
                ids.reshape(b * k, max_len), t).astype(
                    jnp.float32)).reshape(b, k, v)
            step = t  # generated tokens after this pick (1-based)
            logp = jnp.where(
                jnp.asarray(step - 1 < min_length),
                logp.at[:, :, eos_id].set(-1e20), logp)
            cand = alive_score[:, :, None] + logp
            curr = (cand / wu(step)).reshape(b, k * v)
            top2k, idx2k = jax.lax.top_k(curr, 2 * k)
            beam_idx = idx2k // v
            tok_idx = idx2k % v
            is_eos = tok_idx == eos_id

            seq2k = jnp.take_along_axis(ids, beam_idx[..., None], axis=1)
            seq2k = jax.vmap(lambda s, tok: s.at[:, t].set(tok))(
                seq2k, tok_idx)

            # finished pool update (penalized scores)
            new_fin = jnp.where(is_eos, top2k, neg_inf)
            all_fin_score = jnp.concatenate([fin_score, new_fin], axis=1)
            all_fin_seq = jnp.concatenate([fin_seq, seq2k], axis=1)
            keep, keep_idx = jax.lax.top_k(all_fin_score, k)
            fin_seq = jnp.take_along_axis(all_fin_seq, keep_idx[..., None],
                                          axis=1)
            fin_score = keep

            # alive: best K non-eos, scores de-penalized back to raw sums
            alive_cand = jnp.where(is_eos, neg_inf, top2k)
            new_curr, pick = jax.lax.top_k(alive_cand, k)
            new_beam = jnp.take_along_axis(beam_idx, pick, axis=1)
            new_tok = jnp.take_along_axis(tok_idx, pick, axis=1)
            ids = jnp.take_along_axis(ids, new_beam[..., None], axis=1)
            ids = jax.vmap(lambda s, tok: s.at[:, t].set(tok))(ids, new_tok)
            alive_score = jnp.where(new_curr <= neg_inf / 2, neg_inf,
                                    new_curr * wu(step))
            return ids, alive_score, fin_seq, fin_score

        ids, alive_score, fin_seq, fin_score = jax.lax.fori_loop(
            2, max_len, body, (ids, alive_score, fin_seq, fin_score))

        # unfinished beams enter the pool at final penalized score
        # (reference: step+1 == max_length forces is_finished, :259-260)
        open_score = jnp.where(alive_score <= neg_inf / 2, neg_inf,
                               alive_score / wu(max_new_tokens))
        all_score = jnp.concatenate([fin_score, open_score], axis=1)
        all_seq = jnp.concatenate([fin_seq, ids], axis=1)
        _, best = jax.lax.top_k(all_score, 1)
        out = jnp.take_along_axis(all_seq, best[..., None], axis=1)[:, 0]
        return out[:, 1:]

    return run()

"""mPLUG-Owl video instruction model (mPLUG-Video BloomZ-7B), TPU-native.

The reference ships this path through the external mPLUG-Owl repo
(reference README.md:111-133): per-frame ViT-L/14 features -> a visual
abstractor (learnable queries cross-attending the frame features, with
temporal embeddings for video) -> spliced into the BloomZ-7B decoder at
the ``<|video|>`` placeholder of a Human/AI conversation prompt ->
autoregressive generation.

Re-designed here as three flax modules over the existing stacks:

- per-frame vision encoding reuses :class:`models.vision.VisionTransformer`
  (frames folded into the batch — one big MXU-friendly [B*T, N, D] sweep,
  no per-frame python loop),
- :class:`OwlVisualAbstractor` — learnable queries + N cross-attention
  blocks whose keys/values are [queries ; frame features] (the fused
  self+cross form: one attention op instead of the BERT-style alternating
  pair, covering both query-query and query-image interaction per layer),
  with learnable per-frame temporal embeddings added before flattening,
- the Bloom decoder (models/bloom.py) with the query features spliced
  into the token embedding sequence at placeholder positions via a
  cumulative-index gather (jit-friendly: no ragged scatter, one
  ``where``).

Splice contract: callers expand ``<|video|>`` in the tokenized prompt to
``cfg.num_media_tokens`` placeholder positions (``num_queries`` query
features plus the trailing ``vit_eos`` token) and pass ``media_mask``
marking them; the k-th marked position receives the k-th media feature.  The
Bloom embedding layernorm then runs over the spliced sequence — matching
the HF path, where inputs_embeds (video features included) pass through
``word_embeddings_layernorm`` (modeling_bloom.py BloomModel.forward).

Design note: the external repo's abstractor code is not vendored here
(zero-egress build); this is a clean-room reimplementation of the
published ``MplugOwlVisualAbstractorModel`` architecture so real
checkpoints (``MAGAer13/mplug-youku-bloomz-7b``) import tensor-exactly
via importers.owl_abstractor_params_from_torch.  The structure preserved
per-layer (external modeling_mplug_owl.py naming in parentheses):

- pre-LN on queries (``norm1``) and on visual features (``normk``);
  keys/values are ``cat([normed_queries, normed_visual])``,
- the attention residual adds onto the NORMED queries — the external
  forward reassigns ``hidden_states = norm1(hidden_states)`` before
  passing it as the residual input ("HACK we apply norm on q and k"),
  a trained-in quirk the checkpoint weights expect,
- separate ``query``/``key``/``value`` projections + ``out_proj``,
- a gated-SiLU MLP (``w2(ffn_ln(silu(w1 x) * w3 x))`` with the
  LayerNorm on the INTERMEDIATE width) behind ``norm2``,
- no final LayerNorm; ``visual_fc`` projects to the LM width and a
  learnable ``vit_eos`` token is appended, so one video contributes
  ``num_queries + 1`` embedding positions to the spliced sequence.

The Bloom decoder side is oracle-exact (tests/test_bloom.py); the
abstractor import round-trip is pinned by tests/test_owl_import.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from youku_mplug_tpu.models.bloom import BloomConfig, BloomLM
from youku_mplug_tpu.models.vision import (
    LayerNormFP32,
    VisionConfig,
    VisionTransformer,
)
from youku_mplug_tpu.ops.attention import dot_product_attention
from youku_mplug_tpu.runtime.precision import Policy, DEFAULT_POLICY


@dataclasses.dataclass(frozen=True)
class OwlAbstractorConfig:
    """mPLUG-Owl visual abstractor (ViT-L width defaults)."""

    hidden_size: int = 1024
    num_layers: int = 6
    num_heads: int = 16
    intermediate_size: int = 2816
    num_queries: int = 64
    ln_eps: float = 1e-6
    init_std: float = 0.02
    max_frames: int = 32

    @property
    def head_dim(self) -> int:
        assert self.hidden_size % self.num_heads == 0
        return self.hidden_size // self.num_heads


class OwlAbstractorMlp(nn.Module):
    """Gated-SiLU MLP with the LayerNorm on the INTERMEDIATE width:
    ``w2(ffn_ln(silu(w1 x) * w3 x))`` — the external
    MplugOwlVisualAbstractorMLP structure, preserved so checkpoint
    tensors (w1/w2/w3/ffn_ln) map one-to-one."""

    dim: int
    hidden: int
    init_std: float = 0.02
    ln_eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.normal(stddev=self.init_std)
        w1 = self.param("w1_kernel", init, (self.dim, self.hidden))
        b1 = self.param("w1_bias", nn.initializers.zeros, (self.hidden,))
        w3 = self.param("w3_kernel", init, (self.dim, self.hidden))
        b3 = self.param("w3_bias", nn.initializers.zeros, (self.hidden,))
        w2 = self.param("w2_kernel", init, (self.hidden, self.dim))
        b2 = self.param("w2_bias", nn.initializers.zeros, (self.dim,))
        dt = x.dtype
        h = (jax.nn.silu(x @ w1.astype(dt) + b1.astype(dt))
             * (x @ w3.astype(dt) + b3.astype(dt)))
        h = LayerNormFP32(self.hidden, self.ln_eps, name="ffn_ln")(h)
        return h @ w2.astype(dt) + b2.astype(dt)


class OwlAbstractorLayer(nn.Module):
    """One abstractor block: queries attend [queries ; visual] (fused
    self+cross attention), then the gated MLP — both pre-LN with fp32
    islands.  The attention residual adds onto the NORMED queries,
    matching the external forward (see module docstring)."""

    cfg: OwlAbstractorConfig

    @nn.compact
    def __call__(self, x, visual, deterministic=True):
        cfg = self.cfg
        d, n, hd = cfg.hidden_size, cfg.num_heads, cfg.head_dim
        b, nq = x.shape[:2]

        q_in = LayerNormFP32(d, cfg.ln_eps, name="norm_q")(x)
        kv_in = LayerNormFP32(d, cfg.ln_eps, name="norm_kv")(visual)
        kv = jnp.concatenate([q_in, kv_in], axis=1)

        init = nn.initializers.normal(stddev=cfg.init_std)
        wq = self.param("q_kernel", init, (d, d))
        bq = self.param("q_bias", nn.initializers.zeros, (d,))
        wk = self.param("k_kernel", init, (d, d))
        bk = self.param("k_bias", nn.initializers.zeros, (d,))
        wv = self.param("v_kernel", init, (d, d))
        bv = self.param("v_bias", nn.initializers.zeros, (d,))
        wo = self.param("out_kernel", init, (d, d))
        bo = self.param("out_bias", nn.initializers.zeros, (d,))

        dt = q_in.dtype
        q = jnp.einsum("bqd,de->bqe", q_in, wq.astype(dt)) + bq.astype(dt)
        k = jnp.einsum("bkd,de->bke", kv, wk.astype(dt)) + bk.astype(dt)
        v = jnp.einsum("bkd,de->bke", kv, wv.astype(dt)) + bv.astype(dt)

        def heads(t):
            return t.reshape(b, t.shape[1], n, hd).transpose(0, 2, 1, 3)

        out = dot_product_attention(heads(q), heads(k), heads(v))
        out = out.transpose(0, 2, 1, 3).reshape(b, nq, d)
        out = jnp.einsum("bqd,de->bqe", out, wo.astype(dt)) + bo.astype(dt)
        # residual base is q_in (the normed queries), not x — the
        # external forward's trained-in quirk
        x = q_in + out

        mlp_in = LayerNormFP32(d, cfg.ln_eps, name="norm_mlp")(x)
        x = x + OwlAbstractorMlp(d, cfg.intermediate_size,
                                 init_std=cfg.init_std, ln_eps=cfg.ln_eps,
                                 name="mlp")(mlp_in)
        return x


class OwlVisualAbstractor(nn.Module):
    """Learnable queries + temporal embeddings + cross-attention stack.

    ``__call__(frame_feats [B, T, N, Dv])`` -> [B, num_queries, D].
    """

    cfg: OwlAbstractorConfig
    vision_dim: int = 1024

    @nn.compact
    def __call__(self, frame_feats, deterministic=True):
        cfg = self.cfg
        b, t, npatch, dv = frame_feats.shape
        d = cfg.hidden_size
        dt = frame_feats.dtype

        # per-frame temporal embedding BEFORE flattening: the abstractor's
        # only notion of time (the per-frame ViT is time-blind)
        temporal = self.param(
            "temporal_embed", nn.initializers.normal(stddev=cfg.init_std),
            (cfg.max_frames, dv))
        x = frame_feats + temporal[:t][None, :, None, :].astype(dt)
        x = x.reshape(b, t * npatch, dv)
        if dv != d:
            x = nn.Dense(d, name="in_proj")(x)

        queries = self.param(
            "query_embeds", nn.initializers.normal(stddev=cfg.init_std),
            (1, cfg.num_queries, d))
        q = jnp.broadcast_to(queries, (b, cfg.num_queries, d)).astype(dt)
        for i in range(cfg.num_layers):
            q = OwlAbstractorLayer(cfg, name=f"layers_{i}")(
                q, x, deterministic=deterministic)
        # no final LayerNorm: the external abstractor feeds the last
        # encoder layer's output straight into visual_fc
        return q


@dataclasses.dataclass(frozen=True)
class MPLUGOwlVideoConfig:
    # gelu="quick": the external MplugOwlVisionModel is CLIP-lineage
    # (hidden_act='quick_gelu'); a standard-GELU forward would silently
    # drift every vision MLP on imported checkpoints
    vision: VisionConfig = VisionConfig(
        img_size=224, patch_size=14, embed_dim=1024, depth=24,
        num_heads=16, clip_model=True, gelu="quick")
    abstractor: OwlAbstractorConfig = OwlAbstractorConfig()
    text: BloomConfig = BloomConfig()
    # append the learnable vit_eos token after visual_fc (the external
    # abstractor model does; each video then occupies num_queries + 1
    # positions in the spliced sequence)
    use_vit_eos: bool = True

    @property
    def num_media_tokens(self) -> int:
        return self.abstractor.num_queries + (1 if self.use_vit_eos else 0)


def splice_media(tok_emb, query_features, media_mask):
    """Insert query features at media positions.

    tok_emb [B, S, H], query_features [B, nq, H], media_mask [B, S]
    (exactly nq ones per row, in placeholder order).  k-th one gets the
    k-th query: a cumulative-index gather, no scatter.
    """
    qidx = jnp.clip(jnp.cumsum(media_mask, axis=1) - 1, 0,
                    query_features.shape[1] - 1)
    gathered = jnp.take_along_axis(
        query_features.astype(tok_emb.dtype), qidx[..., None], axis=1)
    return jnp.where(media_mask[..., None].astype(bool), gathered, tok_emb)


def instruct_targets(input_ids, attention_mask, media_mask, prompt_mask):
    """Shifted labels + loss mask for instruction tuning.

    Loss applies only where the TARGET (next) position is a real text
    token outside the media span and outside the instruction prompt —
    i.e. only the AI response tokens are supervised.
    Returns (labels [B, S], loss_mask [B, S-1]) in the GPT3LM/BloomLM
    masked-mean convention (losses[:, :-1] x loss_mask).
    """
    labels = jnp.concatenate([input_ids[:, 1:], input_ids[:, :1]], axis=1)
    tgt_ok = (attention_mask[:, 1:]
              * (1 - media_mask[:, 1:])
              * (1 - prompt_mask[:, 1:])).astype(jnp.int32)
    return labels, tgt_ok


class MPLUGOwlVideo(nn.Module):
    """Per-frame ViT -> visual abstractor -> Bloom decoder."""

    cfg: MPLUGOwlVideoConfig
    policy: Policy = DEFAULT_POLICY

    def setup(self):
        cfg = self.cfg
        self.visual_encoder = VisionTransformer(
            cfg.vision, policy=self.policy, name="visual_encoder")
        self.abstractor = OwlVisualAbstractor(
            cfg.abstractor, vision_dim=cfg.vision.embed_dim,
            name="abstractor")
        self.visual_fc = nn.Dense(
            cfg.text.hidden_size,
            kernel_init=nn.initializers.normal(
                stddev=cfg.abstractor.init_std),
            name="visual_fc")
        if cfg.use_vit_eos:
            self.vit_eos = self.param(
                "vit_eos",
                nn.initializers.normal(stddev=cfg.abstractor.init_std),
                (1, 1, cfg.text.hidden_size))
        self.text_decoder = BloomLM(cfg.text, policy=self.policy,
                                    name="text_decoder")

    def encode_video(self, video, deterministic=True):
        """video [B, C, T, Himg, Wimg] (the repo clip convention,
        ops/preprocess.normalize_clip) -> media features
        [B, num_media_tokens, H_text] (queries + the vit_eos token).
        Frames fold into the batch for one MXU-friendly ViT sweep."""
        b, c, t, hh, ww = video.shape
        frames = video.transpose(0, 2, 1, 3, 4).reshape(b * t, c, hh, ww)
        _, feats = self.visual_encoder(frames, deterministic=deterministic)
        feats = feats.reshape(b, t, feats.shape[1], feats.shape[2])
        q = self.abstractor(feats, deterministic=deterministic)
        q = self.visual_fc(q)
        if self.cfg.use_vit_eos:
            eos = jnp.broadcast_to(
                self.vit_eos.astype(q.dtype), (b, 1, q.shape[-1]))
            q = jnp.concatenate([q, eos], axis=1)
        return q

    def spliced_embeds(self, input_ids, media_mask, query_features):
        tok_emb = self.text_decoder.embed(input_ids)
        return splice_media(tok_emb, query_features, media_mask)

    def instruct_loss(self, video, input_ids, attention_mask, media_mask,
                      prompt_mask, deterministic=True):
        """Instruction-tuning LM loss (response tokens only)."""
        qf = self.encode_video(video, deterministic)
        embeds = self.spliced_embeds(input_ids, media_mask, qf)
        labels, loss_mask = instruct_targets(
            input_ids, attention_mask, media_mask, prompt_mask)
        out = self.text_decoder(
            input_embeds=embeds, labels=labels, loss_mask=loss_mask,
            deterministic=deterministic)
        return {"loss": out["loss"]}

    def __call__(self, video, input_ids, attention_mask, media_mask,
                 prompt_mask, deterministic=True):
        return self.instruct_loss(video, input_ids, attention_mask,
                                  media_mask, prompt_mask, deterministic)


def generate_instruct(task_model: MPLUGOwlVideo, params, video, input_ids,
                      media_mask, prompt_len, gen_config, rng=None,
                      qscales=None):
    """Video instruction inference: encode + splice + batched decode
    (reference README.md:135-143 model.generate over the Human/AI
    prompt).  input_ids [B, P] right-padded with the ``<|video|>``
    placeholder already expanded to cfg.num_media_tokens media
    positions; prompt_len [B] true lengths (media positions included).

    qscales: optional int8 dequant scales for the Bloom decoder (an
    exported ``tools/export_serving.py --owl --int8`` checkpoint)."""
    from youku_mplug_tpu.models.generation import generate

    task_vars = {"params": params}
    if qscales:
        # scales live under the decoder submodule so the tied embedding
        # (if quantized) dequants during splicing too
        task_vars["qscales"] = {"text_decoder": qscales}
    qf = task_model.apply(task_vars, video,
                          method=MPLUGOwlVideo.encode_video)
    embeds = task_model.apply(task_vars, input_ids, media_mask,
                              qf, method=MPLUGOwlVideo.spliced_embeds)
    decoder = BloomLM(task_model.cfg.text, policy=task_model.policy)
    dec_vars = ({"params": params["text_decoder"], "qscales": qscales}
                if qscales else params["text_decoder"])
    return generate(decoder, dec_vars, input_ids, prompt_len,
                    prompt_embeds=embeds, config=gen_config, rng=rng)

"""BERT encoder/decoder + skip-connected fusion network, TPU-native.

Re-implements the capability of the reference's mPLUG BERT stack
(reference: models/modeling_mplug.py — BertEmbeddings:168,
BertSelfAttention:218, BertLayer:521, FusionLayer:445, FusionEncoder:600,
BertEncoder:686, BertModel:981, FusionModel:1231, BertLMPredictionHead:814,
BertPrefixModel:1558) as flax modules:

- standard post-LN BERT blocks (HF semantics: additive -10000 masks,
  residual+LN after attention and FFN, gelu intermediate)
- cross-attention layers whose K/V projections read ``encoder_width``
  features (the visual stream)
- the mPLUG **FusionEncoder**: the last ``fusion_layer`` layers run text
  self-attention + cross-attention to the image stream; every
  ``stride_layer`` layers a *connected* layer self-attends over the
  concatenated [image; text] sequence and the image stream is updated with
  a residual skip (dormant at the default stride=100, kept for parity)
- decoder mode: causal mask (with bidirectional prefix support) + cached
  K/V is expressed with the same explicit-cache design as the GPT-3
  decoder rather than HF past_key_values tuples.

fp32 islands: layernorms via ops.layer_norm; attention softmax fp32 via
ops.attention.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from youku_mplug_tpu.ops.attention import mha_reference
from youku_mplug_tpu.ops.layernorm import layer_norm
from youku_mplug_tpu.runtime.precision import Policy, DEFAULT_POLICY


@dataclasses.dataclass(frozen=True)
class BertConfig:
    """Matches configs/models/config_bert_*.json."""

    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    initializer_range: float = 0.02
    pad_token_id: int = 0
    encoder_width: int = 768
    fusion_layer: int = 6
    stride_layer: int = 100
    add_cross_attention: bool = False
    text_encoder_layers: int = 6
    text_decoder_layers: int = 12

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def from_json_file(cls, path: str, **overrides) -> "BertConfig":
        raw = json.load(open(path))
        if "fusion_layers" in raw:  # mPLUG JSON spells it plural
            raw.setdefault("fusion_layer", raw["fusion_layers"])
        known = {f.name for f in dataclasses.fields(cls)}
        mapped = {k: v for k, v in raw.items() if k in known}
        mapped.update(overrides)
        return cls(**mapped)


def _init(std):
    return nn.initializers.normal(stddev=std)


class BertLayerNorm(nn.Module):
    dim: int
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return layer_norm(x, scale, bias, eps=self.eps)


class BertEmbeddings(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, input_ids=None, token_type_ids=None, position_ids=None,
                 inputs_embeds=None, deterministic=True):
        cfg = self.cfg
        if inputs_embeds is None:
            word = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                            embedding_init=_init(cfg.initializer_range),
                            name="word_embeddings")
            inputs_embeds = word(input_ids)
        b, s = inputs_embeds.shape[:2]
        if position_ids is None:
            position_ids = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
        if token_type_ids is None:
            token_type_ids = jnp.zeros((b, s), jnp.int32)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       embedding_init=_init(cfg.initializer_range),
                       name="position_embeddings")(position_ids)
        typ = nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                       embedding_init=_init(cfg.initializer_range),
                       name="token_type_embeddings")(token_type_ids)
        x = inputs_embeds + pos + typ
        x = BertLayerNorm(cfg.hidden_size, cfg.layer_norm_eps,
                          name="layernorm")(x)
        if not deterministic and cfg.hidden_dropout_prob > 0:
            x = nn.Dropout(cfg.hidden_dropout_prob)(x, deterministic=False)
        return x


class BertAttention(nn.Module):
    """Self or cross attention + output dense + residual LN (HF
    BertAttention = BertSelfAttention + BertSelfOutput)."""

    cfg: BertConfig
    is_cross: bool = False

    @nn.compact
    def __call__(self, hidden, attn_bias=None, kv=None, deterministic=True):
        cfg = self.cfg
        n, d = cfg.num_attention_heads, cfg.head_dim
        kv_width = cfg.encoder_width if self.is_cross else cfg.hidden_size
        kv = hidden if kv is None else kv
        q = nn.Dense(n * d, kernel_init=_init(cfg.initializer_range),
                     name="query")(hidden)
        k = nn.Dense(n * d, kernel_init=_init(cfg.initializer_range),
                     name="key")(kv)
        v = nn.Dense(n * d, kernel_init=_init(cfg.initializer_range),
                     name="value")(kv)
        b, sq = hidden.shape[:2]
        sk = kv.shape[1]

        def split(t, s):
            return t.reshape(b, s, n, d).transpose(0, 2, 1, 3)

        out = mha_reference(split(q, sq), split(k, sk), split(v, sk),
                            bias=attn_bias)
        out = out.transpose(0, 2, 1, 3).reshape(b, sq, n * d)
        out = nn.Dense(cfg.hidden_size,
                       kernel_init=_init(cfg.initializer_range),
                       name="out")(out)
        if not deterministic and cfg.hidden_dropout_prob > 0:
            out = nn.Dropout(cfg.hidden_dropout_prob)(out,
                                                      deterministic=False)
        return BertLayerNorm(cfg.hidden_size, cfg.layer_norm_eps,
                             name="out_layernorm")(hidden + out)


class BertFFN(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.cfg
        h = nn.Dense(cfg.intermediate_size,
                     kernel_init=_init(cfg.initializer_range),
                     name="intermediate")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size,
                     kernel_init=_init(cfg.initializer_range),
                     name="output")(h)
        if not deterministic and cfg.hidden_dropout_prob > 0:
            h = nn.Dropout(cfg.hidden_dropout_prob)(h, deterministic=False)
        return BertLayerNorm(cfg.hidden_size, cfg.layer_norm_eps,
                             name="output_layernorm")(x + h)


class BertLayer(nn.Module):
    cfg: BertConfig
    has_cross: bool = False

    @nn.compact
    def __call__(self, x, attn_bias=None, enc=None, enc_bias=None,
                 deterministic=True):
        x = BertAttention(self.cfg, name="attention")(
            x, attn_bias, deterministic=deterministic)
        if self.has_cross:
            x = BertAttention(self.cfg, is_cross=True,
                              name="crossattention")(
                x, enc_bias, kv=enc, deterministic=deterministic)
        return BertFFN(self.cfg, name="ffn")(x, deterministic)


def extend_mask(attention_mask, causal=False, prefix_len=None):
    """[B, S] 0/1 -> additive bias [B, 1, S(or 1), S] with -1e4 at masked
    positions (HF get_extended_attention_mask semantics,
    modeling_mplug.py:1040-1088); causal adds the lower-triangular decoder
    mask with an optional bidirectional prefix."""
    m = attention_mask.astype(jnp.float32)
    if causal:
        b, s = attention_mask.shape
        tri = jnp.tril(jnp.ones((s, s), jnp.float32))
        if prefix_len is not None:
            pos = jnp.arange(s)[None, :]
            prefix = (pos < prefix_len[:, None]).astype(jnp.float32)
            tri = jnp.maximum(tri[None], prefix[:, None, :])
        else:
            tri = tri[None]
        ext = tri * m[:, None, :]
        return ((1.0 - ext) * -10000.0)[:, None]
    return ((1.0 - m) * -10000.0)[:, None, None, :]


class BertEncoder(nn.Module):
    cfg: BertConfig
    num_layers: Optional[int] = None
    layer_range: Optional[tuple] = None  # ALBEF text/fusion split
                                         # (reference modeling_alpro.py:549)

    @nn.compact
    def __call__(self, x, attn_bias=None, enc=None, enc_bias=None,
                 deterministic=True):
        if self.layer_range is not None:
            lo, hi = self.layer_range
        else:
            lo, hi = 0, self.num_layers or self.cfg.num_hidden_layers
        for i in range(lo, hi):
            x = BertLayer(self.cfg, has_cross=self.cfg.add_cross_attention,
                          name=f"layer_{i}")(
                x, attn_bias, enc, enc_bias, deterministic)
        return x


class BertModel(nn.Module):
    """Text encoder / decoder (reference BertModel:981-1231)."""

    cfg: BertConfig
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, input_ids=None, attention_mask=None,
                 token_type_ids=None, inputs_embeds=None, encoder_embeds=None,
                 encoder_hidden_states=None, encoder_attention_mask=None,
                 is_decoder=False, prefix_len=None, num_layers=None,
                 layer_range=None, deterministic=True):
        cfg = self.cfg
        if encoder_embeds is not None:
            x = encoder_embeds
        else:
            x = BertEmbeddings(cfg, name="embeddings")(
                input_ids, token_type_ids, inputs_embeds=inputs_embeds,
                deterministic=deterministic)
        b, s = x.shape[:2]
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), jnp.int32)
        bias = extend_mask(attention_mask, causal=is_decoder,
                           prefix_len=prefix_len)
        enc_bias = None
        if encoder_hidden_states is not None:
            if encoder_attention_mask is None:
                encoder_attention_mask = jnp.ones(
                    encoder_hidden_states.shape[:2], jnp.int32)
            enc_bias = extend_mask(encoder_attention_mask)
        x = BertEncoder(cfg, num_layers=num_layers, layer_range=layer_range,
                        name="encoder")(
            x, bias, encoder_hidden_states, enc_bias, deterministic)
        return x


class FusionEncoder(nn.Module):
    """Skip-connected two-stream fusion (reference FusionEncoder:600-686):
    runs layers [start_layer, num_layers); each either cross-attends text
    to image or (every stride_layer) self-attends over [image; text] and
    residual-updates the image stream."""

    cfg: BertConfig

    @nn.compact
    def __call__(self, text, text_mask, image, image_mask,
                 deterministic=True):
        cfg = self.cfg
        start = max(0, cfg.num_hidden_layers - cfg.fusion_layer)
        text_bias = extend_mask(text_mask)
        image_bias = extend_mask(image_mask)
        img_len = image.shape[1]
        for i in range(start, cfg.num_hidden_layers):
            rel = i - start
            if rel == 0 or rel % cfg.stride_layer != 0:
                layer = BertLayer(cfg, has_cross=True, name=f"layer_{i}")
                text = layer(text, text_bias, image, image_bias,
                             deterministic)
            else:
                # connected layer: joint self-attention over [image; text]
                layer = BertLayer(cfg, has_cross=False, name=f"layer_{i}")
                joint = jnp.concatenate([image, text], axis=1)
                joint_mask = jnp.concatenate([image_mask, text_mask], axis=1)
                joint = layer(joint, extend_mask(joint_mask),
                              deterministic=deterministic)
                image_new, text = jnp.split(joint, [img_len], axis=1)
                image = image + image_new
        return image, text


class FusionModel(nn.Module):
    """Embeddings + FusionEncoder (reference FusionModel:1231)."""

    cfg: BertConfig
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, text_embeds, text_mask, image_embeds, image_mask,
                 deterministic=True):
        return FusionEncoder(self.cfg, name="fusion_encoder")(
            text_embeds, text_mask, image_embeds, image_mask, deterministic)


class BertLMHead(nn.Module):
    """Transform + decoder projection (reference BertLMPredictionHead:814);
    weight optionally tied to the word embedding."""

    cfg: BertConfig

    @nn.compact
    def __call__(self, hidden, shared_embedding=None):
        cfg = self.cfg
        h = nn.Dense(cfg.hidden_size,
                     kernel_init=_init(cfg.initializer_range),
                     name="transform")(hidden)
        h = jax.nn.gelu(h, approximate=False)
        h = BertLayerNorm(cfg.hidden_size, cfg.layer_norm_eps,
                          name="transform_layernorm")(h)
        bias = self.param("bias", nn.initializers.zeros, (cfg.vocab_size,))
        if shared_embedding is not None:
            logits = jnp.einsum("bsh,vh->bsv", h,
                                shared_embedding.astype(h.dtype),
                                preferred_element_type=jnp.float32)
        else:
            logits = nn.Dense(cfg.vocab_size, use_bias=False,
                              kernel_init=_init(cfg.initializer_range),
                              name="decoder")(h)
        return logits + bias


class BertPrefixModel(nn.Module):
    """Causal BERT decoder with cross-attention + LM head (reference
    BertPrefixModel:1558) — the caption generator of the mPLUG family."""

    cfg: BertConfig
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, input_ids, attention_mask=None,
                 encoder_hidden_states=None, encoder_attention_mask=None,
                 labels=None, prefix_len=None, deterministic=True):
        cfg = dataclasses.replace(self.cfg, add_cross_attention=True,
                                  num_hidden_layers=self.cfg.
                                  text_decoder_layers)
        x = BertModel(cfg, name="bert")(
            input_ids, attention_mask, is_decoder=True,
            prefix_len=prefix_len,
            encoder_hidden_states=encoder_hidden_states,
            encoder_attention_mask=encoder_attention_mask,
            deterministic=deterministic)
        logits = BertLMHead(cfg, name="cls")(x)
        out = {"last_hidden_state": x, "logits": logits}
        if labels is not None:
            from youku_mplug_tpu.ops.cross_entropy import (
                cross_entropy_with_logits,
            )

            # HF shift-inside semantics (reference BertLMHeadModel:1804)
            shift_logits = logits[:, :-1]
            shift_labels = labels[:, 1:]
            losses = cross_entropy_with_logits(shift_logits, shift_labels)
            mask = (shift_labels != -100).astype(jnp.float32)
            safe = jnp.where(shift_labels == -100, 0, shift_labels)
            losses = cross_entropy_with_logits(shift_logits, safe) * mask
            out["loss"] = losses.sum() / jnp.maximum(mask.sum(), 1.0)
        return out

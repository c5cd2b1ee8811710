"""Bloom decoder (the BloomZ-7B LM of mPLUG-Video instruction inference),
TPU-native.

The reference ships this capability through the external mPLUG-Owl repo
(reference: README.md:111-133 — ``MplugOwlForConditionalGeneration`` over
the HF ``MAGAer13/mplug-youku-bloomz-7b`` checkpoint).  The language model
there is BigScience Bloom; this module re-implements that decoder the same
way models/gpt3.py re-implements the Megatron GPT-3: plain-einsum flax
with GSPMD sharding rules, scanned layers, an explicit packed KV cache and
the pallas decode kernel.

Bloom architectural contract (pinned against the installed HF
``transformers.models.bloom.modeling_bloom``, the de-facto definition of
the checkpoint format — see tests/test_bloom.py torch-oracle parity):

- NO position embeddings.  Attention uses ALiBi: per-head slopes
  ``2^(-8i/n)`` (power-of-two head counts; HF's two-ladder extension
  otherwise), bias = ``slope_h * key_position`` added to the scores.
  HF relies on softmax shift-invariance to use absolute key positions
  instead of ``slope*(j-i)`` (build_alibi_tensor docstring); we do the
  same, which also makes the bias correct under our front-padded batched
  decode (a per-row constant shift never changes the softmax).
- input-embedding layernorm (``word_embeddings_layernorm``) between the
  token embedding and the first block.
- fused QKV is HEAD-MAJOR interleaved: rows reshape as [n, 3, d]
  (BloomAttention._reshape) — different from megatron GPT-3's [(n,3,d)]
  -with-stride layout AND from the twin's [3,n,d]; the importer maps it
  as a pure reshape (importers.bloom_params_from_torch).
- pre-LN blocks, residual from the block INPUT by default
  (apply_residual_connection_post_layernorm=False in every shipped Bloom
  config); fp32 attention softmax; tanh-approx GELU (BloomGelu == the
  megatron bias_gelu polynomial, identical to the GPT-3 path here).
- final layernorm; LM head tied to the word embeddings.

TPU mapping:
- heads-sharded fused QKV [H, n, 3, d] / row-sharded out projection —
  same GSPMD rules as the GPT-3 decoder (parallel/sharding.py matches on
  the shared param names).
- layers run under ``nn.scan``; decode threads the packed interleaved
  stacked KV cache [L, B, M, 2*n*d] as the scan carry, with the
  scalar-prefetched pallas kernel (ops/decode_attention.py, alibi=True —
  the slopes are compile-time constants folded into the score add) or an
  XLA gather fallback.
- prefill/training attention: packed pallas flash with in-kernel ALiBi
  (ops/flash_attention.py alibi_slopes — bias computed from block
  indices, zero extra HBM traffic) on TPU; einsum+bias elsewhere.
"""

from __future__ import annotations

import dataclasses
import json
import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from youku_mplug_tpu.models.gpt3 import TiedEmbedding, _dense_init
from youku_mplug_tpu.ops.attention import mha_reference
from youku_mplug_tpu.ops.cross_entropy import lm_cross_entropy, masked_mean_loss
from youku_mplug_tpu.ops.layernorm import layer_norm
from youku_mplug_tpu.runtime.precision import Policy, DEFAULT_POLICY


def alibi_slopes(num_heads: int) -> np.ndarray:
    """Per-head ALiBi slopes, fp32 [n].  Matches HF build_alibi_tensor
    (modeling_bloom.py:55-100): geometric ladder 2^(-8i/n) for the closest
    power-of-two head count, plus an interleaved half-step ladder for the
    remainder when n is not a power of two."""
    closest = 2 ** math.floor(math.log2(num_heads))
    base = 2.0 ** (-(2.0 ** -(math.log2(closest) - 3)))
    slopes = base ** np.arange(1, 1 + closest, dtype=np.float64)
    if closest != num_heads:
        extra_base = 2.0 ** (-(2.0 ** -(math.log2(2 * closest) - 3)))
        n_rem = min(closest, num_heads - closest)
        extra = extra_base ** np.arange(1, 1 + 2 * n_rem, 2,
                                        dtype=np.float64)
        slopes = np.concatenate([slopes, extra])
    return slopes.astype(np.float32)


@dataclasses.dataclass(frozen=True)
class BloomConfig:
    """Decoder hyperparameters; JSON field names follow the HF
    config.json contract (n_head / n_layer aliases accepted)."""

    vocab_size: int = 250880
    hidden_size: int = 4096
    num_hidden_layers: int = 30
    num_attention_heads: int = 32
    layernorm_epsilon: float = 1e-5
    hidden_dropout: float = 0.0
    attention_dropout: float = 0.0
    init_method_std: float = 0.02
    apply_residual_post_ln: bool = False  # all shipped Blooms: False
    # generation defaults (BloomZ uses </s> = 2 for bos/eos/pad)
    eos_id: int = 2
    pad_id: int = 3
    # engineering knobs (ours)
    scan_layers: bool = True
    scan_unroll: int = 1
    remat: bool = False
    remat_policy: str = "nothing"
    ce_chunk: int = 0
    # prefill/training attention: "packed" (pallas flash w/ in-kernel
    # alibi, TPU) | "xla" (einsum + bias tensor)
    attn_impl: str = "packed"
    # decode attention: "pallas" (in-place stacked-cache kernel,
    # alibi=True) | "gather" (dynamic_index_in_dim + XLA einsum)
    decode_attn_impl: str = "pallas"
    # KV-cache storage: "auto" (compute dtype) | "int8" (per-(token,
    # head) quantized — ops/kv_cache.py; same contract as GPT3Config)
    kv_cache_dtype: str = "auto"
    lora_rank: int = 0
    lora_alpha: float = 16.0
    lora_targets: tuple = ("qkv", "out", "fc1", "fc2")

    @property
    def ffn_dim(self) -> int:
        return 4 * self.hidden_size

    @property
    def head_dim(self) -> int:
        assert self.hidden_size % self.num_attention_heads == 0
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def from_json_file(cls, path: str, **overrides) -> "BloomConfig":
        with open(path) as f:
            raw = json.load(f)
        mapped = dict(
            vocab_size=raw.get("vocab_size", 250880),
            hidden_size=raw.get("hidden_size", raw.get("n_embed", 4096)),
            num_hidden_layers=raw.get("num_hidden_layers",
                                      raw.get("n_layer", 30)),
            num_attention_heads=raw.get("num_attention_heads",
                                        raw.get("n_head", 32)),
            layernorm_epsilon=raw.get("layer_norm_epsilon", 1e-5),
            hidden_dropout=raw.get("hidden_dropout", 0.0),
            attention_dropout=raw.get("attention_dropout", 0.0),
            init_method_std=raw.get("initializer_range", 0.02),
            apply_residual_post_ln=raw.get(
                "apply_residual_connection_post_layernorm", False),
            eos_id=raw.get("eos_token_id", 2),
            pad_id=raw.get("pad_token_id", 3),
        )
        mapped.update(overrides)
        return cls(**mapped)


def _lora_pair(mod, cfg, name, in_dim, out_dim):
    from youku_mplug_tpu.ops.lora import lora_pair

    if name not in cfg.lora_targets:
        return None
    return lora_pair(mod, name, cfg.lora_rank, in_dim, out_dim,
                     init_std=cfg.init_method_std)


def _lora_delta(pair, x, cfg, dtype):
    from youku_mplug_tpu.ops.lora import lora_delta

    return lora_delta(pair, x, cfg.lora_rank, cfg.lora_alpha, dtype)


def _qscale(mod: nn.Module, name: str):
    if mod.has_variable("qscales", name):
        return mod.get_variable("qscales", name)
    return None


class BloomAttention(nn.Module):
    """ALiBi self-attention, head-major fused QKV, explicit KV cache."""

    config: BloomConfig
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, *, cache=None, cache_len=None, valid_from=None,
                 deterministic=True):
        cfg = self.config
        n, d, h = cfg.num_attention_heads, cfg.head_dim, cfg.hidden_size
        slopes = alibi_slopes(n)  # compile-time constant

        # HEAD-MAJOR layout [H, n, 3, d]: importer is a pure reshape of the
        # HF checkpoint (modeling_bloom BloomAttention._reshape).
        qkv_kernel = self.param(
            "qkv_kernel", _dense_init(cfg.init_method_std), (h, n, 3, d))
        qkv_bias = self.param("qkv_bias", nn.initializers.zeros, (n, 3, d))
        out_kernel = self.param(
            "out_kernel", _dense_init(cfg.init_method_std), (n, d, h))
        out_bias = self.param("out_bias", nn.initializers.zeros, (h,))

        dtype = self.policy.compute_dtype if x.dtype != jnp.float32 else x.dtype
        lora_qkv = _lora_pair(self, cfg, "qkv", h, 3 * n * d)
        lora_out = _lora_pair(self, cfg, "out", n * d, h)

        b_, s_ = x.shape[:2]
        # one flat matmul; per-head q/k/v live at strided lanes
        # (head-major: lane (hd*3 + which)*d + dd)
        if cache is None:
            qkv = jnp.einsum("bsh,hk->bsk", x,
                             qkv_kernel.reshape(h, 3 * n * d).astype(dtype))
        else:
            # decode: contract the unreshaped kernel (see gpt3.py note on
            # per-layer dynamic-slice materialization)
            qkv = jnp.einsum("bsh,hnyd->bsnyd", x,
                             qkv_kernel.astype(dtype)).reshape(
                                 b_, s_, 3 * n * d)
        qkv_s = _qscale(self, "qkv_kernel")
        if qkv_s is not None:
            qkv = qkv * qkv_s.reshape(3 * n * d).astype(dtype)
        qkv = qkv + qkv_bias.reshape(3 * n * d).astype(dtype)
        ld = _lora_delta(lora_qkv, x, cfg, dtype)
        if ld is not None:
            qkv = qkv + ld
        from jax.ad_checkpoint import checkpoint_name as _ckpt_name
        qkv = _ckpt_name(qkv, "dec_qkv")

        qkv5 = qkv.reshape(b_, s_, n, 3, d)
        attn_drop = cfg.attention_dropout if not deterministic else 0.0

        def out_proj(ctx_bsnd):
            """[B,S,n,d] -> [B,S,H] with qscale/lora/bias."""
            y = jnp.einsum("bsnd,ndh->bsh", ctx_bsnd,
                           out_kernel.astype(ctx_bsnd.dtype))
            out_s = _qscale(self, "out_kernel")
            if out_s is not None:
                y = y * out_s.reshape(h).astype(y.dtype)
            ld2 = _lora_delta(
                lora_out, ctx_bsnd.reshape(b_, -1, n * d), cfg, dtype)
            if ld2 is not None:
                y = y + ld2
            return y + out_bias.astype(y.dtype)

        if cache is None:
            from youku_mplug_tpu.ops.flash_attention import (
                flash_attention_packed,
                packed_supported,
            )

            use_flash = (jax.default_backend() == "tpu"
                         and cfg.attn_impl == "packed"
                         and attn_drop == 0.0 and packed_supported(n, d))
            if use_flash:
                # packed head-contiguous lanes [B, S, n*d] for the kernel
                qp = qkv5[..., 0, :].reshape(b_, s_, n * d)
                kp = qkv5[..., 1, :].reshape(b_, s_, n * d)
                vp = qkv5[..., 2, :].reshape(b_, s_, n * d)
                out_p = flash_attention_packed(
                    qp, kp, vp, n, causal=True, alibi_slopes=slopes)
                from jax.ad_checkpoint import checkpoint_name
                out_p = checkpoint_name(out_p, "attn_out")
                return out_proj(out_p.reshape(b_, s_, n, d)), None
            q, k, v = [jnp.moveaxis(qkv5[..., i, :], 2, 1)
                       for i in range(3)]  # [B,n,S,d]
            bias = (jnp.asarray(slopes)[None, :, None, None]
                    * jnp.arange(s_, dtype=jnp.float32)[None, None, None, :])
            drop_rng = self.make_rng("dropout") if attn_drop > 0.0 else None
            out = mha_reference(q, k, v, causal=True, bias=bias,
                                dropout_rate=attn_drop,
                                dropout_rng=drop_rng)
            from jax.ad_checkpoint import checkpoint_name
            out = checkpoint_name(out, "attn_out")
            return out_proj(jnp.moveaxis(out, 1, 2)), None

        # ------------------------------------------------------------
        # decode: packed interleaved cache, same machinery as GPT-3
        # (gpt3.py GPT3Attention decode path) + alibi score bias
        # ------------------------------------------------------------
        # repack head-major qkv5 -> packed [K | V] lanes (head-contiguous)
        kvp = jnp.concatenate(
            [qkv5[..., 1, :].reshape(b_, s_, n * d),
             qkv5[..., 2, :].reshape(b_, s_, n * d)], axis=-1)
        from youku_mplug_tpu.ops import kv_cache as kvc
        full_stack = isinstance(cache, tuple)
        idx = cache_len
        new_cache = None
        if full_stack:
            ckvf, lidx = cache
            m = kvc.cache_width(ckvf, axis=2)
            ckvf = kvc.cache_write(ckvf, kvp, n, idx, lidx)
            new_cache = ckvf
            from youku_mplug_tpu.ops.decode_attention import (
                decode_attention,
                decode_attention_supported,
            )
            if (s_ == 1 and cfg.decode_attn_impl == "pallas"
                    and jax.default_backend() == "tpu"
                    and decode_attention_supported(m)):
                qp = qkv5[:, 0, :, 0, :].reshape(b_, n * d)
                quant = kvc.is_quantized(ckvf)
                out_p = decode_attention(
                    qp, ckvf["kv"] if quant else ckvf, n, lidx, idx,
                    valid_from, alibi_slopes=slopes,
                    kv_scales=ckvf["scale"] if quant else None)[:, None]
                return out_proj(out_p.reshape(b_, 1, n, d)), new_cache
            ckv = kvc.layer_dequant(kvc.layer_slice(ckvf, lidx), n,
                                    kvp.dtype)
        else:
            m = kvc.cache_width(cache, axis=1)
            new_cache = kvc.cache_write(cache, kvp, n, idx)
            ckv = kvc.layer_dequant(new_cache, n, kvp.dtype)

        q = jnp.moveaxis(qkv5[..., 0, :], 2, 1)  # [B,n,S,d]
        ckh = jnp.moveaxis(ckv[..., :n * d].reshape(b_, m, n, d), 2, 1)
        cvh = jnp.moveaxis(ckv[..., n * d:].reshape(b_, m, n, d), 2, 1)
        ki = jnp.arange(m)[None, :]
        if jnp.ndim(cache_len) == 1:
            qi = cache_len[:, None, None] + jnp.arange(s_)[None, :, None]
            allowed = ki[None] <= qi
        else:
            qi = cache_len + jnp.arange(s_)[:, None]
            allowed = (ki <= qi)[None]
        if valid_from is not None:
            allowed = allowed & (ki[None] >= valid_from[:, None, None])
        # alibi on absolute key positions (shift-invariant per query row,
        # so front-padding offsets cancel — see module docstring)
        alibi = (jnp.asarray(slopes)[:, None, None]
                 * jnp.arange(m, dtype=jnp.float32)[None, None, :])
        bias = alibi[None] + jnp.where(
            allowed, 0.0, jnp.finfo(jnp.float32).min)[:, None]
        out = mha_reference(q, ckh, cvh, bias=bias)
        return out_proj(jnp.moveaxis(out, 1, 2)), new_cache


class BloomMLP(nn.Module):
    config: BloomConfig
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.config
        h, f = cfg.hidden_size, cfg.ffn_dim
        fc1_kernel = self.param(
            "fc1_kernel", _dense_init(cfg.init_method_std), (h, f))
        fc1_bias = self.param("fc1_bias", nn.initializers.zeros, (f,))
        fc2_kernel = self.param(
            "fc2_kernel", _dense_init(cfg.init_method_std), (f, h))
        fc2_bias = self.param("fc2_bias", nn.initializers.zeros, (h,))
        lora_fc1 = _lora_pair(self, cfg, "fc1", h, f)
        lora_fc2 = _lora_pair(self, cfg, "fc2", f, h)
        y = jnp.einsum("bsh,hf->bsf", x, fc1_kernel.astype(x.dtype))
        s1 = _qscale(self, "fc1_kernel")
        if s1 is not None:
            y = y * s1.reshape(f).astype(y.dtype)
        ld = _lora_delta(lora_fc1, x, cfg, x.dtype)
        if ld is not None:
            y = y + ld
        from jax.ad_checkpoint import checkpoint_name as _name_pre
        y = _name_pre(y, "dec_fc1pre")
        # BloomGelu (modeling_bloom.py:119-127) is exactly the tanh-approx
        # megatron polynomial — same op as the GPT-3 path
        y = jax.nn.gelu(y + fc1_bias.astype(y.dtype), approximate=True)
        from jax.ad_checkpoint import checkpoint_name as _ckpt_name
        y = _ckpt_name(y, "dec_fc1h")
        hidden = y
        y = jnp.einsum("bsf,fh->bsh", y, fc2_kernel.astype(y.dtype))
        s2 = _qscale(self, "fc2_kernel")
        if s2 is not None:
            y = y * s2.reshape(h).astype(y.dtype)
        ld = _lora_delta(lora_fc2, hidden, cfg, hidden.dtype)
        if ld is not None:
            y = y + ld
        return y + fc2_bias.astype(y.dtype)


class BloomLayer(nn.Module):
    """Pre-LN Bloom block (modeling_bloom BloomBlock:364-426)."""

    config: BloomConfig
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, cache=None, cache_len=None, valid_from=None,
                 deterministic=True):
        cfg = self.config
        h = cfg.hidden_size
        ln1_scale = self.param("ln1_scale", nn.initializers.ones, (h,))
        ln1_bias = self.param("ln1_bias", nn.initializers.zeros, (h,))
        ln2_scale = self.param("ln2_scale", nn.initializers.ones, (h,))
        ln2_bias = self.param("ln2_bias", nn.initializers.zeros, (h,))

        from jax.ad_checkpoint import checkpoint_name as _ckpt_name
        attn_in = layer_norm(x, ln1_scale, ln1_bias,
                             eps=cfg.layernorm_epsilon)
        attn_in = _ckpt_name(attn_in, "dec_ln1")
        residual = attn_in if cfg.apply_residual_post_ln else x
        attn_out, new_cache = BloomAttention(
            cfg, policy=self.policy, name="attn")(
                attn_in, cache=cache, cache_len=cache_len,
                valid_from=valid_from, deterministic=deterministic)
        if not deterministic and cfg.hidden_dropout > 0:
            attn_out = nn.Dropout(rate=cfg.hidden_dropout)(
                attn_out, deterministic=False)
        x = residual + attn_out

        mlp_in = layer_norm(x, ln2_scale, ln2_bias,
                            eps=cfg.layernorm_epsilon)
        mlp_in = _ckpt_name(mlp_in, "dec_ln2")
        residual = mlp_in if cfg.apply_residual_post_ln else x
        mlp_out = BloomMLP(cfg, policy=self.policy, name="mlp")(
            mlp_in, deterministic=deterministic)
        if not deterministic and cfg.hidden_dropout > 0:
            mlp_out = nn.Dropout(rate=cfg.hidden_dropout)(
                mlp_out, deterministic=False)
        return residual + mlp_out, new_cache


class BloomDecoder(nn.Module):
    """Embedding layernorm + scanned blocks + final layernorm.

    ``__call__(input_embeds)`` — input embeds arrive RAW (pre
    word_embeddings_layernorm); the embedding LN runs here so spliced
    video query features pass through it exactly like token embeddings
    (mPLUG-Owl inserts visual features before the Bloom embedding LN
    consumes them — the abstractor output is calibrated against it).
    """

    config: BloomConfig
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, input_embeds, *, cache=None, cache_len=None,
                 valid_from=None, deterministic=True, skip_emb_ln=False):
        cfg = self.config
        h = cfg.hidden_size
        emb_ln_scale = self.param("emb_ln_scale", nn.initializers.ones,
                                  (h,))
        emb_ln_bias = self.param("emb_ln_bias", nn.initializers.zeros,
                                 (h,))
        x = input_embeds
        if not skip_emb_ln:
            x = layer_norm(x, emb_ln_scale, emb_ln_bias,
                           eps=cfg.layernorm_epsilon)
        if not deterministic and cfg.hidden_dropout > 0:
            x = nn.Dropout(rate=cfg.hidden_dropout)(x, deterministic=False)

        layer = BloomLayer
        if cfg.remat:
            if cfg.remat_policy == "names":
                policy = jax.checkpoint_policies.save_only_these_names(
                    "attn_out", "dec_qkv", "dec_fc1h", "flash_lse")
            elif cfg.remat_policy == "narrow":
                policy = jax.checkpoint_policies.save_only_these_names(
                    "dec_ln1", "dec_ln2", "attn_out", "flash_lse")
            else:
                policy = jax.checkpoint_policies.nothing_saveable
            layer = nn.remat(layer, static_argnums=(5,), policy=policy)

        if cfg.scan_layers and cache is not None:
            def body(layer_mod, carry, idx):
                x, ckv = carry
                x, ckv = layer_mod(x, (ckv, idx), cache_len, valid_from,
                                   deterministic)
                return (x, ckv), None

            scanned = nn.scan(
                body,
                variable_axes={"params": 0, "qscales": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=0, out_axes=0,
                length=cfg.num_hidden_layers,
                metadata_params={nn.meta.PARTITION_NAME: "layers"},
            )
            (x, new_cache), _ = scanned(
                BloomLayer(cfg, policy=self.policy, name="layers"),
                (x, cache), jnp.arange(cfg.num_hidden_layers))
        elif cfg.scan_layers:
            scanned = nn.scan(
                layer,
                variable_axes={"params": 0, "qscales": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(0, nn.broadcast, nn.broadcast, nn.broadcast),
                out_axes=0,
                length=cfg.num_hidden_layers,
                unroll=cfg.scan_unroll,
                metadata_params={nn.meta.PARTITION_NAME: "layers"},
            )
            x, new_cache = scanned(cfg, policy=self.policy, name="layers")(
                x, cache, cache_len, valid_from, deterministic)
        else:
            new_layers = []
            for i in range(cfg.num_hidden_layers):
                layer_cache = None if cache is None else jax.tree.map(
                    lambda c: c[i], cache)
                x, nc = layer(cfg, policy=self.policy, name=f"layers_{i}")(
                    x, layer_cache, cache_len, valid_from, deterministic)
                new_layers.append(nc)
            new_cache = (None if cache is None else
                         jax.tree.map(lambda *xs: jnp.stack(xs),
                                      *new_layers))

        ln_f_scale = self.param("ln_f_scale", nn.initializers.ones, (h,))
        ln_f_bias = self.param("ln_f_bias", nn.initializers.zeros, (h,))
        x = layer_norm(x, ln_f_scale, ln_f_bias, eps=cfg.layernorm_epsilon)
        return x, new_cache


class BloomLM(nn.Module):
    """Tied-embedding Bloom LM — the GPT3LM-compatible surface
    (embed / logits / init_cache / decode_step / __call__), so
    models/generation.py and serving/ drive it unchanged."""

    config: BloomConfig
    policy: Policy = DEFAULT_POLICY

    def setup(self):
        cfg = self.config
        self.word_embeddings = TiedEmbedding(
            cfg.vocab_size, cfg.hidden_size,
            init_std=cfg.init_method_std, name="word_embeddings")
        self.decoder = BloomDecoder(cfg, policy=self.policy, name="decoder")

    def embed(self, tokens):
        """RAW token embeddings (pre embedding-LN; the decoder applies
        word_embeddings_layernorm — see BloomDecoder docstring)."""
        return self.word_embeddings.encode(tokens,
                                           self.policy.compute_dtype)

    def logits(self, hidden):
        return self.word_embeddings.attend(hidden)

    def __call__(self, tokens=None, input_embeds=None, labels=None,
                 loss_mask=None, positions=None, deterministic=True,
                 return_logits=False):
        cfg = self.config
        if input_embeds is None:
            input_embeds = self.embed(tokens)
        else:
            input_embeds = input_embeds.astype(self.policy.compute_dtype)
        hidden, _ = self.decoder(input_embeds, deterministic=deterministic)
        out = {"last_hidden_state": hidden}
        if labels is not None:
            losses = lm_cross_entropy(
                hidden, self.word_embeddings.table(hidden.dtype), labels,
                chunk=cfg.ce_chunk)
            out["losses"] = losses
            if loss_mask is not None:
                out["loss"] = masked_mean_loss(losses[:, :-1], loss_mask)
        if return_logits:
            out["logits"] = self.logits(hidden)
        return out

    def init_cache(self, batch, max_len, dtype=None):
        from youku_mplug_tpu.ops.kv_cache import make_cache

        cfg = self.config
        dtype = dtype or self.policy.compute_dtype
        max_len = -(-max_len // 128) * 128
        return make_cache(cfg.num_hidden_layers, batch, max_len,
                          cfg.hidden_size, cfg.num_attention_heads, dtype,
                          quantized=cfg.kv_cache_dtype == "int8")

    def decode_step(self, input_embeds, cache, cache_len, valid_from=None,
                    position_offset=None, return_all=False):
        """Same contract as GPT3LM.decode_step; position args are accepted
        for interface compatibility and ignored (ALiBi carries position)."""
        del position_offset  # no position embeddings
        hidden, new_cache = self.decoder(
            input_embeds.astype(self.policy.compute_dtype),
            cache=cache, cache_len=cache_len, valid_from=valid_from,
            deterministic=True)
        if return_all:
            return self.logits(hidden), new_cache
        logits = self.logits(hidden[:, -1:])[:, 0]
        return logits, new_cache

"""GPT-3 decoder (the frozen Chinese GPT-3 of mPLUG-Video), TPU-native.

Re-implements the capability of the reference's Megatron-TP decoder
(reference: models/modeling_distributed_gpt3.py — GPT3Model:1272,
GPT3ParallelTransformer:1092, GPT3ParallelAttention:820, GPT3ParallelMLP:550,
GPT3Embedding:598) as a plain-einsum flax module whose tensor parallelism is
expressed entirely through sharding rules (youku_mplug_tpu/parallel/sharding.py):

- fused QKV kernel stored [H, 3, n_heads, head_dim], sharded on heads —
  the ColumnParallelLinear layout without the hand-written collectives.
- attention output kernel [n_heads, head_dim, H], sharded on heads —
  RowParallelLinear; XLA inserts the forward all-reduce GSPMD-style.
- MLP [H, 4H] / [4H, H] sharded on the hidden-ffn dim.
- token embedding [V, H] sharded on vocab; logits stay vocab-sharded through
  the tied-embedding matmul and the fp32 cross-entropy
  (youku_mplug_tpu/ops/cross_entropy.py).

Numerics contract (matches the reference bf16 path):
- fp32 layernorms (megatron fused LayerNorm → ops.layer_norm)
- fp32 attention softmax (FusedScaleMaskSoftmax w/ query-key layer scaling →
  flash attention with fp32 online softmax; the layer-number rescaling
  cancels mathematically and is dropped)
- tanh-approx GELU with fused bias (megatron bias_gelu_impl)
- fp32 cross-entropy on vocab-sharded logits
- causal-only attention mask: padded positions participate as keys, exactly
  like the reference (build_attention_mask_and_position_ids:1288-1298);
  padding is excluded from the loss via loss_mask, never the attention.

Layers run under ``nn.scan`` (single compiled layer body, stacked params)
with optional ``jax.checkpoint`` rematerialization.

Decode path: one explicit packed interleaved KV-cache array
([L, B, M, 2*hidden], rows = [K | V] lanes, stacked over layers)
threaded through the scan — the jit-compatible replacement for the
reference's InferenceParams buffer + swap_key_value_dict beam reorder
(modeling_distributed_gpt3.py:1446-1473), laid out so a decode step
writes one contiguous row and the pallas decode kernel
(ops/decode_attention.py) streams it back without unpacking heads.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from youku_mplug_tpu.ops.attention import dot_product_attention, mha_reference
from youku_mplug_tpu.ops.cross_entropy import lm_cross_entropy, masked_mean_loss
from youku_mplug_tpu.ops.layernorm import layer_norm
from youku_mplug_tpu.runtime.precision import Policy, DEFAULT_POLICY


@dataclasses.dataclass(frozen=True)
class GPT3Config:
    """Decoder hyperparameters; JSON layout matches the reference's
    configs/models/config_gpt3_*.json contract."""

    vocab_size: int = 25600
    hidden_size: int = 768
    ffn_hidden_size: Optional[int] = None
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 2048
    layernorm_epsilon: float = 1e-12
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    init_method_std: float = 0.02
    # generation defaults
    eod_id: int = 7
    tokens_to_generate: int = 100
    top_k: int = 0
    top_p: float = 0.9
    # engineering knobs (ours, not the reference's)
    scan_layers: bool = True
    # unroll factor for the layer scan: >1 lets XLA software-pipeline
    # weight loads against compute across consecutive layers
    scan_unroll: int = 1
    remat: bool = False
    # "nothing" | "dots" | "attn" | "names" (saves attn output + qkv +
    # fc1-gelu so backward recompute runs only the cheap projections)
    remat_policy: str = "nothing"
    ce_chunk: int = 0
    # packed-layout flash attention ([B,S,n*d], no head transposes; d<128
    # heads run 128//d per lane strip) — the TPU production path.
    # attn_impl: "packed" | "xla" (einsum; XLA-batched matmuls)
    use_packed_flash: bool = True
    attn_impl: str = "packed"
    # decode-step attention over the stacked KV cache:
    # "pallas" — in-place read of the layer slice via scalar-prefetched
    # layer index (ops/decode_attention.py; TPU only, cache width % 128);
    # "gather" — dynamic_index_in_dim layer-slice copy + XLA einsum.
    decode_attn_impl: str = "pallas"
    # KV-cache storage: "auto" (policy compute dtype, bf16 on TPU) or
    # "int8" (per-(token, head) symmetric quantization, ops/kv_cache.py
    # — halves decode cache traffic and doubles servable context; the
    # pallas decode kernel dequantizes per-block in VMEM)
    kv_cache_dtype: str = "auto"
    # pair-scan: scan over L/2 two-layer bodies, rematerializing only the
    # FIRST layer of each pair (skip-remat — the decoder analog of the
    # vision half/third policies: spend HBM headroom to halve backward
    # recompute).  Changes the param layout to layers/{a,b} stacked
    # [L/2, ...]; requires even L + scan_layers.  Checkpoints are NOT
    # layout-compatible across this flag.
    layer_pairing: bool = False
    # LoRA adapters (ours — the reference can only fully freeze or fully
    # train the decoder): rank-r additive deltas on the projection
    # matmuls.  LoRA params are named lora_* and are ALWAYS trainable,
    # even under freeze_text_decoder (optim/factory.py:freeze_mask), so
    # rank>0 + frozen decoder = parameter-efficient finetuning with no
    # Adam state on the 1.3B base.  b-matrices are zero-init: rank>0
    # leaves the forward bit-identical until training moves them.
    lora_rank: int = 0
    lora_alpha: float = 16.0
    lora_targets: tuple = ("qkv", "out", "fc1", "fc2")

    @property
    def pairing_active(self) -> bool:
        return (self.layer_pairing and self.scan_layers and self.remat
                and self.num_hidden_layers % 2 == 0)

    @property
    def ffn_dim(self) -> int:
        return self.ffn_hidden_size or 4 * self.hidden_size

    @property
    def head_dim(self) -> int:
        assert self.hidden_size % self.num_attention_heads == 0
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def from_json_file(cls, path: str, **overrides) -> "GPT3Config":
        with open(path) as f:
            raw = json.load(f)
        mapped = dict(
            vocab_size=raw.get("vocab_size", 25600),
            hidden_size=raw.get("hidden_size", 768),
            ffn_hidden_size=raw.get("ffn_hidden_size"),
            num_hidden_layers=raw.get("num_hidden_layers", 12),
            num_attention_heads=raw.get("num_attention_heads", 12),
            max_position_embeddings=raw.get("max_position_embeddings", 2048),
            layernorm_epsilon=raw.get("layernorm_epsilon", 1e-12),
            hidden_dropout=raw.get("hidden_dropout_prob", 0.1),
            attention_dropout=raw.get("attention_probs_dropout_prob", 0.1),
            init_method_std=raw.get("initializer_range", 0.02),
            eod_id=raw.get("eod_id", 7),
        )
        mapped.update(overrides)
        return cls(**mapped)


def _dense_init(std):
    return nn.initializers.normal(stddev=std)


def _lora_pair(mod: nn.Module, cfg: GPT3Config, name: str,
               in_dim: int, out_dim: int):
    """Create (a, b) adapter params for projection `name`, or None when
    LoRA is off for it.  Created unconditionally at module top so the
    param tree is identical across the train/decode branches."""
    from youku_mplug_tpu.ops.lora import lora_pair

    if name not in cfg.lora_targets:
        return None
    return lora_pair(mod, name, cfg.lora_rank, in_dim, out_dim,
                     init_std=cfg.init_method_std)


def _lora_delta(pair, x, cfg: GPT3Config, dtype):
    """alpha/r-scaled low-rank delta: (x @ a) @ b, [..., out_dim]."""
    from youku_mplug_tpu.ops.lora import lora_delta

    return lora_delta(pair, x, cfg.lora_rank, cfg.lora_alpha, dtype)


def _qscale(mod: nn.Module, name: str):
    """Optional int8 dequant scale from the 'qscales' collection (see
    ops/quant.py): present only when the caller passed quantized params —
    the default (no collection) traces identically to the fp path."""
    if mod.has_variable("qscales", name):
        return mod.get_variable("qscales", name)
    return None


class GPT3Attention(nn.Module):
    """Self-attention with heads-sharded fused QKV and explicit KV cache."""

    config: GPT3Config
    layer_scale_std: float
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, *, cache=None, cache_len=None, valid_from=None,
                 deterministic=True):
        cfg = self.config
        n, d, h = cfg.num_attention_heads, cfg.head_dim, cfg.hidden_size

        qkv_kernel = self.param(
            "qkv_kernel", _dense_init(cfg.init_method_std), (h, 3, n, d))
        qkv_bias = self.param("qkv_bias", nn.initializers.zeros, (3, n, d))
        out_kernel = self.param(
            "out_kernel", _dense_init(self.layer_scale_std), (n, d, h))
        out_bias = self.param("out_bias", nn.initializers.zeros, (h,))

        dtype = self.policy.compute_dtype if x.dtype != jnp.float32 else x.dtype
        lora_qkv = _lora_pair(self, cfg, "qkv", h, 3 * n * d)
        lora_out = _lora_pair(self, cfg, "out", n * d, h)
        # one flat [M,H]x[H,3nd] matmul; q/k/v are contiguous slices (the
        # [b,3,s,n,d] layout costs a fused transpose on every qkv matmul).
        # Decode only: contract against the UNRESHAPED kernel and reshape
        # the (tiny [B,1,3nd]) output instead — reshaping the kernel after
        # the scan's per-layer dynamic-slice makes XLA materialize the
        # slice, a 12.6 MB copy per layer per decode step in the trace;
        # the raw operand fuses.  In training/prefill the flat reshape is
        # free (params aren't sliced per step) and benches ~0.7pp MFU
        # better, so each path keeps its own form.
        b_, s_ = x.shape[:2]
        if cache is None:
            qkv = jnp.einsum("bsh,hk->bsk", x,
                             qkv_kernel.reshape(h, 3 * n * d).astype(dtype))
        else:
            qkv = jnp.einsum("bsh,hynd->bsynd", x,
                             qkv_kernel.astype(dtype)).reshape(
                                 b_, s_, 3 * n * d)
        qkv_s = _qscale(self, "qkv_kernel")
        if qkv_s is not None:  # int8 kernel: scale the output channels
            qkv = qkv * qkv_s.reshape(3 * n * d).astype(dtype)
        qkv = qkv + qkv_bias.reshape(3 * n * d).astype(dtype)
        ld = _lora_delta(lora_qkv, x, cfg, dtype)
        if ld is not None:
            qkv = qkv + ld
        from jax.ad_checkpoint import checkpoint_name as _ckpt_name
        qkv = _ckpt_name(qkv, "dec_qkv")

        attn_drop = cfg.attention_dropout if not deterministic else 0.0

        from youku_mplug_tpu.ops.flash_attention import (
            flash_attention_packed,
            packed_supported,
        )

        packed = (cache is None and jax.default_backend() == "tpu"
                  and cfg.use_packed_flash and cfg.attn_impl == "packed"
                  and attn_drop == 0.0 and packed_supported(n, d))
        if packed:
            # packed layout: [B, S, n*d] straight into the pallas kernel —
            # no per-head transposes (the profile's 'copy' tax)
            qp = qkv[..., :n * d]
            kp = qkv[..., n * d:2 * n * d]
            vp = qkv[..., 2 * n * d:]
            out_p = flash_attention_packed(qp, kp, vp, n, causal=True)
            from jax.ad_checkpoint import checkpoint_name
            out_p = checkpoint_name(out_p, "attn_out")
            y = jnp.einsum(
                "bsk,kh->bsh", out_p,
                out_kernel.reshape(n * d, h).astype(out_p.dtype))
            out_s = _qscale(self, "out_kernel")
            if out_s is not None:
                y = y * out_s.reshape(h).astype(y.dtype)
            ld = _lora_delta(lora_out, out_p, cfg, dtype)
            if ld is not None:
                y = y + ld
            y = y + out_bias.astype(y.dtype)
            return y, None

        new_cache = None
        if cache is None:
            q, k, v = [
                jnp.moveaxis(
                    qkv[..., i * n * d:(i + 1) * n * d].reshape(
                        b_, s_, n, d), 2, 1)
                for i in range(3)]  # [B,n,S,d]
            # attention-probability dropout (reference partition-local attn
            # dropout, modeling_distributed_gpt3.py:778-780); active only on
            # an unfrozen training decoder
            drop_rng = (self.make_rng("dropout") if attn_drop > 0.0
                        else None)
            out = dot_product_attention(
                q, k, v, causal=True, dropout_rate=attn_drop,
                dropout_rng=drop_rng,
                use_flash=False if cfg.attn_impl == "xla" else None)
            # named checkpoint: the "attn" remat policy saves this tensor so
            # backward recompute skips the attention kernel entirely
            from jax.ad_checkpoint import checkpoint_name
            out = checkpoint_name(out, "attn_out")
        else:
            # Decode: write this chunk into the static-size cache, attend to
            # everything written so far.  The cache is PACKED and
            # INTERLEAVED: kv [B, M, 2*n*d] with each row = [K | V] lanes
            # — exactly the layout the fused qkv projection emits, so a
            # decode step's write is ONE contiguous slice per sample and
            # the TPU kernel streams K and V with a single DMA per block
            # (ops/decode_attention.py).  cache_len is a scalar (lock-step
            # generate) or a [B] array (continuous batching: every slot
            # sits at its own length — serving/engine.py).
            #
            # Full-stack mode (cache = (ckv_full [L,B,M,2*n*d],
            # layer_idx), used by the decode scan): the new token's K/V
            # row is written DIRECTLY into the stacked carry instead of
            # returning an updated layer slice for the scan to copy back
            # whole (~1 ms/token of pure write-back at 1.3B B=16,
            # BENCHLOG), and attention reads the layer's keys in place.
            # Cache writes/reads go through ops/kv_cache.py: per-sample
            # write positions use a fori_loop of dynamic_update_slices
            # (a vmap'd DUS lowers to a scatter whose TPU lowering
            # transposes the WHOLE stacked cache to batch-minor layout
            # and back — two ~1.6 GB copy fusions per step, measured
            # 239 ms/step vs 5 ms lock-step at 1.3B/B=16/M=512); an
            # int8 cache ({"kv","scale"} pytree) quantizes on the way
            # in and the pallas kernel dequantizes per-block in VMEM.
            from youku_mplug_tpu.ops import kv_cache as kvc
            kvp = qkv[..., n * d:]  # [B, S, 2*n*d] — K|V, contiguous
            full_stack = isinstance(cache, tuple)
            s = s_
            idx = cache_len
            if full_stack:
                ckvf, lidx = cache
                m = kvc.cache_width(ckvf, axis=2)
                ckvf = kvc.cache_write(ckvf, kvp, n, idx, lidx)
                new_cache = ckvf
                from youku_mplug_tpu.ops.decode_attention import (
                    decode_attention,
                    decode_attention_supported,
                )
                if (s == 1 and cfg.decode_attn_impl == "pallas"
                        and jax.default_backend() == "tpu"
                        and decode_attention_supported(m)):
                    # in-place stacked-cache read: no layer gather copy,
                    # per-sample length-bounded key streaming
                    quant = kvc.is_quantized(ckvf)
                    out_p = decode_attention(
                        qkv[:, 0, :n * d],
                        ckvf["kv"] if quant else ckvf, n, lidx, idx,
                        valid_from,
                        kv_scales=ckvf["scale"] if quant else None,
                    )[:, None]  # [B, 1, n*d]
                    y = jnp.einsum("bsnd,ndh->bsh",
                                   out_p.reshape(b_, 1, n, d),
                                   out_kernel.astype(out_p.dtype))
                    out_s = _qscale(self, "out_kernel")
                    if out_s is not None:
                        y = y * out_s.reshape(h).astype(y.dtype)
                    ld = _lora_delta(lora_out, out_p, cfg, dtype)
                    if ld is not None:
                        y = y + ld
                    y = y + out_bias.astype(y.dtype)
                    return y, new_cache
                ckv = kvc.layer_dequant(kvc.layer_slice(ckvf, lidx), n,
                                        dtype)
            else:
                m = kvc.cache_width(cache, axis=1)  # [B, M, 2*n*d]
                new_cache = kvc.cache_write(cache, kvp, n, idx)
                ckv = kvc.layer_dequant(new_cache, n, dtype)
            q = jnp.moveaxis(
                qkv[..., :n * d].reshape(b_, s_, n, d), 2, 1)  # [B,n,S,d]
            ckh = jnp.moveaxis(
                ckv[..., :n * d].reshape(b_, m, n, d), 2, 1)  # [B,n,M,d]
            cvh = jnp.moveaxis(
                ckv[..., n * d:].reshape(b_, m, n, d), 2, 1)
            ki = jnp.arange(m)[None, :]  # [1, M]
            if jnp.ndim(cache_len) == 1:
                qi = (cache_len[:, None, None]
                      + jnp.arange(s)[None, :, None])     # [B, S, 1]
                allowed = ki[None] <= qi                  # [B, S, M]
            else:
                qi = cache_len + jnp.arange(s)[:, None]
                allowed = (ki <= qi)[None]  # [1, S, M]
            # mask: key j visible to query i(abs = cache_len+i) iff j <= abs;
            # valid_from [B] additionally hides front-padding positions
            # (batched variable-length prompts; the reference instead loops
            # per sample, modeling_distributed_gpt3.py:800)
            if valid_from is not None:
                allowed = allowed & (
                    ki[None] >= valid_from[:, None, None])
            bias = jnp.where(allowed, 0.0, jnp.finfo(jnp.float32).min)
            out = mha_reference(q, ckh, cvh, bias=bias[:, None])

        out = jnp.moveaxis(out, 1, 2)  # [B,S,n,d]
        y = jnp.einsum("bsnd,ndh->bsh", out, out_kernel.astype(out.dtype))
        out_s = _qscale(self, "out_kernel")
        if out_s is not None:
            y = y * out_s.reshape(h).astype(y.dtype)
        ld = _lora_delta(lora_out, out.reshape(b_, -1, n * d), cfg, dtype)
        if ld is not None:
            y = y + ld
        y = y + out_bias.astype(y.dtype)
        return y, new_cache


class GPT3MLP(nn.Module):
    config: GPT3Config
    layer_scale_std: float
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.config
        h, f = cfg.hidden_size, cfg.ffn_dim
        fc1_kernel = self.param(
            "fc1_kernel", _dense_init(cfg.init_method_std), (h, f))
        fc1_bias = self.param("fc1_bias", nn.initializers.zeros, (f,))
        fc2_kernel = self.param(
            "fc2_kernel", _dense_init(self.layer_scale_std), (f, h))
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
        # fused bias + tanh-approx gelu (megatron bias_gelu_impl contract,
        # reference: modeling_distributed_gpt3.py:586-588)
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
        y = y + fc2_bias.astype(y.dtype)
        return y


class GPT3Layer(nn.Module):
    """Pre-LN transformer layer (reference GPT3ParallelTransformerLayer:982)."""

    config: GPT3Config
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, cache=None, cache_len=None, valid_from=None,
                 deterministic=True):
        cfg = self.config
        # scaled init for output-facing kernels (megatron
        # scaled_init_method_normal: std / sqrt(2*num_layers))
        scaled_std = cfg.init_method_std / (2.0 * cfg.num_hidden_layers) ** 0.5

        ln1_scale = self.param("ln1_scale", nn.initializers.ones,
                               (cfg.hidden_size,))
        ln1_bias = self.param("ln1_bias", nn.initializers.zeros,
                              (cfg.hidden_size,))
        ln2_scale = self.param("ln2_scale", nn.initializers.ones,
                               (cfg.hidden_size,))
        ln2_bias = self.param("ln2_bias", nn.initializers.zeros,
                              (cfg.hidden_size,))

        from jax.ad_checkpoint import checkpoint_name as _ckpt_name
        attn_in = layer_norm(x, ln1_scale, ln1_bias,
                             eps=cfg.layernorm_epsilon)
        attn_in = _ckpt_name(attn_in, "dec_ln1")
        attn_out, new_cache = GPT3Attention(
            cfg, layer_scale_std=scaled_std, policy=self.policy,
            name="attn")(attn_in, cache=cache, cache_len=cache_len,
                         valid_from=valid_from,
                         deterministic=deterministic)
        if not deterministic and cfg.hidden_dropout > 0:
            attn_out = nn.Dropout(rate=cfg.hidden_dropout)(
                attn_out, deterministic=False)
        x = x + attn_out

        mlp_in = layer_norm(x, ln2_scale, ln2_bias, eps=cfg.layernorm_epsilon)
        mlp_in = _ckpt_name(mlp_in, "dec_ln2")
        mlp_out = GPT3MLP(cfg, layer_scale_std=scaled_std,
                          policy=self.policy, name="mlp")(
            mlp_in, deterministic=deterministic)
        if not deterministic and cfg.hidden_dropout > 0:
            mlp_out = nn.Dropout(rate=cfg.hidden_dropout)(
                mlp_out, deterministic=False)
        x = x + mlp_out
        return x, new_cache


class GPT3LayerPair(nn.Module):
    """Two consecutive decoder layers as one scan body
    (``GPT3Config.layer_pairing``): sublayer ``a`` runs under full
    rematerialization, sublayer ``b`` keeps its activations — skip-remat,
    halving backward recompute for ~75 MB/pair of residuals.  Cache
    slices arrive stacked [2, B, M, 2*n*d] per pair."""

    config: GPT3Config
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, cache=None, cache_len=None, valid_from=None,
                 deterministic=True):
        a_cls = GPT3Layer
        if self.config.remat:
            a_cls = nn.remat(
                GPT3Layer, static_argnums=(5,),
                policy=jax.checkpoint_policies.nothing_saveable)
        ca = cb = None
        if cache is not None:
            ca = jax.tree.map(lambda c: c[0], cache)
            cb = jax.tree.map(lambda c: c[1], cache)
        x, na = a_cls(self.config, policy=self.policy, name="a")(
            x, ca, cache_len, valid_from, deterministic)
        x, nb = GPT3Layer(self.config, policy=self.policy, name="b")(
            x, cb, cache_len, valid_from, deterministic)
        new_cache = None
        if na is not None:
            new_cache = jax.tree.map(lambda p, q: jnp.stack([p, q]), na, nb)
        return x, new_cache


class GPT3Decoder(nn.Module):
    """Embedding + scanned layer stack + final layernorm.

    ``__call__(input_embeds, positions)`` -> [B, S, H] hidden states.
    Token embedding lookup lives in :class:`GPT3LM` so callers can build
    mixed (query-prefix + token) input embeddings, mirroring the reference's
    prefix-LM forward (distributed_gpt3.py:155-157).
    """

    config: GPT3Config
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, input_embeds, positions, *, cache=None, cache_len=None,
                 valid_from=None, deterministic=True):
        cfg = self.config
        pos_emb = self.param(
            "position_embeddings", _dense_init(cfg.init_method_std),
            (cfg.max_position_embeddings, cfg.hidden_size))
        x = input_embeds + pos_emb[positions].astype(input_embeds.dtype)
        if not deterministic and cfg.hidden_dropout > 0:
            x = nn.Dropout(rate=cfg.hidden_dropout)(x, deterministic=False)

        layer = GPT3Layer
        if cfg.remat:
            if cfg.remat_policy == "dots":
                policy = jax.checkpoint_policies.\
                    dots_with_no_batch_dims_saveable
            elif cfg.remat_policy == "attn":
                policy = jax.checkpoint_policies.save_only_these_names(
                    "attn_out", "flash_lse")
            elif cfg.remat_policy == "names":
                policy = jax.checkpoint_policies.save_only_these_names(
                    "attn_out", "dec_qkv", "dec_fc1h", "flash_lse")
            elif cfg.remat_policy == "narrow":
                # allowlist of the NARROW (hidden_size-wide) per-layer
                # tensors: backward recompute is only the wide
                # projections (qkv + fc1 + gelu, ~26 ms on the flagship)
                # for ~1 GB of residuals — exclusion-based policies
                # (see "nofc1") cannot bound width because XLA saves
                # unnamed wide intermediates instead
                policy = jax.checkpoint_policies.save_only_these_names(
                    "dec_ln1", "dec_ln2", "attn_out", "flash_lse")
            elif cfg.remat_policy == "nofc1":
                # save-everything EXCEPT the wide projections (4x MLP
                # hiddens + 3x qkv): backward recompute is fc1+gelu+qkv
                # (~25 ms on the flagship) for ~7 GB less residual HBM
                # than full save-everything, which does not fit on a
                # 16 GB chip at B=16
                policy = jax.checkpoint_policies.save_anything_except_these_names(
                    "dec_fc1pre", "dec_fc1h", "dec_qkv")
            elif cfg.remat_policy == "offload":
                # keep HBM pressure at nothing_saveable levels but park the
                # big per-layer intermediates in pinned host RAM instead of
                # recomputing them: backward streams them back over PCIe.
                policy = jax.checkpoint_policies.\
                    save_and_offload_only_these_names(
                        names_which_can_be_saved=["flash_lse"],
                        names_which_can_be_offloaded=[
                            "attn_out", "dec_qkv", "dec_fc1h"],
                        offload_src="device", offload_dst="pinned_host")
            else:
                policy = jax.checkpoint_policies.nothing_saveable
            # __call__(self, x, cache, cache_len, valid_from, deterministic)
            # -> deterministic is static arg index 5 (self counts as 0)
            layer = nn.remat(layer, static_argnums=(5,), policy=policy)

        if cfg.pairing_active:
            n_pair = cfg.num_hidden_layers // 2
            cache_s = None
            if cache is not None:
                cache_s = jax.tree.map(
                    lambda c: c.reshape((n_pair, 2) + c.shape[1:]), cache)
            scanned = nn.scan(
                GPT3LayerPair,
                variable_axes={"params": 0, "qscales": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(0, nn.broadcast, nn.broadcast, nn.broadcast),
                out_axes=0,
                length=n_pair,
                unroll=cfg.scan_unroll,
                metadata_params={nn.meta.PARTITION_NAME: "layers"},
            )
            x, new_cache = scanned(cfg, policy=self.policy, name="layers")(
                x, cache_s, cache_len, valid_from, deterministic)
            if new_cache is not None:
                new_cache = jax.tree.map(
                    lambda c: c.reshape((cfg.num_hidden_layers,)
                                        + c.shape[2:]), new_cache)
        elif cfg.scan_layers and cache is not None:
            # Decode: thread the FULL cache through the scan as a carry
            # and update each layer's slice with dynamic_update_index.
            # XLA keeps the carry aliased in the surrounding while loop,
            # so a decode step writes only the new token's K/V — the
            # xs/ys scan form instead re-slices and re-stacks the whole
            # [L, B, M, 2*n*d] cache every step (measured linear-in-B
            # decode cost, BENCHLOG round 2 decode table).
            def body(layer_mod, carry, idx):
                x, ckv = carry
                # full-stack mode: the attention writes only the new
                # token's K/V row into the stacked carry and reads its
                # layer slice in place — no [B,M,2nd] write-back
                x, ckv = layer_mod(x, (ckv, idx), cache_len,
                                   valid_from, deterministic)
                return (x, ckv), None

            scanned = nn.scan(
                body,
                variable_axes={"params": 0, "qscales": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=0,
                out_axes=0,
                length=cfg.num_hidden_layers,
                metadata_params={nn.meta.PARTITION_NAME: "layers"},
            )
            (x, new_cache), _ = scanned(
                GPT3Layer(cfg, policy=self.policy, name="layers"),
                (x, cache),
                jnp.arange(cfg.num_hidden_layers))
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
                         jax.tree.map(lambda *xs: jnp.stack(xs), *new_layers))

        ln_f_scale = self.param("ln_f_scale", nn.initializers.ones,
                                (cfg.hidden_size,))
        ln_f_bias = self.param("ln_f_bias", nn.initializers.zeros,
                               (cfg.hidden_size,))
        x = layer_norm(x, ln_f_scale, ln_f_bias, eps=cfg.layernorm_epsilon)
        return x, new_cache


class TiedEmbedding(nn.Module):
    """Token embedding + tied logits head, int8-aware.

    Keeps the flax param path ``word_embeddings/embedding`` (checkpoint-
    and importer-compatible with the former ``nn.Embed``).  With the
    ``qscales`` collection present (ops/quant.py, per-vocab-row scales),
    lookups dequantize the gathered rows and the logits matmul runs the
    int8->bf16 convert inside the dot with the scale applied to the
    output channel — halving the ~V*H bytes every decode step streams
    through the tied head.
    """

    num_embeddings: int
    features: int
    init_std: float = 0.02

    def setup(self):
        self.embedding = self.param(
            "embedding", _dense_init(self.init_std),
            (self.num_embeddings, self.features))

    def encode(self, tokens, dtype):
        rows = jnp.take(self.embedding, tokens, axis=0)
        s = _qscale(self, "embedding")
        if s is not None:  # [V, 1] per-row scales
            rows = rows.astype(jnp.float32) * jnp.take(s, tokens, axis=0)
        return rows.astype(dtype)

    def attend(self, hidden):
        emb = self.embedding
        y = jnp.einsum("bsh,vh->bsv", hidden, emb.astype(hidden.dtype),
                       preferred_element_type=jnp.float32)
        s = _qscale(self, "embedding")
        if s is not None:
            y = y * s.reshape(1, 1, -1)
        return y

    def table(self, dtype):
        """Dequantized [V, H] table (training CE path)."""
        emb = self.embedding
        s = _qscale(self, "embedding")
        if s is not None:
            emb = emb.astype(jnp.float32) * s
        return emb.astype(dtype)


class GPT3LM(nn.Module):
    """Tied-embedding LM head over the decoder.

    forward(tokens | input_embeds, labels, loss_mask) computes the
    reference's masked-mean LM loss (modeling_distributed_gpt3.py:1578-1618):
    per-position fp32 CE against vocab-sharded tied-embedding logits; the
    caller supplies already-shifted labels and the loss mask (queries +
    prompt positions zeroed).
    """

    config: GPT3Config
    policy: Policy = DEFAULT_POLICY

    def setup(self):
        cfg = self.config
        self.word_embeddings = TiedEmbedding(
            cfg.vocab_size, cfg.hidden_size,
            init_std=cfg.init_method_std,
            name="word_embeddings")
        self.decoder = GPT3Decoder(cfg, policy=self.policy, name="decoder")

    def embed(self, tokens):
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
        b, s, _ = input_embeds.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
        hidden, _ = self.decoder(input_embeds, positions,
                                 deterministic=deterministic)

        out = {"last_hidden_state": hidden}
        if labels is not None:
            losses = lm_cross_entropy(
                hidden, self.word_embeddings.table(hidden.dtype), labels,
                chunk=cfg.ce_chunk)
            out["losses"] = losses
            if loss_mask is not None:
                # drop the last position, exactly like the reference
                # (losses[:, :-1], modeling_distributed_gpt3.py:1612-1617)
                out["loss"] = masked_mean_loss(losses[:, :-1], loss_mask)
        if return_logits:
            out["logits"] = self.logits(hidden)
        return out

    # ------------------------------------------------------------------
    # Decode path (explicit cache pytree)
    # ------------------------------------------------------------------

    def init_cache(self, batch, max_len, dtype=None):
        """Packed interleaved KV cache [L, B, M, 2*n*d], each row =
        [K | V] lanes (see GPT3Attention decode path: one contiguous
        write per token, single-DMA kernel reads).  With
        ``config.kv_cache_dtype == "int8"``: the quantized
        {"kv", "scale"} pytree (ops/kv_cache.py)."""
        from youku_mplug_tpu.ops.kv_cache import make_cache

        cfg = self.config
        dtype = dtype or self.policy.compute_dtype
        # round the cache width up to the pallas decode-attention block
        # granule; extra slots are never written and always masked
        max_len = -(-max_len // 128) * 128
        return make_cache(cfg.num_hidden_layers, batch, max_len,
                          cfg.hidden_size, cfg.num_attention_heads, dtype,
                          quantized=cfg.kv_cache_dtype == "int8")

    def decode_step(self, input_embeds, cache, cache_len, valid_from=None,
                    position_offset=None, return_all=False):
        """Run a chunk (prefill: S>1; decode: S=1) through the decoder with
        the KV cache. Returns (vocab logits of the last position — or of
        every position when return_all, for speculative verification —
        and the new cache).

        valid_from [B]: first valid cache position per sample (hides
        front-padding of variable-length prompts).
        position_offset [B]: subtracted from absolute positions so position
        ids start at 0 at each sample's first real token.
        cache_len: scalar (lock-step decode) or [B] per-sample write
        positions (continuous batching, serving/engine.py).
        """
        b, s, _ = input_embeds.shape
        cl = jnp.asarray(cache_len)
        positions = (cl[:, None] if cl.ndim == 1 else cl) + \
            jnp.arange(s)[None]
        positions = jnp.broadcast_to(positions, (b, s))
        if position_offset is not None:
            positions = jnp.maximum(positions - position_offset[:, None], 0)
        hidden, new_cache = self.decoder(
            input_embeds.astype(self.policy.compute_dtype), positions,
            cache=cache, cache_len=cache_len, valid_from=valid_from,
            deterministic=True)
        if return_all:
            return self.logits(hidden), new_cache
        logits = self.logits(hidden[:, -1:])[:, 0]
        return logits, new_cache

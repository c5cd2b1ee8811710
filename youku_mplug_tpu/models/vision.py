"""Vision encoders: TimeSformer (divided space-time attention), plain ViT,
and the AttentionPool visual abstractor.

Re-implements the behavior of the reference encoders (reference:
models/vision_transformer.py — TimeSformer:440, Block:211, Attention:113,
AttentionPool:341, PatchEmbed:377, VisionTransformer:595) TPU-first:

- patchify is an einsum over folded patches (one big MXU matmul) rather
  than a conv.
- all layernorms run through the fp32 island (LayerNormWithForceFP32
  contract, vision_transformer.py:43-75).
- QK matmuls accumulate in fp32 (the ``qk_float`` contract,
  vision_transformer.py:180-183) via the shared attention op.
- gradient checkpointing via nn.remat per block (reference grad_ckpt,
  vision_transformer.py:575-577).

Behavioral quirks preserved because downstream weights/accuracy depend on
them:
- qkv has *no fused bias*; instead separate q/v biases with k's bias fixed
  at zero (vision_transformer.py:127-131, 172-175).
- the divided space-time block keeps ONE cls token, repeated per frame for
  spatial attention and mean-pooled across frames afterwards
  (vision_transformer.py:253-266).
- temporal attention output passes through ``temporal_fc`` which is
  zero-initialized for every block except the first (TimeSformer init,
  vision_transformer.py:491-498) so pretrained-image weights start as an
  identity over time.
- residual-projection kernels are rescaled by 1/sqrt(2*layer_id) at init
  (fix_init_weight, vision_transformer.py:513-519).
- pos-embed is tiled per frame and the temporal embed repeat-interleaved
  per patch, added in time-major token order (vision_transformer.py:559-565).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from youku_mplug_tpu.ops.attention import dot_product_attention
from youku_mplug_tpu.ops.layernorm import layer_norm
from youku_mplug_tpu.runtime.precision import Policy, DEFAULT_POLICY


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    """Matches the reference's configs/models/{vit,clip}-*.json contract."""

    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_frames: int = 4
    drop_path: float = 0.0
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    grad_ckpt: bool = False
    # remat policy under grad_ckpt: "nothing" recomputes the whole block;
    # "attn" saves attention outputs so backward recompute skips the
    # attention kernels (named checkpoints "vis_attn_out"); "half"/
    # "third"/"sixth"/"twelfth" remat only every 2nd/3rd/6th/12th block
    # (recompute and activation memory scale inversely; "sixth" measured
    # best on v5e once temporal-flash freed the score buffers)
    remat_policy: str = "nothing"
    # attention implementation: "packed" (pallas, no head transposes),
    # "xla" (einsum attention — XLA batches the whole [B,n,S,S] matmul)
    attn_impl: str = "packed"
    # grouped temporal attention backend: True = periodic flash kernel
    # (no fp32 score materialization); False = block-diag einsum (scores
    # materialized, fused by XLA).  With multi-strip grid cells
    # (_cell_geometry) the flash kernel wins on v5e: 41.8 -> 43.2% MFU
    # (it lost only to per-cell overhead before; BENCHLOG round 2).
    temporal_flash: bool = True
    # GELU flavor in the MLP.  The reference uses torch nn.GELU (exact
    # erf) — but XLA expands exact erf into a ~25-op fp32 polynomial
    # that fuses serially into every fc2 matmul (and its grads): on v5e
    # the fc2 fusion drops from ~185 to ~68 TF/s.  The tanh approx
    # (identical to the decoder's megatron bias_gelu contract) differs
    # from erf-GELU by <1e-3 absolute — below bf16 resolution — so
    # "tanh" is the production default; set "erf" for strict fp32
    # reference parity.  "quick" = CLIP's QuickGELU x*sigmoid(1.702x)
    # (NOT within the 1e-3 budget of GELU — required for checkpoints
    # trained with it, e.g. the mPLUG-Owl CLIP-lineage vision tower).
    gelu: str = "tanh"
    stop_grad_conv1: bool = False
    use_abs_pos_emb: bool = True
    clip_model: bool = False
    init_std: float = 0.015
    ln_eps: float = 1e-6
    pretrained_ckpt: Optional[str] = None
    # LoRA adapters on the block projections (qkv/proj/fc1/fc2) — the
    # vision analog of GPT3Config.lora_rank: rank-r zero-init deltas,
    # always trainable (even under freeze_vit), so a frozen CLIP/EVA
    # backbone can be adapter-finetuned with no optimizer state on it
    lora_rank: int = 0
    lora_alpha: float = 16.0

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @classmethod
    def from_json_file(cls, path: str, **overrides) -> "VisionConfig":
        with open(path) as f:
            raw = json.load(f)
        known = {f.name for f in dataclasses.fields(cls)}
        mapped = {k: v for k, v in raw.items() if k in known}
        mapped.update(overrides)
        return cls(**mapped)


def _trunc_normal(std):
    return nn.initializers.truncated_normal(stddev=std, lower=-2, upper=2)


def _scaled_trunc_normal(std, scale):
    base = _trunc_normal(std)

    def init(key, shape, dtype=jnp.float32):
        return base(key, shape, dtype) / scale
    return init


class LayerNormFP32(nn.Module):
    """Named parameter holder around ops.layer_norm."""

    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return layer_norm(x, scale, bias, eps=self.eps)


def _mm(x, w):
    """Token-flattened projection: ``[..., K] @ [K, N]`` as a rank-2 dot.

    Rank-3 dots (free batch dim on the lhs) lower to TPU convolutions
    whose weight-gradients become window-over-the-token-axis conv-grads
    (e.g. ``window={size=197x1}``) that run far below MXU dot throughput.
    Flattening the leading dims keeps the forward and BOTH gradients as
    plain 2-D matmuls; the reshapes are contiguous (free).
    """
    lead = x.shape[:-1]
    y = x.reshape(-1, x.shape[-1]) @ w
    return y.reshape(lead + (w.shape[-1],))


class VisionAttention(nn.Module):
    """qk-fp32 attention with the reference's split q/v-bias convention."""

    dim: int
    num_heads: int
    init_std: float = 0.015
    proj_scale: float = 1.0  # fix_init_weight divisor for the out projection
    attn_drop: float = 0.0
    causal: bool = False
    attn_impl: str = "packed"  # "packed" | "xla"
    # block-diagonal attention: tokens only attend within their own
    # period-`block_period` group.  Used to pack many tiny attentions
    # (temporal attention: seq = num_frames) into one MXU-shaped call —
    # mathematically identical to running each group separately.
    block_period: int = 0
    # use the periodic flash kernel for block_period > 0 (see
    # VisionConfig.temporal_flash)
    period_flash: bool = False
    lora_rank: int = 0
    lora_alpha: float = 16.0

    @nn.compact
    def __call__(self, x, deterministic=True, post_kernel=None,
                 post_bias=None):
        """post_kernel/post_bias: an optional trailing [C, C] affine to
        FOLD into the output projection at trace time — (x@P)@T ==
        x@(P@T) exactly, so a caller's follow-up matmul (the
        TimeSformer temporal_fc) collapses into proj: one fewer
        [tokens, C] matmul + HBM round-trip per call.  The weight
        product runs in fp32 once per forward (~1 GFLOP at ViT-B —
        noise) and autodiff routes grads to both factors."""
        from youku_mplug_tpu.ops.lora import lora_delta, lora_pair

        d = self.dim // self.num_heads
        n = self.num_heads
        qkv_kernel = self.param(
            "qkv_kernel", _trunc_normal(self.init_std), (self.dim, 3, n, d))
        q_bias = self.param("q_bias", nn.initializers.zeros, (n, d))
        v_bias = self.param("v_bias", nn.initializers.zeros, (n, d))
        proj_kernel = self.param(
            "proj_kernel", _scaled_trunc_normal(self.init_std,
                                                self.proj_scale),
            (n, d, self.dim))
        proj_bias = self.param("proj_bias", nn.initializers.zeros,
                               (self.dim,))
        lora_qkv = lora_pair(self, "qkv", self.lora_rank, self.dim,
                             3 * n * d, init_std=self.init_std)
        lora_proj = lora_pair(self, "proj", self.lora_rank, n * d,
                              self.dim, init_std=self.init_std)

        if post_kernel is not None:
            # fold the trailing affine into proj (docstring); LoRA's
            # additive delta lands after proj and would need its own @T,
            # so callers only fuse with lora_rank == 0
            assert self.lora_rank == 0, "post_kernel fusion requires no LoRA"
            pk32 = post_kernel.astype(jnp.float32)
            proj_kernel = jnp.einsum(
                "ndc,ce->nde", proj_kernel.astype(jnp.float32), pk32)
            proj_bias = proj_bias.astype(jnp.float32) @ pk32
            if post_bias is not None:
                proj_bias = proj_bias + post_bias.astype(jnp.float32)

        lead = x.shape[:-2]
        s = x.shape[-2]
        xf = x.reshape((-1, s, self.dim))
        bf = xf.shape[0]
        # one flat [M,H]x[H,3nd] matmul; q/k/v are contiguous slices of the
        # output (no [b,3,s,n,d] intermediate, whose layout costs a
        # transpose fused into every qkv matmul)
        qkv_flat = _mm(
            xf, qkv_kernel.reshape(self.dim, 3 * n * d).astype(x.dtype))
        ld = lora_delta(lora_qkv, xf, self.lora_rank, self.lora_alpha,
                        x.dtype)
        if ld is not None:
            qkv_flat = qkv_flat + ld
        from jax.ad_checkpoint import checkpoint_name as _ckpt_name
        qkv_flat = _ckpt_name(qkv_flat, "vis_qkv")
        drop = self.attn_drop if not deterministic else 0.0

        from youku_mplug_tpu.ops.flash_attention import (
            flash_attention_packed,
            packed_supported,
        )

        if (self.attn_impl == "packed"
                and jax.default_backend() == "tpu" and drop == 0.0
                and not self.causal
                and (s >= 128 if self.block_period == 0
                     else (s % 8 == 0 and self.period_flash))
                and packed_supported(n, d)):
            # packed path: keep [B, S, n*d] end to end (no head transposes);
            # block_period > 0 runs the block-diagonal variant (grouped
            # temporal attention) without materializing fp32 scores
            qp = (qkv_flat[..., :n * d]
                  + q_bias.reshape(n * d).astype(x.dtype))
            kp = qkv_flat[..., n * d:2 * n * d]
            vp = (qkv_flat[..., 2 * n * d:]
                  + v_bias.reshape(n * d).astype(x.dtype))
            out_p = flash_attention_packed(qp, kp, vp, n,
                                           period=self.block_period)
            from jax.ad_checkpoint import checkpoint_name
            out_p = checkpoint_name(out_p, "vis_attn_out")
            y = _mm(out_p, proj_kernel.reshape(n * d, self.dim).astype(
                out_p.dtype))
            ld = lora_delta(lora_proj, out_p, self.lora_rank,
                            self.lora_alpha, y.dtype)
            if ld is not None:
                y = y + ld
            y = y + proj_bias.astype(y.dtype)
            return y.reshape(lead + (s, self.dim))

        q = (qkv_flat[..., :n * d]
             + q_bias.reshape(n * d).astype(x.dtype)).reshape(bf, s, n, d)
        k = qkv_flat[..., n * d:2 * n * d].reshape(bf, s, n, d)
        v = (qkv_flat[..., 2 * n * d:]
             + v_bias.reshape(n * d).astype(x.dtype)).reshape(bf, s, n, d)
        from jax.ad_checkpoint import checkpoint_name
        if drop == 0.0 and not self.causal:
            # layout-preserving einsum attention: stay [B, S, n, d] end to
            # end (no moveaxis copies of the big activations).  Same math
            # as mha_reference: fp32 scores/softmax (qk_float contract),
            # probs cast back before PV.  This is the short-sequence path
            # (temporal attention, s = num_frames), where flash can't win.
            scores = jnp.einsum(
                "bqnd,bknd->bnqk", q, k,
                preferred_element_type=jnp.float32) * (d ** -0.5)
            if self.block_period > 0 and s > self.block_period:
                gi = jnp.arange(s) // self.block_period
                scores = jnp.where(
                    (gi[:, None] == gi[None, :])[None, None],
                    scores, jnp.finfo(jnp.float32).min)
            p = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("bnqk,bknd->bqnd", p.astype(q.dtype), v)
            out = checkpoint_name(out, "vis_attn_out")
            out_flat = out.reshape(bf, s, n * d)
            y = _mm(out_flat,
                    proj_kernel.reshape(n * d, self.dim).astype(out.dtype))
            ld = lora_delta(lora_proj, out_flat, self.lora_rank,
                            self.lora_alpha, y.dtype)
            if ld is not None:
                y = y + ld
            y = y + proj_bias.astype(y.dtype)
            return y.reshape(lead + (s, self.dim))
        # [B, S, n, d] -> [B, n, S, d]
        q, k, v = (jnp.moveaxis(t, 2, 1) for t in (q, k, v))
        drop_rng = self.make_rng("dropout") if drop > 0.0 else None
        out = dot_product_attention(
            q, k, v, causal=self.causal, dropout_rate=drop,
            dropout_rng=drop_rng,
            use_flash=False if self.attn_impl == "xla" else None)
        out = checkpoint_name(out, "vis_attn_out")
        out = jnp.moveaxis(out, 1, 2)
        out_flat = out.reshape(bf, s, n * d)
        y = _mm(out_flat,
                proj_kernel.reshape(n * d, self.dim).astype(out.dtype))
        ld = lora_delta(lora_proj, out_flat, self.lora_rank,
                        self.lora_alpha, y.dtype)
        if ld is not None:
            y = y + ld
        y = y + proj_bias.astype(y.dtype)
        return y.reshape(lead + (s, self.dim))


class Mlp(nn.Module):
    dim: int
    hidden: int
    init_std: float = 0.015
    fc2_scale: float = 1.0
    gelu: str = "tanh"  # "tanh" (default) | "erf" (parity) | "quick"
    lora_rank: int = 0
    lora_alpha: float = 16.0

    @nn.compact
    def __call__(self, x):
        from youku_mplug_tpu.ops.lora import lora_delta, lora_pair

        fc1_kernel = self.param("fc1_kernel", _trunc_normal(self.init_std),
                                (self.dim, self.hidden))
        fc1_bias = self.param("fc1_bias", nn.initializers.zeros,
                              (self.hidden,))
        fc2_kernel = self.param(
            "fc2_kernel", _scaled_trunc_normal(self.init_std, self.fc2_scale),
            (self.hidden, self.dim))
        fc2_bias = self.param("fc2_bias", nn.initializers.zeros, (self.dim,))
        lora_fc1 = lora_pair(self, "fc1", self.lora_rank, self.dim,
                             self.hidden, init_std=self.init_std)
        lora_fc2 = lora_pair(self, "fc2", self.lora_rank, self.hidden,
                             self.dim, init_std=self.init_std)
        y = _mm(x, fc1_kernel.astype(x.dtype))
        ld = lora_delta(lora_fc1, x, self.lora_rank, self.lora_alpha,
                        y.dtype)
        if ld is not None:
            y = y + ld
        # reference is torch nn.GELU (exact erf); see VisionConfig.gelu
        # for why tanh is the TPU production default.  "quick" is CLIP's
        # x*sigmoid(1.702x) — the activation the CLIP-lineage towers
        # (mPLUG-Owl vision, hidden_act='quick_gelu') were trained with
        y = y + fc1_bias.astype(y.dtype)
        if self.gelu == "quick":
            y = y * jax.nn.sigmoid(1.702 * y)
        else:
            y = jax.nn.gelu(y, approximate=self.gelu == "tanh")
        from jax.ad_checkpoint import checkpoint_name
        y = checkpoint_name(y, "vis_fc1h")
        hidden = y
        y = _mm(y, fc2_kernel.astype(y.dtype))
        ld = lora_delta(lora_fc2, hidden, self.lora_rank, self.lora_alpha,
                        y.dtype)
        if ld is not None:
            y = y + ld
        return y + fc2_bias.astype(y.dtype)


def _split_remat_policy(remat_policy: str):
    """'sixth:names' -> ('sixth', 'names'): stride selection and the
    inner checkpoint policy for the blocks that DO remat compose."""
    if ":" in remat_policy:
        stride_key, policy_key = remat_policy.split(":", 1)
        return stride_key, policy_key
    return remat_policy, remat_policy


def _remat_policy(cfg):
    import jax

    _, key = _split_remat_policy(cfg.remat_policy)
    if key == "attn":
        return jax.checkpoint_policies.save_only_these_names(
            "vis_attn_out", "flash_lse")
    if key == "names":
        # save attention outputs + MLP hiddens: backward recompute runs
        # only the qkv projections and layernorms (~45% of block flops
        # instead of 100%), for ~230 MB/block of extra residuals
        return jax.checkpoint_policies.save_only_these_names(
            "vis_attn_out", "vis_fc1h", "flash_lse")
    if key == "namesq":
        # additionally save the qkv projections — recompute is layernorms
        # only, but the residual footprint roughly doubles vs "names"
        return jax.checkpoint_policies.save_only_these_names(
            "vis_attn_out", "vis_fc1h", "vis_qkv", "flash_lse")
    if key == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    return None


def _drop_path(x, rate, deterministic, rng):
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


class SpaceTimeBlock(nn.Module):
    """Divided space-time attention block (reference Block:211-295).

    Input x: [B, N, T, C] (n-major patch tokens); cls: [B, C].  Returns
    same.  The n-major layout is carried end-to-end through the block:
    temporal attention and the joint MLP consume it directly, only
    spatial attention transposes to per-frame order (one in / one out) —
    the time-major block I/O of a naive port costs two extra full-tensor
    transposes per block.
    """

    cfg: VisionConfig
    layer_id: int  # 1-based, for fix_init_weight scaling
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, cls, deterministic=True):
        cfg = self.cfg
        c = cfg.embed_dim
        b, n_p, t, _ = x.shape
        proj_scale = (2.0 * self.layer_id) ** 0.5

        # --- temporal attention: per patch, across frames -------------
        # Pack groups of g patches into one attention call of length g*T
        # with a period-T block-diagonal mask: identical math, but the
        # 37k tiny TxT attentions become MXU-shaped ~112x112 ones (a TxT
        # score tile wastes 15/16 of a (8,128) TPU tile).
        xt = LayerNormFP32(c, cfg.ln_eps, name="temporal_ln")(x)
        g = 1
        for cand in range(min(128 // t, n_p), 0, -1):
            if n_p % cand == 0:
                g = cand
                break
        xt = xt.reshape(b, n_p // g, g * t, c)
        temporal_fc_kernel = self.param(
            "temporal_fc_kernel",
            (nn.initializers.zeros if self.layer_id > 1
             else _trunc_normal(cfg.init_std)), (c, c))
        temporal_fc_bias = self.param(
            "temporal_fc_bias", nn.initializers.zeros, (c,))
        # fold temporal_fc into the attention's output projection —
        # (attn@proj)@tfc == attn@(proj@tfc) exactly, saving one
        # [B*N*T, C] matmul + HBM round-trip per block (LoRA's additive
        # delta would need its own @tfc, so adapters keep the two-matmul
        # form)
        fuse = cfg.lora_rank == 0
        t_attn = VisionAttention(
            c, cfg.num_heads, init_std=cfg.init_std, proj_scale=1.0,
            attn_drop=cfg.attn_drop_rate, attn_impl=cfg.attn_impl,
            block_period=t if g > 1 else 0,
            period_flash=cfg.temporal_flash,
            lora_rank=cfg.lora_rank, lora_alpha=cfg.lora_alpha,
            name="temporal_attn")
        if fuse:
            xt = t_attn(xt, deterministic,
                        post_kernel=temporal_fc_kernel,
                        post_bias=temporal_fc_bias)
            xt = xt.reshape(b, n_p, t, c)
        else:
            xt = t_attn(xt, deterministic).reshape(b, n_p, t, c)
            xt = _mm(xt, temporal_fc_kernel.astype(xt.dtype))
            xt = xt + temporal_fc_bias.astype(xt.dtype)
        xt = x + xt  # residual, [B, N, T, C]

        # --- spatial attention: per frame, cls repeated per frame -----
        xs = xt.transpose(0, 2, 1, 3)  # [B, T, N, C]
        cls_rep = jnp.broadcast_to(cls[:, None, None, :], (b, t, 1, c))
        xs = jnp.concatenate([cls_rep, xs], axis=2)  # [B, T, 1+N, C]
        xs = LayerNormFP32(c, cfg.ln_eps, name="norm1")(xs)
        xs = VisionAttention(
            c, cfg.num_heads, init_std=cfg.init_std, proj_scale=proj_scale,
            attn_drop=cfg.attn_drop_rate, attn_impl=cfg.attn_impl,
            lora_rank=cfg.lora_rank, lora_alpha=cfg.lora_alpha,
            name="attn")(xs, deterministic)
        cls_new = jnp.mean(xs[:, :, 0, :], axis=1)  # mean over frames
        xs = xs[:, :, 1:, :].transpose(0, 2, 1, 3)  # [B, N, T, C]

        # --- joint residual + MLP (token order [cls; (n t)]) ----------
        res = jnp.concatenate(
            [cls[:, None, :], xt.reshape(b, n_p * t, c)], axis=1)
        upd = jnp.concatenate(
            [cls_new[:, None, :], xs.reshape(b, n_p * t, c)], axis=1)
        if self.drop_path > 0 and not deterministic:
            upd = _drop_path(upd, self.drop_path, deterministic,
                             self.make_rng("dropout"))
        y = res + upd

        mlp_in = LayerNormFP32(c, cfg.ln_eps, name="norm2")(y)
        mlp_out = Mlp(c, int(c * cfg.mlp_ratio), init_std=cfg.init_std,
                      fc2_scale=proj_scale, gelu=cfg.gelu,
                      lora_rank=cfg.lora_rank, lora_alpha=cfg.lora_alpha,
                      name="mlp")(mlp_in)
        if self.drop_path > 0 and not deterministic:
            mlp_out = _drop_path(mlp_out, self.drop_path, deterministic,
                                 self.make_rng("dropout"))
        y = y + mlp_out

        cls_out = y[:, 0, :]
        x_out = y[:, 1:, :].reshape(b, n_p, t, c)
        return x_out, cls_out


class PatchEmbed(nn.Module):
    """Patchify as a single einsum (conv == matmul over folded patches)."""

    cfg: VisionConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        p, c_in, d = cfg.patch_size, cfg.in_chans, cfg.embed_dim
        kernel = self.param("kernel", _trunc_normal(cfg.init_std),
                            (c_in * p * p, d))
        use_bias = not cfg.clip_model  # CLIP conv1 has no bias
        bias = (self.param("bias", nn.initializers.zeros, (d,))
                if use_bias else None)
        b, c, hh, ww = x.shape
        gh, gw = hh // p, ww // p
        x = x.reshape(b, c, gh, p, gw, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, gh * gw, c * p * p)
        y = _mm(x, kernel.astype(x.dtype))
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y  # [B, N, D]


class TimeSformer(nn.Module):
    """Divided space-time video encoder (reference TimeSformer:440-592).

    forward(video [B, C, T, H, W]) -> (pooled cls [B, D],
                                       tokens [B, 1 + T*N, D]).
    """

    cfg: VisionConfig
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, video, deterministic=True):
        cfg = self.cfg
        d = cfg.embed_dim
        b, c, t, hh, ww = video.shape
        n_p = (hh // cfg.patch_size) * (ww // cfg.patch_size)

        frames = video.transpose(0, 2, 1, 3, 4).reshape(b * t, c, hh, ww)
        frames = frames.astype(self.policy.compute_dtype)
        x = PatchEmbed(cfg, name="patch_embed")(frames)  # [B*T, N, D]
        x = x.reshape(b, t * n_p, d)  # time-major token order
        if cfg.stop_grad_conv1:
            x = jax.lax.stop_gradient(x) * 0.9 + x * 0.1

        cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, d))
        pos_embed = self.param("pos_embed", _trunc_normal(cfg.init_std),
                               (1, cfg.num_patches + 1, d))
        temporal_embed = self.param(
            "temporal_embed", nn.initializers.zeros, (1, cfg.num_frames, d))

        # tile pos per frame; repeat temporal per patch; time-major order
        # (reference vision_transformer.py:559-565)
        cls_pos = pos_embed[:, :1, :]
        tile_pos = jnp.tile(pos_embed[:, 1:, :], (1, t, 1))
        tile_temp = jnp.repeat(temporal_embed[:, :t, :], n_p, axis=1)
        x = x + (tile_pos + tile_temp).astype(x.dtype)
        cls = (jnp.broadcast_to(cls_token, (b, 1, d))
               + cls_pos).astype(x.dtype)[:, 0]

        if cfg.drop_rate > 0 and not deterministic:
            x = nn.Dropout(cfg.drop_rate)(x, deterministic=False)

        if cfg.clip_model:
            # norm_pre applies to [cls; tokens] jointly in the reference
            joint = jnp.concatenate([cls[:, None], x], axis=1)
            joint = LayerNormFP32(d, cfg.ln_eps, name="norm_pre")(joint)
            cls, x = joint[:, 0], joint[:, 1:]

        # blocks carry the n-major [B, N, T, C] layout (one transpose in,
        # one out — instead of two per block)
        x = x.reshape(b, t, n_p, d).transpose(0, 2, 1, 3)
        dpr = (np.linspace(0, cfg.drop_path, cfg.depth).tolist()
               if cfg.depth > 1 else [0.0])
        remat_block = nn.remat(SpaceTimeBlock, static_argnums=(3,),
                               policy=_remat_policy(cfg))
        for i in range(cfg.depth):
            block_cls = SpaceTimeBlock
            stride_key, _ = _split_remat_policy(cfg.remat_policy)
            stride = {"half": 2, "third": 3, "sixth": 6,
                      "twelfth": 12}.get(stride_key, 1)
            skip_remat = stride > 1 and i % stride != 0
            if cfg.grad_ckpt and not skip_remat:
                block_cls = remat_block
            x, cls = block_cls(
                cfg, layer_id=i + 1, drop_path=dpr[i],
                name=f"blocks_{i}")(x, cls, deterministic)

        x = x.transpose(0, 2, 1, 3)  # back to time-major token order
        tokens = jnp.concatenate(
            [cls[:, None, :], x.reshape(b, t * n_p, d)], axis=1)
        tokens = LayerNormFP32(d, cfg.ln_eps, name="norm")(tokens)
        return tokens[:, 0], tokens


class PlainBlock(nn.Module):
    """Standard pre-LN ViT block (reference PlainBlock:298-338)."""

    cfg: VisionConfig
    layer_id: int
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.cfg
        c = cfg.embed_dim
        proj_scale = (2.0 * self.layer_id) ** 0.5
        h = LayerNormFP32(c, cfg.ln_eps, name="norm1")(x)
        h = VisionAttention(c, cfg.num_heads, init_std=cfg.init_std,
                            proj_scale=proj_scale,
                            attn_drop=cfg.attn_drop_rate,
                            attn_impl=cfg.attn_impl,
                            lora_rank=cfg.lora_rank,
                            lora_alpha=cfg.lora_alpha, name="attn")(
            h, deterministic)
        if self.drop_path > 0 and not deterministic:
            h = _drop_path(h, self.drop_path, deterministic,
                           self.make_rng("dropout"))
        x = x + h
        h = LayerNormFP32(c, cfg.ln_eps, name="norm2")(x)
        h = Mlp(c, int(c * cfg.mlp_ratio), init_std=cfg.init_std,
                fc2_scale=proj_scale, gelu=cfg.gelu,
                lora_rank=cfg.lora_rank, lora_alpha=cfg.lora_alpha,
                name="mlp")(h)
        if self.drop_path > 0 and not deterministic:
            h = _drop_path(h, self.drop_path, deterministic,
                           self.make_rng("dropout"))
        return x + h


class VisionTransformer(nn.Module):
    """Plain image ViT (reference VisionTransformer:595-716)."""

    cfg: VisionConfig
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, images, deterministic=True):
        cfg = self.cfg
        d = cfg.embed_dim
        b = images.shape[0]
        x = PatchEmbed(cfg, name="patch_embed")(
            images.astype(self.policy.compute_dtype))
        cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, d))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (b, 1, d)).astype(x.dtype), x],
            axis=1)
        if cfg.use_abs_pos_emb:
            pos_embed = self.param(
                "pos_embed", _trunc_normal(cfg.init_std),
                (1, cfg.num_patches + 1, d))
            x = x + pos_embed.astype(x.dtype)
        if cfg.clip_model:
            x = LayerNormFP32(d, cfg.ln_eps, name="norm_pre")(x)
        dpr = (np.linspace(0, cfg.drop_path, cfg.depth).tolist()
               if cfg.depth > 1 else [0.0])
        block_cls = PlainBlock
        if cfg.grad_ckpt:
            block_cls = nn.remat(PlainBlock, static_argnums=(2,),
                                 policy=_remat_policy(cfg))
        for i in range(cfg.depth):
            x = block_cls(cfg, layer_id=i + 1, drop_path=dpr[i],
                          name=f"blocks_{i}")(x, deterministic)
        x = LayerNormFP32(d, cfg.ln_eps, name="norm")(x)
        return x[:, 0], x


class AttentionPool(nn.Module):
    """Learnable-query cross-attention pooling — the visual abstractor
    (reference AttentionPool:341-374, built on torch nn.MultiheadAttention
    with add_bias_kv=True)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    ln_eps: float = 1e-6
    init_std: float = 0.015
    gelu: str = "tanh"  # "tanh" (fast, default) | "erf" (strict parity)

    @nn.compact
    def __call__(self, queries, keys, deterministic=True):
        d = self.dim
        n = self.num_heads
        hd = d // n

        q_in = LayerNormFP32(d, self.ln_eps, name="norm1")(queries)
        k_in = LayerNormFP32(d, self.ln_eps, name="normk")(keys)

        # torch MultiheadAttention: packed in-proj with bias, plus learnable
        # bias_k/bias_v appended as an extra key/value position.
        wq = self.param("q_kernel", nn.initializers.xavier_uniform(), (d, d))
        wk = self.param("k_kernel", nn.initializers.xavier_uniform(), (d, d))
        wv = self.param("v_kernel", nn.initializers.xavier_uniform(), (d, d))
        bq = self.param("q_bias", nn.initializers.zeros, (d,))
        bk = self.param("k_bias", nn.initializers.zeros, (d,))
        bv = self.param("v_bias", nn.initializers.zeros, (d,))
        bias_k = self.param("bias_k", nn.initializers.zeros, (1, 1, d))
        bias_v = self.param("bias_v", nn.initializers.zeros, (1, 1, d))
        wo = self.param("out_kernel", nn.initializers.xavier_uniform(),
                        (d, d))
        bo = self.param("out_bias", nn.initializers.zeros, (d,))

        dt = q_in.dtype
        b = q_in.shape[0]
        q = jnp.einsum("bqd,de->bqe", q_in, wq.astype(dt)) + bq.astype(dt)
        k = jnp.einsum("bkd,de->bke", k_in, wk.astype(dt)) + bk.astype(dt)
        v = jnp.einsum("bkd,de->bke", k_in, wv.astype(dt)) + bv.astype(dt)
        k = jnp.concatenate(
            [k, jnp.broadcast_to(bias_k.astype(dt), (b, 1, d))], axis=1)
        v = jnp.concatenate(
            [v, jnp.broadcast_to(bias_v.astype(dt), (b, 1, d))], axis=1)

        def split(t_):
            return t_.reshape(b, t_.shape[1], n, hd).transpose(0, 2, 1, 3)

        out = dot_product_attention(split(q), split(k), split(v))
        out = out.transpose(0, 2, 1, 3).reshape(b, q.shape[1], d)
        out = jnp.einsum("bqd,de->bqe", out, wo.astype(dt)) + bo.astype(dt)

        # NB: the residual base is the *normed* queries — the reference
        # overwrites x with norm1(x) before the residual add
        # (vision_transformer.py:369-371).
        x = q_in + out
        mlp_in = LayerNormFP32(d, self.ln_eps, name="norm2")(x)
        x = x + Mlp(d, int(d * self.mlp_ratio), init_std=self.init_std,
                    gelu=self.gelu, name="mlp")(mlp_in)
        return x


# EVA ViT-g preset (reference models/eva_vit.py create_eva_vit_g:413-427:
# plain pre-LN ViT, abs pos emb, patch 14, 1408 dim, 40 layers, 16 heads
# of dim 88, mlp_ratio 4.3637) — usable directly with VisionTransformer
# and the image-pretrain task path.
EVA_VIT_G = VisionConfig(
    img_size=224, patch_size=14, embed_dim=1408, depth=40, num_heads=16,
    mlp_ratio=4.3637, drop_path=0.4, grad_ckpt=True)

"""XCLIP / VideoFormer — CLIP visual tower with Local MHRA temporal blocks.

TPU-native re-design of the reference's alternative video encoder
(reference: models/clip_video.py — Local_MHRA:128, TemporalBlock:153,
TemporalTransformer:211, VideoFormer:237, XCLIP:319;
models/visual_transformers.py inflate_weight:122):

- patchify via (optionally temporally-downsampling) 3-D conv, expressed as
  an einsum over folded (t, p, p) patches (one MXU matmul)
- each block: Local MHRA (LN -> 1x1x1 channel-reduce conv -> depthwise
  temporal conv -> zero-init 1x1x1 expand) residual on patch tokens,
  per-frame spatial MHSA, optional second MHRA, QuickGELU FFN
- returns per-frame token features [B*T, 1+HW, W] after ln_post (the
  reference keeps frames separate; pooling is the consumer's job)
- importer: inflate CLIP 2-D conv1 + block weights into the VideoFormer
  (the reference's inflate_weight: replicate over the temporal kernel and
  divide by its size).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from youku_mplug_tpu.models.clip import (
    CLIPConfig,
    CLIPTextTower,
    _LN,
    quick_gelu,
)
from youku_mplug_tpu.ops.attention import mha_reference
from youku_mplug_tpu.runtime.precision import Policy, DEFAULT_POLICY


@dataclasses.dataclass(frozen=True)
class VideoFormerConfig:
    clip: CLIPConfig = CLIPConfig()
    num_frames: int = 8
    dw_reduction: float = 1.5
    pos_kernel_size: int = 3
    double_lmhra: bool = False
    temporal_downsampling: bool = False
    temporal_stride: int = 2


class LocalMHRA(nn.Module):
    """Depthwise temporal conv residual (reference Local_MHRA:128-151).
    Input/output: [B, T, H, W, C] (channel-last for TPU conv layouts)."""

    dim: int
    dw_reduction: float = 1.5
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        red = int(self.dim // self.dw_reduction)
        x = _LN(self.dim, name="ln")(x)
        x = nn.Dense(red, name="reduce")(x)
        # depthwise conv over T only: feature_group_count = channels
        w = self.param("dw_kernel", nn.initializers.normal(0.02),
                       (self.kernel, 1, 1, 1, red))
        x = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype),
            window_strides=(1, 1, 1),
            padding=((self.kernel // 2,) * 2, (0, 0), (0, 0)),
            dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
            feature_group_count=red)
        dw_bias = self.param("dw_bias", nn.initializers.zeros, (red,))
        x = x + dw_bias.astype(x.dtype)
        # zero-init expansion: the block starts as an identity over time
        x = nn.Dense(self.dim, kernel_init=nn.initializers.zeros,
                     name="expand")(x)
        return x


class TemporalBlock(nn.Module):
    """MHRA + per-frame spatial attention + FFN (reference
    TemporalBlock:153-209).  x: [B*T, 1+HW, C] with frame grid (h, w)."""

    cfg: VideoFormerConfig
    grid: tuple

    @nn.compact
    def __call__(self, x, t: int):
        cfg = self.cfg
        w = cfg.clip.vision_width
        heads = cfg.clip.vision_heads
        d = w // heads
        h_g, w_g = self.grid
        bt, s, _ = x.shape
        b = bt // t

        def mhra(tokens, name):
            patches = tokens[:, 1:, :].reshape(b, t, h_g, w_g, w)
            patches = patches + LocalMHRA(
                w, cfg.dw_reduction, cfg.pos_kernel_size, name=name)(patches)
            return jnp.concatenate(
                [tokens[:, :1, :], patches.reshape(bt, s - 1, w)], axis=1)

        x = mhra(x, "lmhra1")
        # spatial MHSA per frame
        h = _LN(w, name="ln_1")(x)
        qkv = nn.Dense(3 * w, name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(tn):
            return tn.reshape(bt, s, heads, d).transpose(0, 2, 1, 3)

        att = mha_reference(split(q), split(k), split(v))
        att = att.transpose(0, 2, 1, 3).reshape(bt, s, w)
        x = x + nn.Dense(w, name="out_proj")(att)
        if cfg.double_lmhra:
            x = mhra(x, "lmhra2")
        h = _LN(w, name="ln_2")(x)
        h = nn.Dense(w * 4, name="c_fc")(h)
        x = x + nn.Dense(w, name="c_proj")(quick_gelu(h))
        return x


class VideoFormer(nn.Module):
    """CLIP-style video tower (reference VideoFormer:237-316).
    video [B, 3, T, H, W] -> per-frame tokens [B*T', 1+HW, W] (ln_post'd).
    """

    cfg: VideoFormerConfig
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, video):
        cfg = self.cfg
        c = cfg.clip
        w = c.vision_width
        p = c.vision_patch_size
        b, ch, t, hh, ww = video.shape
        gh, gw = hh // p, ww // p
        x = video.astype(self.policy.compute_dtype)

        if cfg.temporal_downsampling:
            kernel = self.param(
                "conv1_3d", nn.initializers.normal(w ** -0.5),
                (3, p, p, ch, w))
            x = x.transpose(0, 2, 3, 4, 1)  # NTHWC
            x = jax.lax.conv_general_dilated(
                x, kernel.astype(x.dtype),
                window_strides=(cfg.temporal_stride, p, p),
                padding=((1, 1), (0, 0), (0, 0)),
                dimension_numbers=("NTHWC", "THWIO", "NTHWC"))
            t_out = x.shape[1]
            x = x.reshape(b * t_out, gh * gw, w)
        else:
            kernel = self.param(
                "conv1", nn.initializers.normal(w ** -0.5),
                (ch * p * p, w))
            x = x.transpose(0, 2, 1, 3, 4).reshape(b * t, ch, hh, ww)
            x = x.reshape(b * t, ch, gh, p, gw, p).transpose(
                0, 2, 4, 1, 3, 5).reshape(b * t, gh * gw, ch * p * p)
            x = x @ kernel.astype(x.dtype)
            t_out = t

        cls = self.param("class_embedding",
                         nn.initializers.normal(w ** -0.5), (w,))
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.02), (gh * gw + 1, w))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (x.shape[0], 1, w)).astype(x.dtype), x],
            axis=1)
        x = x + pos.astype(x.dtype)
        x = _LN(w, name="ln_pre")(x)
        for i in range(c.vision_layers):
            x = TemporalBlock(cfg, grid=(gh, gw), name=f"block_{i}")(
                x, t_out)
        return _LN(w, name="ln_post")(x)


class XCLIP(nn.Module):
    """VideoFormer visual tower + CLIP text tower (reference XCLIP:319)."""

    cfg: VideoFormerConfig
    policy: Policy = DEFAULT_POLICY

    def setup(self):
        self.visual = VideoFormer(self.cfg, policy=self.policy,
                                  name="visual")
        self.text = CLIPTextTower(self.cfg.clip, policy=self.policy,
                                  name="text")
        self.logit_scale = self.param(
            "logit_scale", lambda k: jnp.asarray(np.log(1 / 0.07),
                                                 jnp.float32))
        w = self.cfg.clip.vision_width
        self.proj = self.param("proj", nn.initializers.normal(w ** -0.5),
                               (w, self.cfg.clip.embed_dim))

    def encode_video(self, video):
        """-> pooled video feature [B, E]: per-frame CLS mean-pooled."""
        b = video.shape[0]
        tokens = self.visual(video)  # [B*T', 1+HW, W]
        cls = tokens[:, 0, :].reshape(b, -1, tokens.shape[-1]).mean(axis=1)
        return cls @ self.proj.astype(cls.dtype)

    def encode_text(self, text_ids):
        feat, _ = self.text(text_ids)
        return feat

    def __call__(self, video, text_ids):
        v = self.encode_video(video).astype(jnp.float32)
        tx = self.encode_text(text_ids).astype(jnp.float32)
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        tx = tx / jnp.linalg.norm(tx, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        return scale * v @ tx.T, scale * tx @ v.T


def inflate_clip_to_videoformer(clip_params: dict,
                                cfg: VideoFormerConfig) -> dict:
    """CLIP visual weights -> VideoFormer (reference inflate_weight,
    visual_transformers.py:122: replicate the 2-D conv over the temporal
    kernel dim / kernel size; transformer blocks copy 1:1; MHRA starts at
    zero so the inflated model initially computes per-frame CLIP)."""
    src = clip_params["visual"]
    out = {}
    if cfg.temporal_downsampling:
        k2d = np.asarray(src["conv1"])  # [c*p*p, w]
        p = cfg.clip.vision_patch_size
        c = 3
        k2d = k2d.reshape(c, p, p, -1)
        k3d = np.stack([k2d / 3.0] * 3)  # [3, c, p, p, w]
        out["conv1_3d"] = jnp.asarray(k3d.transpose(0, 2, 3, 1, 4))
    else:
        out["conv1"] = jnp.asarray(src["conv1"])
    for key in ("class_embedding", "positional_embedding", "ln_pre",
                "ln_post"):
        out[key] = src[key]
    for i in range(cfg.clip.vision_layers):
        blk = src[f"block_{i}"]
        out[f"block_{i}"] = {
            "ln_1": blk["ln_1"], "ln_2": blk["ln_2"],
            "in_proj": blk["in_proj"], "out_proj": blk["out_proj"],
            "c_fc": blk["c_fc"], "c_proj": blk["c_proj"],
        }
    return out

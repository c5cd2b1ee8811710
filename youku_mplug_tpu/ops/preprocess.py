"""Device-side input preprocessing.

The host pipeline ships uint8 (B, T, H, W, C) clips; this op fuses the
uint8 -> float cast, /255 scaling, CLIP-stat normalization and the
(B, C, T, H, W) layout change into the jitted step.  That replaces the
reference's host-side ClipToTensor+Normalize (reference:
dataset/video_utils/volume_transforms.py:16-39, video_transforms.py:1405)
and cuts host->device bytes 4x (uint8 vs float32) — the key lever for the
input-pipeline throughput target (BASELINE.md: >=2k clips/s/chip).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def normalize_clip(clips_u8, mean=CLIP_MEAN, std=CLIP_STD,
                   dtype=jnp.bfloat16):
    """(B, T, H, W, C) uint8 -> (B, C, T, H, W) normalized `dtype`."""
    x = clips_u8.astype(jnp.float32) / 255.0
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    x = (x - mean) / std
    x = x.transpose(0, 4, 1, 2, 3)
    return x.astype(dtype)


def normalize_images(images_u8, mean=CLIP_MEAN, std=CLIP_STD,
                     dtype=jnp.bfloat16):
    """(B, H, W, C) uint8 -> (B, C, H, W) normalized `dtype`."""
    x = images_u8.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)
    return x.transpose(0, 3, 1, 2).astype(dtype)

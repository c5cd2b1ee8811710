"""Vocab cross-entropy against a (possibly vocab-sharded) tied embedding.

TPU-native replacement for the reference's TP logits + sharded CE path
(``mpu.LinearWithGradAccumulationAndAsyncCommunication`` tied-embedding
logits + ``mpu.vocab_parallel_cross_entropy``, reference:
modeling_distributed_gpt3.py:1348-1362): under GSPMD the embedding table is
sharded on the vocab dim over the ``model`` axis, logits inherit the vocab
sharding from the einsum, and the max/logsumexp reductions over vocab become
XLA all-reduces — the hand-written two-phase collective CE disappears.

To bound HBM, ``lm_cross_entropy`` streams over sequence chunks so that only
a [B, chunk, V] logits slab is ever live (the reference materializes the full
[S, B, V] logits).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def cross_entropy_with_logits(logits: jax.Array, labels: jax.Array,
                              label_smoothing: float = 0.0) -> jax.Array:
    """Per-position CE. logits [..., V] (any float dtype), labels [...] int.

    Computed in fp32 (the reference casts logits to float before CE,
    modeling_distributed_gpt3.py:1356-1359).
    """
    logits = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(logits, axis=-1)
    label_logit = jnp.take_along_axis(
        logits, labels[..., None], axis=-1)[..., 0]
    loss = lse - label_logit
    if label_smoothing > 0.0:
        v = logits.shape[-1]
        mean_logit = jnp.mean(logits, axis=-1)
        smooth_loss = lse - mean_logit
        loss = (1.0 - label_smoothing) * loss + (
            label_smoothing * v / (v - 1)) * (smooth_loss - loss / v)
    return loss


def lm_cross_entropy(
    hidden: jax.Array,
    embedding: jax.Array,
    labels: jax.Array,
    *,
    chunk: int = 0,
    logits_spec: Optional[P] = None,
) -> jax.Array:
    """Per-position LM loss with tied-embedding logits.

    hidden: [B, S, H] last hidden states; embedding: [V, H] (vocab may be
    sharded over the model axis); labels: [B, S] already shifted by the
    caller (the reference shifts targets outside the model,
    distributed_gpt3.py:142-143).  Returns losses [B, S] fp32.

    chunk > 0 streams the sequence dim in chunks of that size so the live
    logits slab is [B, chunk, V].
    """
    b, s, h = hidden.shape

    def compute(hid, lab):
        logits = jnp.einsum(
            "bsh,vh->bsv", hid, embedding.astype(hid.dtype),
            preferred_element_type=jnp.float32)
        if logits_spec is not None:
            logits = jax.lax.with_sharding_constraint(logits, logits_spec)
        return cross_entropy_with_logits(logits, lab)

    if chunk <= 0 or s <= chunk or s % chunk != 0:
        return compute(hidden, labels)

    n = s // chunk
    hid_c = hidden.reshape(b, n, chunk, h).transpose(1, 0, 2, 3)
    lab_c = labels.reshape(b, n, chunk).transpose(1, 0, 2)
    # remat the chunk body: backward recomputes the [B, chunk, V] logits
    # slab instead of keeping every chunk's fp32 logits live as residuals
    # (saves ~n_chunks * B*chunk*V*4 bytes of HBM and the traffic to it)
    body = jax.checkpoint(lambda args: compute(*args))
    losses = jax.lax.map(body, (hid_c, lab_c))
    return losses.transpose(1, 0, 2).reshape(b, s)


def masked_mean_loss(losses: jax.Array, loss_mask: jax.Array) -> jax.Array:
    """sum(losses*mask)/sum(mask) — the reference's reduction
    (modeling_distributed_gpt3.py:1612-1617)."""
    loss_mask = loss_mask.astype(jnp.float32)
    return jnp.sum(losses * loss_mask) / jnp.maximum(jnp.sum(loss_mask), 1.0)

"""Mixture-of-Experts FFN with expert parallelism (GShard pattern).

The reference carries MoE hooks it never enables (num_experts is absent
from every shipped config); this module provides the real capability
TPU-first: top-k routing with capacity, dense dispatch/combine einsums
(compiler-friendly — no scatter), and expert-stacked weights whose
leading E dim is sharded over the ``model`` mesh axis so GSPMD inserts
the all-to-alls (the MoE layout of GShard / Switch; see
parallel/sharding.py for the rule).

Shapes: tokens [G, S, M] (G groups = batch), experts E, capacity
C = ceil(k * S * capacity_factor / E).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from youku_mplug_tpu.runtime.precision import Policy, DEFAULT_POLICY


def top_k_routing(gates: jax.Array, k: int, capacity: int
                  ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """-> (dispatch [G,S,E,C] bool, combine [G,S,E,C], aux_loss scalar).

    GShard top-k gating with capacity: for each of the k choices, tokens
    claim expert slots in sequence order (cumsum); overflow tokens get
    combine weight 0 for that choice.  aux is the load-balance loss
    (mean gate * dispatch fraction, scaled by E).
    """
    g, s, e = gates.shape
    # aux loss uses the full softmax and the top-1 assignment fraction
    top1 = jnp.argmax(gates, axis=-1)
    me = jnp.mean(gates, axis=1)                        # [G, E]
    ce = jnp.mean(jax.nn.one_hot(top1, e), axis=1)      # [G, E]
    aux = jnp.mean(jnp.sum(me * ce, axis=-1)) * e * e

    dispatch = jnp.zeros((g, s, e, capacity), bool)
    combine = jnp.zeros((g, s, e, capacity), gates.dtype)
    remaining = gates
    used = jnp.zeros((g, e), jnp.int32)  # slots consumed per expert
    for _ in range(k):
        choice = jnp.argmax(remaining, axis=-1)          # [G, S]
        onehot = jax.nn.one_hot(choice, e, dtype=jnp.int32)  # [G,S,E]
        # slot index for each token at its chosen expert
        pos_in_expert = jnp.cumsum(onehot, axis=1) - onehot  # [G,S,E]
        slot = jnp.sum(pos_in_expert * onehot, axis=-1) + \
            jnp.take_along_axis(used, choice, axis=1)        # [G,S]
        fits = slot < capacity
        gate_val = jnp.take_along_axis(remaining, choice[..., None],
                                       axis=-1)[..., 0]
        slot_oh = jax.nn.one_hot(jnp.where(fits, slot, capacity),
                                 capacity, dtype=gates.dtype)  # [G,S,C]
        sel = onehot.astype(gates.dtype)[..., None] * slot_oh[:, :, None]
        dispatch = dispatch | (sel > 0)
        combine = combine + sel * jnp.where(fits, gate_val, 0.0)[
            ..., None, None]
        used = used + jnp.sum(onehot * fits[..., None].astype(jnp.int32),
                              axis=1)
        # mask this choice out for the next round
        remaining = remaining * (1.0 - onehot.astype(gates.dtype))
    return dispatch, combine, aux


class MoEMLP(nn.Module):
    """Drop-in FFN replacement: top-k routed expert MLPs.

    Weights: router [M, E]; w1 [E, M, F]; w2 [E, F, M].  Shard the
    leading E dim over the model axis (rule: ``.*moe.*/w[12]$``).
    """

    num_experts: int
    ffn_dim: int
    k: int = 2
    capacity_factor: float = 1.25
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):  # [G, S, M]
        g, s, m = x.shape
        e, f = self.num_experts, self.ffn_dim
        capacity = max(1, int(self.k * s * self.capacity_factor / e))

        router = self.param("router", nn.initializers.normal(0.02), (m, e))
        w1 = self.param("w1", nn.initializers.normal(0.02), (e, m, f))
        b1 = self.param("b1", nn.initializers.zeros, (e, f))
        w2 = self.param("w2", nn.initializers.normal(0.02), (e, f, m))
        b2 = self.param("b2", nn.initializers.zeros, (e, m))

        gates = jax.nn.softmax(
            jnp.einsum("gsm,me->gse", x.astype(jnp.float32),
                       router.astype(jnp.float32)), axis=-1)
        dispatch, combine, aux = top_k_routing(gates, self.k, capacity)

        dt = x.dtype
        expert_in = jnp.einsum("gsec,gsm->egcm",
                               dispatch.astype(dt), x)     # [E,G,C,M]
        h = jax.nn.gelu(
            jnp.einsum("egcm,emf->egcf", expert_in, w1.astype(dt))
            + b1.astype(dt)[:, None, None])
        expert_out = jnp.einsum("egcf,efm->egcm", h, w2.astype(dt)) \
            + b2.astype(dt)[:, None, None]
        y = jnp.einsum("gsec,egcm->gsm", combine.astype(dt), expert_out)
        self.sow("intermediates", "moe_aux_loss", aux)
        return y, aux


def moe_rules():
    """Expert-parallel sharding rules (merge ahead of the catch-all):
    the leading expert dim lands on the model axis, so the dispatch/
    combine einsums become GSPMD all-to-alls."""
    from jax.sharding import PartitionSpec as P

    return (
        (r".*(moe|expert).*/w1$", P("model", None, None)),
        (r".*(moe|expert).*/w2$", P("model", None, None)),
        (r".*(moe|expert).*/b1$", P("model", None)),
        (r".*(moe|expert).*/b2$", P("model", None)),
    )

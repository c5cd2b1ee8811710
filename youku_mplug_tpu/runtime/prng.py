"""PRNG discipline.

The reference maintains deterministic-yet-decorrelated randomness across
ranks with a CUDA RNG tracker and per-rank seed offsets (reference:
initialize.py:155-169, seed + 100*pp_rank, model_parallel_cuda_manual_seed;
run_pretrain_distributed_gpt3.py:210 seed + rank).  Under jit with jax PRNG
keys, determinism is structural: a single key is folded with static integers
per subsystem / step / mesh-axis index, so the same program always draws the
same randomness regardless of device count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fold_in_axes(key: jax.Array, *axis_names: str) -> jax.Array:
    """Fold the mesh position along the given axes into a key.

    Only valid inside ``shard_map``/collective context where ``axis_index``
    is defined.  Used for per-shard dropout that must differ across the
    model axis (the analog of the reference's CUDA RNG tracker fork,
    modeling_distributed_gpt3.py:778-780).
    """
    for name in axis_names:
        key = jax.random.fold_in(key, jax.lax.axis_index(name))
    return key


def make_rngs(key: jax.Array, step: jax.Array | int, names=("dropout",)):
    """Per-step rng dict for flax ``apply(..., rngs=...)``."""
    key = jax.random.fold_in(key, jnp.asarray(step, dtype=jnp.uint32))
    keys = jax.random.split(key, len(names))
    return {name: k for name, k in zip(names, keys)}

"""Pipeline parallelism: GPipe schedule over a mesh axis.

The reference carries Megatron pipeline plumbing that its configs never
enable (pipeline_model_parallel_size is always 1); this module provides
the real capability TPU-natively.  Instead of rank-indexed send/recv
(Megatron p2p_communication), the schedule is a single SPMD program:

- layer-stacked params [L, ...] are sharded over the ``pipe`` mesh axis,
  so each device holds L/P contiguous layers (one stage);
- microbatches march through stages with ``jax.lax.ppermute`` (ICI
  neighbor exchange), one tick per microbatch-step — the GPipe schedule
  with P-1 bubble ticks on each side;
- everything lives under one ``shard_map``/jit: XLA overlaps the
  ppermute with the next tick's stage compute.

Composes with the data/model axes: the pipe axis is just another mesh
dimension, and the stage function may itself be tensor-sharded.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stage_slice_spec(mesh: Mesh, axis: str = "pipe") -> P:
    """PartitionSpec sharding the leading (layer) dim over the pipe axis."""
    return P(axis)


def gpipe(
    stage_fn: Callable[[Any, jax.Array], jax.Array],
    stage_params: Any,
    microbatches: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "pipe",
    data_axis: str | None = None,
) -> jax.Array:
    """Run ``microbatches`` [M, mb, ...] through P pipeline stages.

    stage_fn(params_local, x) applies ONE stage (its local slice of the
    layer stack) to a microbatch activation x [mb, ...] and returns the
    same shape.  ``stage_params`` leaves must have a leading dim divisible
    by P (the stacked layer axis); each device receives the [L/P, ...]
    slice for its stage.

    Returns [M, mb, ...] outputs (the full pipeline applied to every
    microbatch), replicated across the pipe axis.
    """
    n_stages = mesh.shape[axis]
    n_micro = microbatches.shape[0]
    ticks = n_micro + n_stages - 1
    ring = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def spmd(params_local, xs):
        # params_local: [L/P, ...] (this stage's layers); xs: [M, mb, ...]
        idx = jax.lax.axis_index(axis)
        state = jnp.zeros_like(xs[0])
        outs = jnp.zeros_like(xs)

        def tick(t, carry):
            state, outs = carry
            # stage 0 ingests microbatch t (clamped; masked out later)
            feed = jax.lax.dynamic_index_in_dim(
                xs, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False)
            cur = jnp.where(idx == 0, feed, state)
            y = stage_fn(params_local, cur)
            # last stage emits microbatch t-(P-1) when it's in range
            out_t = t - (n_stages - 1)
            emit = (idx == n_stages - 1) & (out_t >= 0)
            outs = jax.lax.cond(
                emit,
                lambda o: jax.lax.dynamic_update_index_in_dim(
                    o, y.astype(o.dtype), jnp.maximum(out_t, 0), 0),
                lambda o: o,
                outs)
            state = jax.lax.ppermute(y, axis, ring)
            return state, outs

        _, outs = jax.lax.fori_loop(0, ticks, tick, (state, outs))
        # replicate results from the last stage to every pipe rank so the
        # caller sees an unsharded [M, mb, ...] (loss runs everywhere)
        outs = jax.lax.psum(
            jnp.where(idx == n_stages - 1, outs, jnp.zeros_like(outs)),
            axis)
        return outs

    # compose with data parallelism: the per-microbatch batch dim (axis 1)
    # is sharded over data_axis when given; params replicate across it
    xs_spec = [None] * microbatches.ndim
    if data_axis is not None:
        xs_spec[1] = data_axis
    in_specs = (P(axis), P(*xs_spec))
    out_specs = P(*xs_spec)
    fn = jax.shard_map(spmd, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    return fn(stage_params, microbatches)


def stack_to_stages(stacked: Any, mesh: Mesh, axis: str = "pipe") -> Any:
    """device_put a [L, ...] layer-stacked param pytree with the layer dim
    sharded over the pipe axis (each device holds its stage's slice)."""
    def put(x):
        spec = [None] * x.ndim
        spec[0] = axis
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree.map(put, stacked)

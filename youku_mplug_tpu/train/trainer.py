"""Jitted train step with in-graph NaN skip and gradient accumulation.

Replaces the reference's train loop internals (reference:
run_pretrain_distributed_gpt3.py:56-197): per-step schedule application is
inside the optimizer (optim/factory.py); the NaN watchdog's "skip the
update" is done in-graph with jnp.where (the reference all_gathers the
loss, checks on host, and reloads a checkpoint — run_pretrain:117-132;
host-side rollback for persistent NaNs lives in cli/watchdog)."""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from youku_mplug_tpu.optim.factory import merge_params
from youku_mplug_tpu.train.state import TrainState


def make_train_step(loss_fn: Callable, tx,
                    update_freq: int = 1,
                    donate: bool = True):
    """loss_fn(params, batch, rng, step) -> dict with 'loss' (+ metrics).

    Returns train_step(state, batch, rng) -> (state, metrics); wrap it in
    jax.jit at the call site (sharding annotations differ per runner).

    update_freq > 1 runs gradient accumulation over the leading batch
    split (reference update_freq semantics, run_pretrain:135-147).
    """

    def compute_grads(trainable, frozen, batch, rng, step):
        def inner(trainable):
            params = merge_params(trainable, frozen)
            out = loss_fn(params, batch, rng, step)
            return out["loss"], out
        (loss, out), grads = jax.value_and_grad(inner, has_aux=True)(
            trainable)
        return loss, out, grads

    def train_step(state: TrainState, batch, rng):
        step = state.step
        if update_freq <= 1:
            loss, out, grads = compute_grads(
                state.trainable, state.frozen, batch, rng, step)
        else:
            # micro-batch accumulation: split [B, ...] leaves into
            # [update_freq, B//update_freq, ...] and scan
            def split(x):
                x = jnp.asarray(x)
                if x.shape[0] % update_freq != 0:
                    raise ValueError(
                        f"batch dim {x.shape[0]} not divisible by "
                        f"update_freq {update_freq}")
                return x.reshape(update_freq, x.shape[0] // update_freq,
                                 *x.shape[1:])

            def micro(carry, mb):
                acc, loss_sum = carry
                rng_i = jax.random.fold_in(rng, mb["_micro_index"])
                loss, out, grads = compute_grads(
                    state.trainable, state.frozen, mb, rng_i, step)
                acc = jax.tree.map(jnp.add, acc, grads)
                return (acc, loss_sum + loss), out
            zeros = jax.tree.map(jnp.zeros_like, state.trainable)
            batch = dict(jax.tree.map(split, batch),
                         _micro_index=jnp.arange(update_freq))
            (grads, loss_sum), outs = jax.lax.scan(
                micro, (zeros, jnp.float32(0)), batch)
            grads = jax.tree.map(lambda g: g / update_freq, grads)
            loss = loss_sum / update_freq
            # scalar aux metrics: average across micro-batches
            out = jax.tree.map(
                lambda x: jnp.mean(x, 0) if x.ndim == 1 else x[-1], outs)

        grad_norm = optax.global_norm(grads)
        finite = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
        safe = jax.tree.map(lambda g: jnp.where(finite, g, 0.0), grads)
        updates, new_opt = tx.update(safe, state.opt_state, state.trainable)
        new_trainable = optax.apply_updates(state.trainable, updates)
        # skip the whole update on non-finite loss/grads
        new_trainable = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old),
            new_trainable, state.trainable)
        new_opt = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old),
            new_opt, state.opt_state)

        metrics = {k: v for k, v in out.items()
                   if isinstance(v, jax.Array) and v.ndim == 0}
        metrics["grad_norm"] = grad_norm
        metrics["skipped_nonfinite"] = (~finite).astype(jnp.float32)
        new_state = state.replace(
            step=state.step + 1, trainable=new_trainable, opt_state=new_opt)
        return new_state, metrics

    return train_step

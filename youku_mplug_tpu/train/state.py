"""Train state: trainable/frozen split + optimizer state.

Unlike flax's stock TrainState, frozen params (the GPT-3 decoder; the
non-temporal ViT under freeze_vit) live in a separate subtree with no
optimizer state and no gradient computation — the structural version of
the reference's requires_grad=False freeze (distributed_gpt3.py:88-95)
that also saves 2x fp32 Adam moments on a 1.3B decoder.
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax import struct

from youku_mplug_tpu.optim.factory import (
    OptimizerConfig,
    create_optimizer,
    freeze_mask,
    merge_params,
    partition_params,
)


@struct.dataclass
class TrainState:
    step: jax.Array
    trainable: Any
    frozen: Any
    opt_state: Any

    @property
    def params(self):
        return merge_params(self.trainable, self.frozen)


def create_train_state(params, config: OptimizerConfig,
                       frozen_dtype=None):
    """-> (TrainState, tx, schedule_fn).

    frozen_dtype: cast the frozen subtree (e.g. bfloat16) — the analog of
    the reference wrapping the frozen decoder in Float16Module
    (modeling_distributed_gpt3.py:1546-1548); halves its HBM footprint
    with the same numerics contract.
    """
    import jax.numpy as jnp

    frozen_tree = freeze_mask(params, config.freeze_text_decoder,
                              config.freeze_vit)
    trainable, frozen = partition_params(params, frozen_tree)
    if frozen_dtype is not None:
        frozen = jax.tree.map(
            lambda x: x.astype(frozen_dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x, frozen)
    tx, schedule = create_optimizer(trainable, config)
    opt_state = tx.init(trainable)

    state = TrainState(step=jnp.zeros((), jnp.int32), trainable=trainable,
                       frozen=frozen, opt_state=opt_state)
    return state, tx, schedule

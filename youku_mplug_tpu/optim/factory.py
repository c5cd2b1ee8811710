"""Optimizer factory: optax AdamW with the reference's param-group policy.

Re-implements the reference's optimization semantics (reference:
optim/optim_factory.py — get_parameter_groups:219-266, create_optimizer:
293-376; utils.py cosine_scheduler:350-372) as optax masks/transforms:

- no weight decay for rank<=1 params, biases, and the model's
  no_weight_decay set (pos_embed/cls_token/temporal_embed)
- lr_scale = 0.1 for the CLIP visual backbone, temporal params excluded
  (visual_backbone_scale, optim_factory.py:240-247)
- frozen subtrees (text decoder always; non-temporal ViT when freeze_vit)
  get ``optax.set_to_zero`` via multi_transform — crucially this also
  allocates NO optimizer state for them (the TPU-side answer to "don't pay
  Adam moments for a frozen 1.3B decoder", SURVEY §7.4 hard part #8)
- per-step cosine/linear schedule with linear warmup, applied analytically
  inside jit (the reference precomputes a host-side array)
- global-norm clipping over trainable grads (reference clip_grad 3.0)

ZeRO-1 note: optimizer state sharding falls out of GSPMD — the Adam
moments inherit each param's NamedSharding, and batch-sharded grads make
XLA place the reduce + update on the data axis (the DeepSpeed ZeRO-1
equivalent with zero code).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

NO_DECAY_NAMES = ("pos_embed", "cls_token", "temporal_embed", "bias")


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """Matches the YAML ``optimizer``/``schedular`` blocks (reference
    configs/*/*.yaml)."""

    opt: str = "adamw"
    momentum: float = 0.9  # sgd/sgdp/rmsprop family only
    lr: float = 1e-4
    min_lr: float = 1e-6
    weight_decay: float = 0.05
    opt_betas: tuple = (0.9, 0.98)
    opt_eps: float = 1e-8
    clip_grad: Optional[float] = 3.0
    warmup_steps: int = -1
    warmup_epochs: float = 0.0
    epochs: int = 10
    niter_per_ep: int = 1000
    sched_type: str = "cos"
    visual_backbone_scale: bool = False
    # per-group lr multipliers by path regex — the capability of the
    # reference's create_two_optimizer split (optim_factory.py:142-217)
    lr_scale_rules: tuple = ()
    # layer-wise lr decay for ViT finetuning (reference
    # LayerDecayValueAssigner + get_num_layer_for_vit,
    # optim_factory.py:268-291): scale = decay^(L+1-layer_id)
    layer_decay: Optional[float] = None
    layer_decay_num_layers: int = 12
    freeze_text_decoder: bool = True
    freeze_vit: bool = False


def _path_of(key_path) -> str:
    return "/".join(
        str(getattr(k, "key", getattr(k, "idx", k))) for k in key_path)


def _tree_by_path(params, fn):
    return jax.tree_util.tree_map_with_path(
        lambda kp, leaf: fn(_path_of(kp), leaf), params)


def decay_mask(params):
    """True where weight decay applies."""
    def rule(path, leaf):
        if np.ndim(leaf) <= 1:
            return False
        return not any(n in path for n in NO_DECAY_NAMES)
    return _tree_by_path(params, rule)


def freeze_mask(params, freeze_text_decoder=True, freeze_vit=False):
    """True where the param is FROZEN (reference distributed_gpt3.py:88-95:
    freeze_vit spares temporal/time params)."""
    def rule(path, leaf):
        if "lora_" in path:
            # LoRA adapters train even inside a frozen subtree — the whole
            # point of rank>0 + freeze_text_decoder (models/gpt3.py)
            return False
        if freeze_text_decoder and "text_decoder" in path:
            return True
        if freeze_vit and "visual_encoder" in path and \
                "temporal" not in path and "time" not in path:
            return True
        return False
    return _tree_by_path(params, rule)


def lr_scale_tree(params, visual_backbone_scale=False, lr_scale_rules=()):
    """Static per-leaf lr multiplier: 0.1 on the non-temporal visual
    backbone when CLIP-initialized, plus arbitrary (regex, scale) rules —
    the generalization of the reference's create_two_optimizer vision/text
    lr split (optim_factory.py:142-217)."""
    def rule(path, leaf):
        for pattern, scale in lr_scale_rules:
            if re.search(pattern, path):
                return float(scale)
        if visual_backbone_scale and "visual_encoder" in path and \
                "temporal" not in path:
            return 0.1
        return 1.0
    return _tree_by_path(params, rule)


def vit_layer_id(path: str, num_max_layer: int) -> int:
    """Layer id for layer-decay scaling (reference
    get_num_layer_for_vit, optim_factory.py:268-279): embeddings/cls at 0,
    blocks_i at i+1, everything else (head etc.) at the top."""
    parts = path.split("/")
    for p in parts:
        if p in ("cls_token", "mask_token", "pos_embed", "temporal_embed",
                 "patch_embed"):
            return 0
        if p.startswith("rel_pos_bias"):
            return num_max_layer - 1
        if p.startswith("blocks_"):
            return int(p.split("_")[1]) + 1
    return num_max_layer


def layer_decay_scale_tree(params, decay: float, num_layers: int):
    """Per-leaf multiplier decay^(num_layers+1-layer_id)."""
    values = [decay ** (num_layers + 1 - i) for i in range(num_layers + 2)]

    def rule(path, leaf):
        return float(values[vit_layer_id(path, num_layers + 1)])
    return _tree_by_path(params, rule)


def cosine_schedule(base_value, final_value, epochs, niter_per_ep,
                    warmup_epochs=0.0, warmup_steps=-1,
                    start_warmup_value=0.0, sched_type="cos"):
    """Per-step schedule fn (analytic; matches the reference's precomputed
    array, utils.py:350-372)."""
    total = int(epochs * niter_per_ep)
    warmup = int(warmup_steps) if warmup_steps and warmup_steps > 0 else \
        int(warmup_epochs * niter_per_ep)
    decay_steps = max(total - warmup, 1)

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        # np.linspace(a, b, n)[i] = a + i*(b-a)/(n-1)
        warm = start_warmup_value + step * (
            (base_value - start_warmup_value) / max(warmup - 1, 1))
        i = jnp.clip(step - warmup, 0, decay_steps)
        if sched_type in ("cos", "cosine"):
            dec = final_value + 0.5 * (base_value - final_value) * (
                1 + jnp.cos(jnp.pi * i / decay_steps))
        elif sched_type == "linear":
            dec = base_value + (final_value - base_value) * (
                i / max(decay_steps - 1, 1))
        else:
            raise NotImplementedError(sched_type)
        return jnp.where(step < warmup, warm, dec)

    return fn


def _scale_by_tree(scales):
    """Multiply updates leaf-wise by a static tree of scalars."""
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        updates = jax.tree.map(lambda u, s: u * s, updates, scales)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def partition_params(params, frozen_mask):
    """Split a nested param dict into (trainable, frozen) sub-dicts.

    Frozen params get NO optimizer state at all — the explicit analog of
    the reference skipping ``requires_grad=False`` params in
    get_parameter_groups (optim_factory.py:226-227)."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params)
    flat_mask = traverse_util.flatten_dict(frozen_mask)
    train = {k: v for k, v in flat.items() if not flat_mask[k]}
    frozen = {k: v for k, v in flat.items() if flat_mask[k]}
    return (traverse_util.unflatten_dict(train),
            traverse_util.unflatten_dict(frozen))


def merge_params(trainable, frozen):
    from flax import traverse_util

    flat = dict(traverse_util.flatten_dict(trainable))
    flat.update(traverse_util.flatten_dict(frozen))
    return traverse_util.unflatten_dict(flat)


def create_optimizer(trainable_params, config: OptimizerConfig):
    """-> (optax transformation over the TRAINABLE subtree, schedule_fn).

    Chain: global-norm clip -> adam -> masked weight decay -> lr schedule
    -> per-leaf lr scale.  Callers partition frozen params out first
    (partition_params); the optimizer never sees them.
    """
    schedule = cosine_schedule(
        config.lr, config.min_lr, config.epochs, config.niter_per_ep,
        warmup_epochs=config.warmup_epochs, warmup_steps=config.warmup_steps,
        sched_type=config.sched_type)

    dmask = decay_mask(trainable_params)
    scales = lr_scale_tree(trainable_params, config.visual_backbone_scale,
                           config.lr_scale_rules)
    if config.layer_decay is not None:
        ld = layer_decay_scale_tree(trainable_params, config.layer_decay,
                                    config.layer_decay_num_layers)
        scales = jax.tree.map(lambda a, b: a * b, scales, ld)

    if config.opt.lower() not in ("adamw", "adam"):
        # timm zoo path (optim/zoo.py): split params into decay / no-decay
        # groups via multi_transform — the exact analog of the reference's
        # get_parameter_groups two-group construction
        # (optim_factory.py:219-266), trajectory-identical because every
        # zoo optimizer keeps per-tensor state
        from youku_mplug_tpu.optim import zoo

        labels = jax.tree.map(
            lambda m: "decay" if m else "nodecay", dmask)
        kw = dict(momentum=config.momentum, betas=tuple(config.opt_betas),
                  eps=config.opt_eps)
        tx = optax.multi_transform(
            {"decay": zoo.zoo_optimizer(
                config.opt, schedule,
                weight_decay=config.weight_decay, **kw),
             "nodecay": zoo.zoo_optimizer(
                 config.opt, schedule, weight_decay=0.0, **kw)},
            labels)
        tx = optax.chain(tx, _scale_by_tree(scales))
        if config.clip_grad:
            tx = optax.chain(
                optax.clip_by_global_norm(config.clip_grad), tx)
        return tx, schedule

    chain = [
        optax.scale_by_adam(b1=config.opt_betas[0], b2=config.opt_betas[1],
                            eps=config.opt_eps),
    ]
    if config.weight_decay:
        chain.append(optax.add_decayed_weights(
            config.weight_decay, mask=dmask))
    chain.append(optax.scale_by_learning_rate(schedule))
    chain.append(_scale_by_tree(scales))
    tx = optax.chain(*chain)
    if config.clip_grad:
        tx = optax.chain(optax.clip_by_global_norm(config.clip_grad), tx)
    return tx, schedule

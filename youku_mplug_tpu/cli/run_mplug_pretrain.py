"""mPLUG (BERT-fusion) pretraining runner: ITC + ITM + MLM with momentum
distillation.

Drives the legacy mPLUG family (reference: models/mplug.py mPLUG_Pretrain
+ the image-era pretrain loop pattern): the EMA twin and MoCo queues are
explicit MomentumState threaded through a custom train step; the
distillation weight follows the reference's alpha ramp
(alpha * min(1, step / steps_per_epoch)).
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from youku_mplug_tpu.cli import common
from youku_mplug_tpu.data.datasets import (
    PretrainVideoDataset,
    SyntheticVideoDataset,
)
from youku_mplug_tpu.data.loader import ShardedLoader
from youku_mplug_tpu.data.transforms import train_transform
from youku_mplug_tpu.models.bert import BertConfig
from youku_mplug_tpu.models.mplug import (
    MPLUG,
    MPLUGConfig,
    init_momentum_state,
    mlm_mask_tokens,
    update_momentum,
)
from youku_mplug_tpu.models.tokenizer import (
    BatchTokenizer,
    BertWordPieceTokenizer,
    ToyBertTokenizer,
)
from youku_mplug_tpu.ops.preprocess import normalize_clip
from youku_mplug_tpu.optim.factory import (
    OptimizerConfig,
    create_optimizer,
    freeze_mask,
    partition_params,
)
from youku_mplug_tpu.parallel.sharding import shard_params
from youku_mplug_tpu.runtime.mesh import make_mesh
from youku_mplug_tpu.runtime.precision import DEFAULT_POLICY, FP32_POLICY
from youku_mplug_tpu.train.checkpoint import CheckpointManager
from youku_mplug_tpu.train.metrics import MetricLogger
from youku_mplug_tpu.train.state import create_train_state
from youku_mplug_tpu.train.trainer import make_train_step


def build_model_cfg(cfg):
    import os

    bert_cfg_path = cfg.get("bert_config", "")
    bert = (BertConfig.from_json_file(bert_cfg_path)
            if bert_cfg_path and os.path.exists(bert_cfg_path)
            else BertConfig())
    if cfg.get("bert_overrides"):
        bert = dataclasses.replace(bert, **cfg.raw["bert_overrides"])
    return MPLUGConfig(
        vision=cfg.model.vision, bert=bert,
        embed_dim=int(cfg.get("embed_dim", 256)),
        temp=float(cfg.get("temp", 0.07)),
        queue_size=int(cfg.get("queue_size", 65536)),
        momentum=float(cfg.get("momentum", 0.995)),
        mlm_probability=float(cfg.get("mlm_probability", 0.15)),
        distill=bool(cfg.get("distill", True)))


def build_tokenizer(cfg, vocab_size):
    import os

    vocab = cfg.get("text_encoder_vocab", "")
    if vocab and os.path.exists(vocab):
        tok = BertWordPieceTokenizer(vocab)
    else:
        tok = ToyBertTokenizer(vocab_size=vocab_size)
    return BatchTokenizer(tok, max_length=cfg.max_length)


def main(args):
    import youku_mplug_tpu.config as cfgmod
    from youku_mplug_tpu.runtime.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = cfgmod.load_config(args.config)
    mcfg = build_model_cfg(cfg)
    policy = FP32_POLICY if args.fp32 else DEFAULT_POLICY
    model = MPLUG(mcfg, policy=policy)
    tokenizer = build_tokenizer(cfg, mcfg.bert.vocab_size)
    mesh = make_mesh(cfg.mesh)

    if args.synthetic_data:
        ds = SyntheticVideoDataset(length=cfg.get("synthetic_length", 32),
                                   num_frames=cfg.num_frames,
                                   size=cfg.image_res)
    else:
        ds = PretrainVideoDataset(cfg.get("train_file"),
                                  cfg.get("train_video_root"),
                                  transform=train_transform(cfg.image_res),
                                  num_frames=cfg.num_frames, seed=args.seed,
                                  **common.decode_kwargs(cfg))
    loader = ShardedLoader(ds, cfg.batch_size, shuffle=True, seed=args.seed,
                           num_workers=cfg.num_workers,
                           workers_impl=cfg.get("workers_impl", "thread"))
    niter = len(loader) if args.max_steps <= 0 else min(len(loader),
                                                        args.max_steps)
    opt_cfg = dataclasses.replace(cfg.optimizer, niter_per_ep=max(niter, 1),
                                  freeze_text_decoder=False)

    v = mcfg.vision
    dummy_v = jnp.zeros((2, 3, cfg.num_frames, v.img_size, v.img_size),
                        jnp.float32)
    dummy_i = jnp.full((2, cfg.max_length), 104, jnp.int32)
    dummy_m = jnp.ones((2, cfg.max_length), jnp.int32)
    with jax.set_mesh(mesh):
        params = model.init({"params": jax.random.key(args.seed),
                             "dropout": jax.random.key(args.seed + 1)},
                            dummy_v, dummy_i, dummy_m,
                            method=MPLUG.full_init)["params"]
        params = shard_params(params, mesh)
        state, tx, schedule = create_train_state(params, opt_cfg)
        mstate = init_momentum_state(params, mcfg.embed_dim,
                                     mcfg.queue_size)

    dtype = policy.compute_dtype
    alpha_cfg = float(cfg.get("alpha", 0.4))

    def loss_fn(p, batch, rng, step):
        video = normalize_clip(batch["video"], dtype=dtype)
        alpha = alpha_cfg * jnp.minimum(
            1.0, step.astype(jnp.float32) / max(niter, 1))
        return model.apply(
            {"params": p}, video, batch["input_ids"],
            batch["attention_mask"], batch["mlm_input_ids"],
            batch["mlm_labels"],
            feats_m=batch["feats_m"], image_queue=batch["image_queue"],
            text_queue=batch["text_queue"], alpha=alpha, rng=rng,
            deterministic=False, rngs={"dropout": rng},
            method=MPLUG.pretrain_loss)

    train_step = jax.jit(make_train_step(loss_fn, tx))

    @jax.jit
    def momentum_feats(ema_params, video, ids, mask):
        return model.apply({"params": ema_params},
                           normalize_clip(video, dtype=dtype), ids, mask,
                           method=MPLUG.momentum_features)

    ckpt = CheckpointManager(f"{args.output_dir}/checkpoints")
    rng = jax.random.key(args.seed)
    import os

    os.makedirs(args.output_dir, exist_ok=True)
    for epoch in range(cfg.epochs):
        loader.set_epoch(epoch)
        logger = MetricLogger()
        t0 = time.time()
        for it, raw in enumerate(logger.log_every(
                loader, args.log_freq, f"Epoch [{epoch}]")):
            if args.max_steps > 0 and it >= args.max_steps:
                break
            text = tokenizer(raw["text"], padding="max_length")
            step_rng = jax.random.fold_in(rng, int(state.step))
            mlm_ids, mlm_labels = mlm_mask_tokens(
                jax.random.fold_in(step_rng, 1),
                jnp.asarray(text["input_ids"]),
                jnp.asarray(text["attention_mask"]),
                mcfg.bert.vocab_size,
                mlm_probability=mcfg.mlm_probability,
                mask_token_id=getattr(tokenizer.tokenizer, "mask_id", 103))
            with jax.set_mesh(mesh):
                feats_m = momentum_feats(
                    mstate.ema_params, jnp.asarray(raw["video"]),
                    jnp.asarray(text["input_ids"]),
                    jnp.asarray(text["attention_mask"]))
                batch = {"video": jnp.asarray(raw["video"]),
                         "input_ids": jnp.asarray(text["input_ids"]),
                         "attention_mask": jnp.asarray(
                             text["attention_mask"]),
                         "mlm_input_ids": mlm_ids,
                         "mlm_labels": mlm_labels,
                         "feats_m": feats_m,
                         "image_queue": mstate.image_queue,
                         "text_queue": mstate.text_queue}
                state, metrics = train_step(state, batch, step_rng)
                mstate = update_momentum(
                    mstate, state.params, feats_m["image_feat"],
                    feats_m["text_feat"], momentum=mcfg.momentum)
            logger.update(**{k: float(v) for k, v in metrics.items()})
        ckpt.save(int(state.step), state, metadata={"epoch": epoch + 1})
        common.write_log(args, {
            "epoch": epoch,
            **{k: m.global_avg for k, m in logger.meters.items()},
            "epoch_time": time.time() - t0})
    return state, mstate


if __name__ == "__main__":
    main(common.base_parser("mPLUG BERT-fusion pretraining (TPU)"
                            ).parse_args())

"""Video-text pretraining runner (caption LM + optional contrastive).

TPU-native counterpart of the reference's run_pretrain_distributed_gpt3.py.
Launch:
    python -m youku_mplug_tpu.cli.run_pretrain --config <yaml> \
        --output_dir <dir> [--synthetic_data] [--max_steps N]
"""

from __future__ import annotations

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
from youku_mplug_tpu.models.tasks import MPLUGVideo
from youku_mplug_tpu.ops.preprocess import normalize_clip
from youku_mplug_tpu.train.trainer import make_train_step


def build_loader(args, cfg):
    if args.synthetic_data:
        ds = SyntheticVideoDataset(
            length=cfg.get("synthetic_length", 64),
            num_frames=cfg.num_frames, size=cfg.image_res)
        return ShardedLoader(ds, cfg.batch_size, shuffle=True,
                             seed=args.seed, num_workers=cfg.num_workers,
                             workers_impl=cfg.get("workers_impl", "thread"))
    groups = cfg.get("train_file_groups")
    if groups:
        # multi-source interleaving (reference create_pretrain_loader +
        # MetaLoader, dataset/__init__.py:200-228, dataloader.py:10-56)
        from youku_mplug_tpu.data.loader import MetaLoader

        loaders = []
        for g in groups:
            ds = PretrainVideoDataset(
                g, cfg.get("train_video_root"),
                transform=train_transform(cfg.image_res),
                num_frames=cfg.num_frames, seed=args.seed,
                **common.decode_kwargs(cfg))
            loaders.append(ShardedLoader(
                ds, cfg.batch_size, shuffle=True, seed=args.seed,
                num_workers=cfg.num_workers,
                workers_impl=cfg.get("workers_impl", "thread")))
        return _MetaLoaderAdapter(MetaLoader(loaders, seed=args.seed))
    ds = PretrainVideoDataset(
        cfg.get("train_file"), cfg.get("train_video_root"),
        transform=train_transform(cfg.image_res),
        num_frames=cfg.num_frames, seed=args.seed,
        **common.decode_kwargs(cfg))
    return ShardedLoader(ds, cfg.batch_size, shuffle=True, seed=args.seed,
                         num_workers=cfg.num_workers,
                         workers_impl=cfg.get("workers_impl", "thread"))


class _MetaLoaderAdapter:
    """Drop the source index MetaLoader yields (the pretrain loss is
    source-agnostic)."""

    def __init__(self, meta):
        self.meta = meta

    def set_epoch(self, epoch):
        self.meta.set_epoch(epoch)

    def __len__(self):
        return len(self.meta)

    def __iter__(self):
        for _, batch in self.meta:
            yield batch


def make_batch(runner, raw):
    text = runner.tokenizer(raw["text"], padding="max_length")
    return {"video": raw["video"], "input_ids": text["input_ids"],
            "attention_mask": text["attention_mask"]}


def make_loss_fn(runner):
    model = runner.model
    dtype = model.policy.compute_dtype

    def loss_fn(params, batch, rng, step):
        video = normalize_clip(batch["video"], dtype=dtype)
        return model.apply(
            {"params": params}, video, batch["input_ids"],
            batch["attention_mask"], deterministic=False,
            rngs={"dropout": rng}, method=MPLUGVideo.pretrain_loss)

    return loss_fn


def main(args):
    # build a loader first to know steps/epoch (the schedule needs it)
    import youku_mplug_tpu.config as cfgmod

    cfg = cfgmod.load_config(args.config)
    loader = build_loader(args, cfg)
    niter = len(loader) if args.max_steps <= 0 else min(
        len(loader), args.max_steps)
    runner = common.setup(args, niter_per_ep=niter)
    loader = build_loader(args, runner.cfg)

    loss_fn = make_loss_fn(runner)
    train_step = jax.jit(make_train_step(loss_fn, runner.tx,
                                         update_freq=runner.cfg.update_freq),
                         donate_argnums=(0,))
    rng = jax.random.key(args.seed)

    for epoch in range(runner.start_epoch, runner.cfg.epochs):
        loader.set_epoch(epoch)
        t0 = time.time()
        stats = common.train_one_epoch(
            runner, loader, make_batch, train_step, epoch,
            jax.random.fold_in(rng, epoch))
        common.save_epoch(runner, epoch)
        common.write_log(args, {"epoch": epoch, **stats,
                                "epoch_time": time.time() - t0})
    return runner


if __name__ == "__main__":
    main(common.base_parser("mPLUG-Video pretraining (TPU)").parse_args())

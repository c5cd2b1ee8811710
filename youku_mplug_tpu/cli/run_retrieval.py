"""Video-text retrieval runner (dual encoder, in-batch contrastive).

TPU-native counterpart of the reference's downstream/
run_retrieval_distributed_gpt3.py: contrastive finetune with idx-matched
soft targets; eval extracts all text/vision features, builds the full
similarity matrix and reports R@1/5/10.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from youku_mplug_tpu.cli import common
from youku_mplug_tpu.data.datasets import (
    RetrievalVideoDataset,
    SyntheticVideoDataset,
)
from youku_mplug_tpu.data.loader import ShardedLoader
from youku_mplug_tpu.data.transforms import test_transform, train_transform
from youku_mplug_tpu.evals.metrics import itm_eval
from youku_mplug_tpu.models.tasks import MPLUGVideo
from youku_mplug_tpu.ops.preprocess import normalize_clip
from youku_mplug_tpu.train.trainer import make_train_step


def build_datasets(args, cfg):
    if args.synthetic_data:
        mk = lambda: SyntheticVideoDataset(
            length=cfg.get("synthetic_length", 16),
            num_frames=cfg.num_frames, size=cfg.image_res)
        train_ds, val_ds, test_ds = mk(), mk(), mk()
        for ds in (val_ds, test_ds):
            ds.text = [f"synthetic clip {i}" for i in range(len(ds))]
            ds.vid2txt = {i: [i] for i in range(len(ds))}
            ds.txt2vid = {i: [i] for i in range(len(ds))}
        return train_ds, val_ds, test_ds
    train_ds = RetrievalVideoDataset(
        cfg.get("train_file"), cfg.get("video_root"),
        transform=train_transform(cfg.image_res),
        num_frames=cfg.num_frames, train=True, seed=args.seed,
        has_multi_vision_gt=cfg.get("has_multi_vision_gt", False),
        **common.decode_kwargs(cfg))
    val_ds = RetrievalVideoDataset(
        cfg.get("val_file"), cfg.get("video_root"),
        transform=test_transform(cfg.image_res),
        num_frames=cfg.num_frames, train=False,
        has_multi_vision_gt=cfg.get("has_multi_vision_gt", False),
        **common.decode_kwargs(cfg))
    test_ds = RetrievalVideoDataset(
        cfg.get("test_file"), cfg.get("video_root"),
        transform=test_transform(cfg.image_res),
        num_frames=cfg.num_frames, train=False,
        has_multi_vision_gt=cfg.get("has_multi_vision_gt", False),
        **common.decode_kwargs(cfg))
    return train_ds, val_ds, test_ds


def make_batch(runner, raw):
    text = runner.tokenizer(raw["text"], padding="max_length")
    return {"video": raw["video"], "input_ids": text["input_ids"],
            "attention_mask": text["attention_mask"],
            "idx": np.asarray(raw["match_id"], np.int32)}


def make_loss_fn(runner):
    model = runner.model
    dtype = model.policy.compute_dtype

    def loss_fn(params, batch, rng, step):
        video = normalize_clip(batch["video"], dtype=dtype)
        return model.apply(
            {"params": params}, video, batch["input_ids"],
            batch["attention_mask"], batch["idx"],
            deterministic=False, rngs={"dropout": rng},
            method=MPLUGVideo.retrieval_loss)
    return loss_fn


def evaluation(runner, dataset, batch_size=None):
    """Full similarity matrix from extracted features (reference
    run_retrieval evaluation:245-295)."""
    model, params, cfg = runner.model, runner.params, runner.cfg
    bs = batch_size or cfg.batch_size
    dtype = model.policy.compute_dtype

    @jax.jit
    def vis_feat(params, video):
        return model.apply({"params": params},
                           normalize_clip(video, dtype=dtype),
                           method=MPLUGVideo.extract_vision_feature)

    @jax.jit
    def txt_feat(params, ids, mask):
        return model.apply({"params": params}, ids, mask,
                           method=MPLUGVideo.extract_text_feature)

    # all text features
    tfeats = []
    for i in range(0, len(dataset.text), bs):
        chunk = dataset.text[i:i + bs]
        pad = bs - len(chunk)
        tok = runner.tokenizer(chunk + [""] * pad, padding="max_length")
        with jax.set_mesh(runner.mesh):
            f = txt_feat(params, jnp.asarray(tok["input_ids"]),
                         jnp.asarray(tok["attention_mask"]))
        tfeats.append(np.asarray(f, np.float32)[:len(chunk)])
    tfeats = np.concatenate(tfeats)

    # all vision features; decode is sharded per host (text above is
    # cheap and stays replicated) and the shards are all-gathered +
    # dedup-merged — the reference partitions the same loop with a
    # DistributedSampler and merges on rank 0 (run_retrieval:245-295).
    vfeats = []
    loader = ShardedLoader(dataset, bs, shuffle=False, drop_last=False,
                           num_workers=cfg.num_workers,
                           workers_impl=cfg.get("workers_impl", "thread"))
    order = []
    for raw in loader:
        with jax.set_mesh(runner.mesh):
            f = vis_feat(params, jnp.asarray(raw["video"]))
        vfeats.append(np.asarray(f, np.float32))
        order += list(raw["index"])
    vfeats, _ = common.gather_eval_rows(np.concatenate(vfeats),
                                        np.asarray(order))

    sims = vfeats @ tfeats.T
    res = itm_eval(sims, sims.T, dataset.txt2vid, dataset.vid2txt)
    print("* Retrieval:", res, flush=True)
    return res


def main(args):
    import youku_mplug_tpu.config as cfgmod

    cfg = cfgmod.load_config(args.config)
    train_ds, val_ds, test_ds = build_datasets(args, cfg)
    train_loader = ShardedLoader(train_ds, cfg.batch_size, shuffle=True,
                                 seed=args.seed,
                                 num_workers=cfg.num_workers,
                                 workers_impl=cfg.get("workers_impl", "thread"))
    niter = len(train_loader) if args.max_steps <= 0 else min(
        len(train_loader), args.max_steps)
    runner = common.setup(args, niter_per_ep=niter)

    if args.evaluate_only:
        res = evaluation(runner, test_ds)
        common.write_log(args, {"test": res})
        return runner

    train_step = jax.jit(make_train_step(make_loss_fn(runner), runner.tx),
                         donate_argnums=(0,))
    rng = jax.random.key(args.seed)
    for epoch in range(runner.start_epoch, runner.cfg.epochs):
        train_loader.set_epoch(epoch)
        t0 = time.time()
        stats = common.train_one_epoch(
            runner, train_loader, make_batch, train_step, epoch,
            jax.random.fold_in(rng, epoch))
        common.save_epoch(runner, epoch)
        val_res = evaluation(runner, val_ds)
        common.write_log(args, {"epoch": epoch, **stats,
                                **{f"val_{k}": v for k, v in
                                   val_res.items()},
                                "epoch_time": time.time() - t0})
    res = evaluation(runner, test_ds)
    common.write_log(args, {"test": res})
    return runner


if __name__ == "__main__":
    main(common.base_parser("video-text retrieval (TPU)").parse_args())

"""Video category prediction runner (finetune + 45-way generative eval).

TPU-native counterpart of the reference's downstream/
run_cls_distributed_gpt3.py: Chinese prompt pairs
``视频标题：{title} 视频类目：{class}``, generative per-class scoring plus
the classifier head, top-1/top-5 metrics.
"""

from __future__ import annotations

import json
import os
import time

import jax
import numpy as np

from youku_mplug_tpu.cli import common
from youku_mplug_tpu.data.datasets import (
    ClsVideoDataset,
    SyntheticVideoDataset,
)
from youku_mplug_tpu.data.loader import ShardedLoader
from youku_mplug_tpu.data.transforms import test_transform, train_transform
from youku_mplug_tpu.evals.metrics import topk_accuracy
from youku_mplug_tpu.models.tasks import MPLUGVideo
from youku_mplug_tpu.ops.preprocess import normalize_clip
from youku_mplug_tpu.train.trainer import make_train_step

PROMPT = "视频标题：{} 视频类目："


def load_classnames(cfg):
    path = cfg.get("classname_file", "classname.json")
    if os.path.exists(path):
        raw = json.load(open(path))
        if isinstance(raw, dict):
            idx2label = {int(v): k for k, v in raw.items()}
            return [idx2label[i] for i in range(len(idx2label))]
        return list(raw)
    n = cfg.get("num_classes", 45)
    return [f"类目{i}" for i in range(n)]


def build_loaders(args, cfg):
    if args.synthetic_data:
        mk = lambda train: SyntheticVideoDataset(
            length=cfg.get("synthetic_length", 32),
            num_frames=cfg.num_frames, size=cfg.image_res,
            num_classes=cfg.get("num_classes", 5))
        train_ds, val_ds, test_ds = mk(True), mk(False), mk(False)
    else:
        train_ds = ClsVideoDataset(cfg.get("train_file"),
                                   cfg.get("video_root"),
                                   transform=train_transform(cfg.image_res),
                                   num_frames=cfg.num_frames, train=True,
                                   seed=args.seed,
                                   **common.decode_kwargs(cfg))
        val_ds = ClsVideoDataset(cfg.get("val_file"), cfg.get("video_root"),
                                 transform=test_transform(cfg.image_res),
                                 num_frames=cfg.num_frames, train=False,
                                 **common.decode_kwargs(cfg))
        test_ds = ClsVideoDataset(cfg.get("test_file"),
                                  cfg.get("video_root"),
                                  transform=test_transform(cfg.image_res),
                                  num_frames=cfg.num_frames, train=False,
                                  **common.decode_kwargs(cfg))
    mk_loader = lambda ds, shuffle: ShardedLoader(
        ds, cfg.batch_size, shuffle=shuffle, seed=args.seed,
        num_workers=cfg.num_workers,
        workers_impl=cfg.get("workers_impl", "thread"))
    return mk_loader(train_ds, True), mk_loader(val_ds, False), \
        mk_loader(test_ds, False)


def make_batch_factory(classnames, max_length):
    def make_batch(runner, raw):
        titles = raw["text"]
        labels = np.asarray(raw["label"], np.int32)
        pairs = [(PROMPT.format(t[:max_length - 15]),
                  classnames[la]) for t, la in zip(titles, labels)]
        text = runner.tokenizer(pairs, padding="max_length")
        prompt = runner.tokenizer(list(titles), padding="max_length")
        return {"video": raw["video"], "input_ids": text["input_ids"],
                "attention_mask": text["attention_mask"],
                "prompt_lengths": text["prompt_lengths"],
                "prompt_ids": prompt["input_ids"],
                "prompt_mask": prompt["attention_mask"],
                "labels": labels}
    return make_batch


def make_loss_fn(runner):
    model = runner.model
    dtype = model.policy.compute_dtype

    def loss_fn(params, batch, rng, step):
        video = normalize_clip(batch["video"], dtype=dtype)
        return model.apply(
            {"params": params}, video, batch["input_ids"],
            batch["attention_mask"], batch["prompt_lengths"],
            prompt_ids=batch["prompt_ids"],
            prompt_mask=batch["prompt_mask"], labels=batch["labels"],
            deterministic=False, rngs={"dropout": rng},
            method=MPLUGVideo.cls_train_loss)
    return loss_fn


def evaluation(runner, loader, classnames):
    """45-way generative + cls-head scoring (reference run_cls:201-263)."""
    model = runner.model
    params = runner.params
    cfg = runner.cfg
    num_cls = len(classnames)
    dtype = model.policy.compute_dtype

    @jax.jit
    def score(params, video, ids, mask, plens, pids, pmask):
        v = normalize_clip(video, dtype=dtype)
        return model.apply({"params": params}, v, ids, mask, plens,
                           prompt_ids=pids, prompt_mask=pmask,
                           num_cls=num_cls,
                           method=MPLUGVideo.cls_eval_scores)

    gen_hits, cls_hits, n_total = np.zeros(2), np.zeros(2), 0
    max_length = cfg.max_length
    for it, raw in enumerate(loader):
        if runner.args.max_steps > 0 and it >= runner.args.max_steps:
            break
        titles = raw["text"]
        labels = np.asarray(raw["label"], np.int32)
        pairs = []
        for t in titles:
            for c in classnames:
                pairs.append((PROMPT.format(t[:max_length - 15]), c))
        text = runner.tokenizer(pairs, padding="max_length")
        prompt = runner.tokenizer(list(titles), padding="max_length")
        with jax.set_mesh(runner.mesh):
            out = score(params, raw["video"], text["input_ids"],
                        text["attention_mask"], text["prompt_lengths"],
                        prompt["input_ids"], prompt["attention_mask"])
        gen = np.asarray(out["generation_logits"], np.float32)
        t1, t5 = topk_accuracy(gen, labels, topk=(1, min(5, num_cls)))
        gen_hits += np.array([t1, t5]) * len(labels)
        if out["cls_logits"] is not None:
            c1, c5 = topk_accuracy(np.asarray(out["cls_logits"],
                                              np.float32),
                                   labels, topk=(1, min(5, num_cls)))
            cls_hits += np.array([c1, c5]) * len(labels)
        n_total += len(labels)

    # sum hit counters over hosts (each host scored its loader shard) —
    # the reference's dist.all_reduce on eval counters (run_cls:250-263);
    # like the reference's DistributedSampler, wrap-padding duplicates
    # count in both numerator and denominator.
    gen_hits, cls_hits, nrow = common.sum_across_hosts(
        np.stack([gen_hits, cls_hits, [n_total, n_total]]))
    n_total = nrow[0]
    res = {"gen_top1_accuracy": gen_hits[0] / max(n_total, 1),
           "gen_top5_accuracy": gen_hits[1] / max(n_total, 1)}
    if runner.cfg.model.use_cls:
        res.update(cls_top1_accuracy=cls_hits[0] / max(n_total, 1),
                   cls_top5_accuracy=cls_hits[1] / max(n_total, 1))
    print("* Generation Top-1 Accuracy "
          f"{res['gen_top1_accuracy']:.3f}", flush=True)
    return res


def main(args):
    import youku_mplug_tpu.config as cfgmod

    cfg = cfgmod.load_config(args.config)
    train_loader, val_loader, test_loader = build_loaders(args, cfg)
    niter = len(train_loader) if args.max_steps <= 0 else min(
        len(train_loader), args.max_steps)
    runner = common.setup(args, niter_per_ep=niter)
    train_loader, val_loader, test_loader = build_loaders(args, runner.cfg)
    classnames = load_classnames(runner.cfg)
    if args.synthetic_data:
        classnames = classnames[:runner.cfg.get("num_classes", 5)]

    if args.evaluate_only:
        res = evaluation(runner, test_loader, classnames)
        common.write_log(args, {"test": res})
        return runner

    make_batch = make_batch_factory(classnames, runner.cfg.max_length)
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
        val_res = evaluation(runner, val_loader, classnames)
        common.write_log(args, {"epoch": epoch, **stats,
                                **{f"val_{k}": v for k, v in
                                   val_res.items()},
                                "epoch_time": time.time() - t0})
    res = evaluation(runner, test_loader, classnames)
    common.write_log(args, {"test": res})
    return runner


if __name__ == "__main__":
    main(common.base_parser("video category prediction (TPU)").parse_args())

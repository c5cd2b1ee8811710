"""Video captioning runner (finetune + beam decode + BLEU/CIDEr/ROUGE).

TPU-native counterpart of the reference's downstream/
run_caption_distributed_gpt3.py: prompt-pair LM finetune, batched jitted
beam decode (replaces the reference's per-sample loop), Chinese
char-normalized COCO metrics from evals/metrics.py (no Java jars).
"""

from __future__ import annotations

import json
import os
import time

import jax
import numpy as np

from youku_mplug_tpu.cli import common
from youku_mplug_tpu.data.datasets import (
    CaptionVideoDataset,
    SyntheticVideoDataset,
)
from youku_mplug_tpu.data.loader import ShardedLoader
from youku_mplug_tpu.data.transforms import test_transform, train_transform
from youku_mplug_tpu.evals.metrics import caption_eval
from youku_mplug_tpu.models.generation import GenerationConfig
from youku_mplug_tpu.models.tasks import MPLUGVideo, generate_captions
from youku_mplug_tpu.ops.preprocess import normalize_clip
from youku_mplug_tpu.train.trainer import make_train_step


def build_loaders(args, cfg):
    if args.synthetic_data:
        mk = lambda: SyntheticVideoDataset(
            length=cfg.get("synthetic_length", 32),
            num_frames=cfg.num_frames, size=cfg.image_res)
        train_ds, val_ds, test_ds = mk(), mk(), mk()
    else:
        train_ds = CaptionVideoDataset(
            cfg.get("train_file"), cfg.get("video_root"),
            transform=train_transform(cfg.image_res),
            num_frames=cfg.num_frames, train=True, seed=args.seed,
            **common.decode_kwargs(cfg))
        val_ds = CaptionVideoDataset(
            cfg.get("val_file"), cfg.get("video_root"),
            transform=test_transform(cfg.image_res),
            num_frames=cfg.num_frames, train=False,
            **common.decode_kwargs(cfg))
        test_ds = CaptionVideoDataset(
            cfg.get("test_file"), cfg.get("video_root"),
            transform=test_transform(cfg.image_res),
            num_frames=cfg.num_frames, train=False,
            **common.decode_kwargs(cfg))
    mk_loader = lambda ds, sh: ShardedLoader(
        ds, cfg.batch_size, shuffle=sh, seed=args.seed,
        num_workers=cfg.num_workers,
        workers_impl=cfg.get("workers_impl", "thread"))
    return mk_loader(train_ds, True), mk_loader(val_ds, False), \
        mk_loader(test_ds, False)


def make_batch(runner, raw):
    prompt = runner.cfg.prompt
    pairs = [(prompt, t) for t in raw["text"]]
    text = runner.tokenizer(pairs, padding="max_length")
    return {"video": raw["video"], "input_ids": text["input_ids"],
            "attention_mask": text["attention_mask"],
            "prompt_lengths": text["prompt_lengths"]}


def make_loss_fn(runner):
    model = runner.model
    dtype = model.policy.compute_dtype

    def loss_fn(params, batch, rng, step):
        video = normalize_clip(batch["video"], dtype=dtype)
        return model.apply(
            {"params": params}, video, batch["input_ids"],
            batch["attention_mask"], batch["prompt_lengths"],
            deterministic=False, rngs={"dropout": rng},
            method=MPLUGVideo.caption_loss)
    return loss_fn


def evaluation(runner, loader):
    """Generate captions + COCO metrics (reference run_caption:210-300)."""
    cfg = runner.cfg
    gen_cfg = GenerationConfig(
        max_new_tokens=cfg.get("max_new_tokens",
                               cfg.model.text.tokens_to_generate),
        eos_id=runner.tokenizer.tokenizer.eos_id,
        pad_id=runner.tokenizer.tokenizer.pad_id,
        do_sample=False,
        beam_size=cfg.get("beam_size", 5))
    params = runner.params
    results = []
    for it, raw in enumerate(loader):
        if runner.args.max_steps > 0 and it >= runner.args.max_steps:
            break
        prompt_texts = [cfg.prompt] * len(raw["video"])
        text = runner.tokenizer(prompt_texts, padding="max_length",
                                max_length=20)
        import jax.numpy as jnp

        video = normalize_clip(jnp.asarray(raw["video"]),
                               dtype=runner.model.policy.compute_dtype)
        with jax.set_mesh(runner.mesh):
            out = generate_captions(
                runner.model, params, video,
                jnp.asarray(text["input_ids"]),
                jnp.asarray(text["attention_mask"]), gen_cfg)
        seqs = np.asarray(out["sequences"])
        for vid, seq, golden in zip(raw["video_id"], seqs, raw["golden"]):
            ans = runner.tokenizer.decode(seq).replace(" ", "").strip()
            if cfg.prompt:
                ans = ans.split(cfg.prompt)[-1].strip()
            results.append({"video_id": vid, "pred_caption": ans,
                            "gold_caption": list(golden)})
    # merge per-host shards so metrics cover the FULL eval set on every
    # host (reference collect_result, run_caption:210-300)
    results = common.collect_records(results, dedup_key="video_id")
    metrics = caption_eval(results)
    print("* Caption metrics:", json.dumps(metrics, ensure_ascii=False),
          flush=True)
    return metrics, results


def main(args):
    import youku_mplug_tpu.config as cfgmod

    cfg = cfgmod.load_config(args.config)
    train_loader, val_loader, test_loader = build_loaders(args, cfg)
    niter = len(train_loader) if args.max_steps <= 0 else min(
        len(train_loader), args.max_steps)
    runner = common.setup(args, niter_per_ep=niter)
    train_loader, val_loader, test_loader = build_loaders(args, runner.cfg)

    if args.evaluate_only:
        metrics, results = evaluation(runner, test_loader)
        json.dump(results, open(os.path.join(
            args.output_dir, "caption_results.json"), "w"),
            ensure_ascii=False)
        common.write_log(args, {"test": metrics})
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
        common.write_log(args, {"epoch": epoch, **stats,
                                "epoch_time": time.time() - t0})
    metrics, results = evaluation(runner, test_loader)
    json.dump(results, open(os.path.join(
        args.output_dir, "caption_results.json"), "w"), ensure_ascii=False)
    common.write_log(args, {"test": metrics})
    return runner


if __name__ == "__main__":
    main(common.base_parser("video captioning (TPU)").parse_args())

"""mPLUG (BERT-fusion) downstream runner: classification / caption /
retrieval on the legacy family.

One runner, --task {cls, caption, retrieval}, covering the capability of
the reference's mPLUG finetune paths (reference: models/mplug.py —
mPLUG_Cls:386, mPLUG_Caption:481, mPLUG_Retrieval:593; image-era runner
patterns).  Retrieval finetune uses idx-matched ITC + hard-negative ITM
(no queues for simplicity of the downstream loop — the pretrain runner
owns the momentum machinery); eval reranks the dual-encoder sim matrix
with the ITM head like the GPT-3 path.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from youku_mplug_tpu.cli import common
from youku_mplug_tpu.cli.run_mplug_pretrain import (
    build_model_cfg,
    build_tokenizer,
)
from youku_mplug_tpu.data.datasets import (
    CaptionVideoDataset,
    ClsVideoDataset,
    RetrievalVideoDataset,
    SyntheticVideoDataset,
)
from youku_mplug_tpu.data.loader import ShardedLoader
from youku_mplug_tpu.data.transforms import test_transform, train_transform
from youku_mplug_tpu.evals.metrics import (
    caption_eval,
    itm_eval,
    topk_accuracy,
)
from youku_mplug_tpu.models.mplug import MPLUG, MPLUGConfig, mplug_generate
from youku_mplug_tpu.ops.preprocess import normalize_clip
from youku_mplug_tpu.parallel.sharding import shard_params
from youku_mplug_tpu.runtime.cache import enable_compilation_cache
from youku_mplug_tpu.runtime.mesh import make_mesh
from youku_mplug_tpu.runtime.precision import DEFAULT_POLICY, FP32_POLICY
from youku_mplug_tpu.train.checkpoint import CheckpointManager
from youku_mplug_tpu.train.metrics import MetricLogger
from youku_mplug_tpu.train.state import create_train_state
from youku_mplug_tpu.train.trainer import make_train_step


def build_dataset(args, cfg, train):
    if args.synthetic_data:
        return SyntheticVideoDataset(length=cfg.get("synthetic_length", 16),
                                     num_frames=cfg.num_frames,
                                     size=cfg.image_res,
                                     num_classes=cfg.get("num_classes", 5))
    tf = train_transform(cfg.image_res) if train else \
        test_transform(cfg.image_res)
    key = "train_file" if train else "test_file"
    if args.task == "cls":
        return ClsVideoDataset(cfg.get(key), cfg.get("video_root"),
                               transform=tf, num_frames=cfg.num_frames,
                               train=train, **common.decode_kwargs(cfg))
    if args.task == "caption":
        return CaptionVideoDataset(cfg.get(key), cfg.get("video_root"),
                                   transform=tf, num_frames=cfg.num_frames,
                                   train=train,
                                   **common.decode_kwargs(cfg))
    return RetrievalVideoDataset(cfg.get(key), cfg.get("video_root"),
                                 transform=tf, num_frames=cfg.num_frames,
                                 train=train,
                                 **common.decode_kwargs(cfg))


def main(args):
    enable_compilation_cache()
    import youku_mplug_tpu.config as cfgmod

    cfg = cfgmod.load_config(args.config)
    mcfg = build_model_cfg(cfg)
    mcfg = dataclasses.replace(mcfg,
                               num_classes=int(cfg.get("num_classes", 0)))
    policy = FP32_POLICY if args.fp32 else DEFAULT_POLICY
    model = MPLUG(mcfg, policy=policy)
    tokenizer = build_tokenizer(cfg, mcfg.bert.vocab_size)
    mesh = make_mesh(cfg.mesh)
    dtype = policy.compute_dtype

    train_ds = build_dataset(args, cfg, train=True)
    test_ds = build_dataset(args, cfg, train=False)
    if args.synthetic_data and args.task == "retrieval":
        test_ds.text = [f"synthetic clip {i}" for i in range(len(test_ds))]
        test_ds.vid2txt = {i: [i] for i in range(len(test_ds))}
        test_ds.txt2vid = {i: [i] for i in range(len(test_ds))}
    loader = ShardedLoader(train_ds, cfg.batch_size, shuffle=True,
                           seed=args.seed, num_workers=cfg.num_workers,
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

    task = args.task

    def loss_fn(p, batch, rng, step):
        video = normalize_clip(batch["video"], dtype=dtype)
        if task == "cls":
            return model.apply({"params": p}, video, batch["input_ids"],
                               batch["attention_mask"],
                               labels=batch["labels"], deterministic=False,
                               rngs={"dropout": rng},
                               method=MPLUG.cls_forward)
        if task == "caption":
            return model.apply({"params": p}, video, batch["input_ids"],
                               batch["attention_mask"],
                               pad_id=tokenizer.tokenizer.pad_id,
                               deterministic=False, rngs={"dropout": rng},
                               method=MPLUG.caption_loss)
        return model.apply({"params": p}, video, batch["input_ids"],
                           batch["attention_mask"], batch["idx"],
                           rng=rng, deterministic=False,
                           rngs={"dropout": rng},
                           method=MPLUG.retrieval_loss)

    def make_batch(raw):
        tok = tokenizer(raw["text"], padding="max_length")
        batch = {"video": jnp.asarray(raw["video"]),
                 "input_ids": jnp.asarray(tok["input_ids"]),
                 "attention_mask": jnp.asarray(tok["attention_mask"])}
        if task == "cls":
            batch["labels"] = jnp.asarray(raw["label"])
        if task == "retrieval":
            batch["idx"] = jnp.asarray(raw["match_id"])
        return batch

    train_step = jax.jit(make_train_step(loss_fn, tx))
    ckpt = CheckpointManager(os.path.join(args.output_dir, "checkpoints"))
    os.makedirs(args.output_dir, exist_ok=True)
    rng = jax.random.key(args.seed)

    # restore: --resume <dir> beats this run's own checkpoints; loud
    # failure when --evaluate_only finds nothing to score.
    ckpt_src = ckpt
    if args.resume and os.path.abspath(args.resume) != os.path.abspath(
            args.output_dir):
        src = os.path.join(args.resume, "checkpoints")
        ckpt_src = CheckpointManager(
            src if os.path.isdir(src) else args.resume)
    step = ckpt_src.latest_step()
    if (args.resume or args.evaluate_only) and step is None:
        raise FileNotFoundError(
            f"--resume/--evaluate_only set but no checkpoint under "
            f"{ckpt_src.directory}")
    if step is not None:
        with jax.set_mesh(mesh):
            state = common.restore_with_resize(ckpt_src, step, state, mesh)
        print(f"resumed from step {step}", flush=True)

    if not args.evaluate_only:
        for epoch in range(cfg.epochs):
            loader.set_epoch(epoch)
            logger = MetricLogger()
            t0 = time.time()
            for it, raw in enumerate(logger.log_every(
                    loader, args.log_freq, f"Epoch [{epoch}]")):
                if args.max_steps > 0 and it >= args.max_steps:
                    break
                with jax.set_mesh(mesh):
                    state, metrics = train_step(
                        state, make_batch(raw),
                        jax.random.fold_in(rng, int(state.step)))
                logger.update(**{k: float(x) for k, x in metrics.items()})
            ckpt.save(int(state.step), state, metadata={"epoch": epoch + 1})
            common.write_log(args, {
                "epoch": epoch,
                **{k: m.global_avg for k, m in logger.meters.items()},
                "epoch_time": time.time() - t0})

    # ---- evaluation -----------------------------------------------------
    params = state.params
    test_loader = ShardedLoader(test_ds, cfg.batch_size, shuffle=False,
                                drop_last=False,
                                num_workers=cfg.num_workers,
                                process_index=0, process_count=1)
    result = {}
    if task == "cls":
        @jax.jit
        def score(p, video, ids, mask):
            return model.apply({"params": p},
                               normalize_clip(video, dtype=dtype), ids,
                               mask, method=MPLUG.cls_forward)["logits"]

        hits = np.zeros(2)
        n = 0
        for it, raw in enumerate(test_loader):
            if args.max_steps > 0 and it >= args.max_steps:
                break
            tok = tokenizer(raw["text"], padding="max_length")
            with jax.set_mesh(mesh):
                logits = score(params, jnp.asarray(raw["video"]),
                               jnp.asarray(tok["input_ids"]),
                               jnp.asarray(tok["attention_mask"]))
            labels = np.asarray(raw["label"])
            k = min(5, mcfg.num_classes)
            t1, t5 = topk_accuracy(np.asarray(logits, np.float32), labels,
                                   topk=(1, k))
            hits += np.array([t1, t5]) * len(labels)
            n += len(labels)
        result = {"top1": hits[0] / max(n, 1), "top5": hits[1] / max(n, 1)}
    elif task == "caption":
        results = []
        for it, raw in enumerate(test_loader):
            if args.max_steps > 0 and it >= args.max_steps:
                break
            video = normalize_clip(jnp.asarray(raw["video"]), dtype=dtype)
            with jax.set_mesh(mesh):
                seqs = mplug_generate(
                    model, params, video,
                    bos_id=tokenizer.tokenizer.bos_id,
                    eos_id=tokenizer.tokenizer.eos_id,
                    max_new_tokens=cfg.get("max_new_tokens", 20),
                    beam_size=int(cfg.get("beam_size", 1)),
                    min_length=int(cfg.get("min_length", 0)))
            for vid, seq, golden in zip(raw["video_id"], np.asarray(seqs),
                                        raw["golden"]):
                ans = tokenizer.decode(seq).replace(" ", "").strip()
                results.append({"video_id": vid, "pred_caption": ans,
                                "gold_caption": list(golden)})
        result = caption_eval(results)
    else:  # retrieval: dual-encoder sim matrix from pooled CLS features
        @jax.jit
        def feats(p, video, ids, mask):
            img = model.apply({"params": p},
                              normalize_clip(video, dtype=dtype),
                              method=MPLUG.encode_image)
            vf = model.apply({"params": p}, img[:, 0].astype(jnp.float32),
                             method=lambda m, x: m.vision_proj(x))
            txt = model.apply({"params": p}, ids, mask,
                              method=MPLUG.encode_text)
            tf_ = model.apply({"params": p},
                              txt[:, 0].astype(jnp.float32),
                              method=lambda m, x: m.text_proj(x))
            vf = vf / jnp.linalg.norm(vf, axis=-1, keepdims=True)
            tf_ = tf_ / jnp.linalg.norm(tf_, axis=-1, keepdims=True)
            return vf, tf_

        vfeats, order = [], []
        tfeats = []
        for raw in test_loader:
            tok = tokenizer(raw["text"], padding="max_length")
            with jax.set_mesh(mesh):
                vf, tf_ = feats(params, jnp.asarray(raw["video"]),
                                jnp.asarray(tok["input_ids"]),
                                jnp.asarray(tok["attention_mask"]))
            vfeats.append(np.asarray(vf, np.float32))
            tfeats.append(np.asarray(tf_, np.float32))
            order += list(raw["index"])
        perm = np.argsort(np.asarray(order))
        vfeats = np.concatenate(vfeats)[perm]
        tfeats = np.concatenate(tfeats)[perm]
        sims = vfeats @ tfeats.T
        result = itm_eval(sims, sims.T, test_ds.txt2vid, test_ds.vid2txt)

    print(f"* mPLUG {task} eval:", json.dumps(result, ensure_ascii=False),
          flush=True)
    common.write_log(args, {"test": result})
    return state, result


def parser():
    p = common.base_parser("mPLUG BERT-fusion downstream (TPU)")
    p.add_argument("--task", choices=("cls", "caption", "retrieval"),
                   default="cls")
    return p


if __name__ == "__main__":
    main(parser().parse_args())

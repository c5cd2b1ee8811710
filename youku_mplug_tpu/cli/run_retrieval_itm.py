"""Generative ITM rerank retrieval runner.

TPU-native counterpart of the reference's downstream/
run_retrieval_distributed_gpt3_itm.py: derangement-based negatives (applied
twice), prompt ``标题：{t} 这个视频与标题匹配吗？`` -> 是/否, generative match
score + binary cls head; eval scores the full V x T matrix block-wise.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from youku_mplug_tpu.cli import common
from youku_mplug_tpu.cli.run_retrieval import build_datasets
from youku_mplug_tpu.data.loader import ShardedLoader
from youku_mplug_tpu.evals.metrics import itm_eval
from youku_mplug_tpu.models.tasks import MPLUGVideo
from youku_mplug_tpu.ops.preprocess import normalize_clip
from youku_mplug_tpu.train.trainer import make_train_step

PROMPT = "标题：{} 这个视频与标题匹配吗？"
YES, NO = "是", "否"


def random_derangement(n: int, rng: np.random.Generator) -> np.ndarray:
    """Permutation with no fixed point (reference run_retrieval_itm:42)."""
    if n == 1:
        return np.zeros(1, np.int64)
    while True:
        p = rng.permutation(n)
        if not np.any(p == np.arange(n)):
            return p


def make_batch(runner, raw):
    rng = np.random.default_rng(int(np.sum(raw["index"])))
    text = list(raw["text"])
    idx = np.asarray(raw["match_id"])
    b = len(text)
    neg = np.concatenate([random_derangement(b, rng),
                          random_derangement(b, rng)])
    neg_labels = (idx[np.arange(2 * b) % b] == idx[neg]).astype(np.int32)
    labels = np.concatenate([np.ones(b, np.int32), neg_labels])
    text_all = text + [text[i] for i in neg]

    max_length = runner.cfg.max_length
    label_text = [YES if la else NO for la in labels]
    pairs = [(PROMPT.format(t[:max_length - 20]), y)
             for t, y in zip(text_all, label_text)]
    tok = runner.tokenizer(pairs, padding="max_length")
    prompt_tok = runner.tokenizer(text_all, padding="max_length")
    return {"video": raw["video"], "input_ids": tok["input_ids"],
            "attention_mask": tok["attention_mask"],
            "prompt_lengths": tok["prompt_lengths"],
            "prompt_ids": prompt_tok["input_ids"],
            "prompt_mask": prompt_tok["attention_mask"],
            "negative_indices": neg.astype(np.int32),
            "labels": labels}


def make_loss_fn(runner):
    model = runner.model
    dtype = model.policy.compute_dtype

    def loss_fn(params, batch, rng, step):
        video = normalize_clip(batch["video"], dtype=dtype)
        return model.apply(
            {"params": params}, video, batch["input_ids"],
            batch["attention_mask"], batch["prompt_lengths"],
            batch["negative_indices"],
            prompt_ids=batch["prompt_ids"],
            prompt_mask=batch["prompt_mask"], labels=batch["labels"],
            deterministic=False, rngs={"dropout": rng},
            method=MPLUGVideo.itm_train_loss)
    return loss_fn


def evaluation(runner, dataset, text_bs: int = 8):
    """V x T generative + cls match matrix (reference run_retrieval_itm
    evaluation:229-294), computed block-wise in one program."""
    model, params, cfg = runner.model, runner.params, runner.cfg
    dtype = model.policy.compute_dtype
    texts = dataset.text
    num_text = len(texts)
    max_length = cfg.max_length

    @jax.jit
    def score(params, video, ids, mask, plens, pids, pmask):
        v = normalize_clip(video, dtype=dtype)
        return model.apply({"params": params}, v, ids, mask, plens,
                           prompt_ids=pids, prompt_mask=pmask,
                           num_text=text_bs,
                           method=MPLUGVideo.itm_eval_scores)

    # shard VIDEO rows across hosts; rows are merged afterwards — the
    # analog of the reference partitioning the V x T matrix across ranks
    # (run_retrieval_itm:279-281)
    vb = cfg.get("eval_video_batch", 4)
    loader = ShardedLoader(dataset, vb, shuffle=False, drop_last=False,
                           num_workers=cfg.num_workers,
                           workers_impl=cfg.get("workers_impl", "thread"))
    gen_rows, cls_rows, order = [], [], []
    for raw in loader:
        nv = len(raw["video"])
        gen_cols, cls_cols = [], []
        for i in range(0, num_text, text_bs):
            chunk = texts[i:i + text_bs]
            pad = text_bs - len(chunk)
            chunk = chunk + [""] * pad
            pairs, prompts = [], []
            for _ in range(nv):
                pairs += [(PROMPT.format(t[:max_length - 20]), YES)
                          for t in chunk]
                prompts += chunk
            tok = runner.tokenizer(pairs, padding="max_length")
            ptok = runner.tokenizer(prompts, padding="max_length")
            with jax.set_mesh(runner.mesh):
                out = score(params, jnp.asarray(raw["video"]),
                            jnp.asarray(tok["input_ids"]),
                            jnp.asarray(tok["attention_mask"]),
                            jnp.asarray(tok["prompt_lengths"]),
                            jnp.asarray(ptok["input_ids"]),
                            jnp.asarray(ptok["attention_mask"]))
            gen_cols.append(np.asarray(out["generation_logits"],
                                       np.float32)[:, :text_bs - pad])
            if out["cls_logits"] is not None:
                cls_cols.append(np.asarray(out["cls_logits"],
                                           np.float32)[:, :text_bs - pad])
        gen_rows.append(np.concatenate(gen_cols, axis=1))
        if cls_cols:
            cls_rows.append(np.concatenate(cls_cols, axis=1))
        order += list(raw["index"])
    gen, _ = common.gather_eval_rows(np.concatenate(gen_rows),
                                     np.asarray(order))
    res = {"gen_" + k: v for k, v in itm_eval(
        gen, gen.T, dataset.txt2vid, dataset.vid2txt).items()}
    if cls_rows:
        cls, _ = common.gather_eval_rows(np.concatenate(cls_rows),
                                         np.asarray(order))
        res.update({"cls_" + k: v for k, v in itm_eval(
            cls, cls.T, dataset.txt2vid, dataset.vid2txt).items()})
    print("* ITM retrieval:", res, flush=True)
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
        common.write_log(args, {"epoch": epoch, **stats,
                                "epoch_time": time.time() - t0})
    res = evaluation(runner, test_ds)
    common.write_log(args, {"test": res})
    return runner


if __name__ == "__main__":
    main(common.base_parser("ITM rerank retrieval (TPU)").parse_args())

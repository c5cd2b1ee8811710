"""Shared runner infrastructure: setup, epoch loop, watchdog, checkpoints.

The TPU-native counterpart of the reference's per-runner main()/
train_one_epoch() boilerplate (reference: run_pretrain_distributed_gpt3.py:
56-350 and the downstream/ runners): one mesh + sharded params + jitted
step instead of torch.distributed.launch + DeepSpeed engine.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from youku_mplug_tpu.config import RunConfig, dump_config, load_config
from youku_mplug_tpu.models.tasks import MPLUGVideo
from youku_mplug_tpu.models.tokenizer import (
    BatchTokenizer,
    JiebaBPETokenizer,
    ToyTokenizer,
)
from youku_mplug_tpu.optim.factory import merge_params
from youku_mplug_tpu.parallel.sharding import (
    GPT3_SHARDING_RULES,
    data_sharding,
    shard_params,
)
from youku_mplug_tpu.runtime.mesh import make_mesh
from youku_mplug_tpu.runtime.precision import DEFAULT_POLICY, FP32_POLICY
from youku_mplug_tpu.train.checkpoint import CheckpointManager
from youku_mplug_tpu.train.metrics import MetricLogger, TensorboardLogger
from youku_mplug_tpu.train.state import TrainState, create_train_state
from youku_mplug_tpu.train.trainer import make_train_step


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--config", required=True)
    p.add_argument("--output_dir", default="./output")
    p.add_argument("--resume", default="", help="checkpoint dir to resume")
    p.add_argument("--evaluate_only", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--fp32", action="store_true",
                   help="full fp32 (CPU tests)")
    p.add_argument("--max_steps", type=int, default=-1,
                   help="cap steps per epoch (smoke tests)")
    p.add_argument("--synthetic_data", action="store_true",
                   help="procedural videos instead of files")
    p.add_argument("--save_ckpt_freq", type=int, default=1)
    p.add_argument("--auto_resume_iter", action="store_true", default=True)
    p.add_argument("--log_freq", type=int, default=10)
    p.add_argument("--profile_dir", default="",
                   help="dump a jax.profiler trace of steps 5-10 here "
                        "(reference: DeepSpeed flops profiler, "
                        "utils.py:516-522)")
    return p


def decode_kwargs(cfg) -> dict:
    """Shared decode-time options for every file-backed video dataset.

    ``decode_short_side`` (YAML, default 0=off): aspect-preserving
    decode-time sws-scale — at production resolutions (>=360p) the host
    transforms then run on ~short_side-px frames instead of source-res
    ones, which is worth 2-4x input-pipeline throughput.  288 is a safe
    value for 224px crops (RandomResizedCrop scale>=0.5 keeps crops
    mostly at/above target res).
    """
    return {"decode_short_side": int(cfg.get("decode_short_side", 0))}


@dataclasses.dataclass
class Runner:
    args: Any
    cfg: RunConfig
    mesh: Any
    model: MPLUGVideo
    tokenizer: BatchTokenizer
    state: TrainState
    tx: Any
    schedule: Callable
    ckpt: CheckpointManager
    tb: TensorboardLogger
    start_epoch: int = 0

    @property
    def params(self):
        return merge_params(self.state.trainable, self.state.frozen)


def build_tokenizer(cfg: RunConfig) -> BatchTokenizer:
    model_dir = cfg.get("text_decoder", "")
    tok_json = os.path.join(model_dir or "", "tokenizer.json")
    if model_dir and os.path.exists(tok_json):
        tok = JiebaBPETokenizer(tok_json)
    else:
        tok = ToyTokenizer(vocab_size=cfg.model.text.vocab_size)
    return BatchTokenizer(tok, max_length=cfg.max_length)


def setup(args, niter_per_ep: int = 1000) -> Runner:
    from youku_mplug_tpu.runtime.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = load_config(args.config)
    cfg.optimizer = dataclasses.replace(cfg.optimizer,
                                        niter_per_ep=max(niter_per_ep, 1))
    policy = FP32_POLICY if getattr(args, "fp32", False) else DEFAULT_POLICY
    mesh = make_mesh(cfg.mesh)
    model = MPLUGVideo(cfg.model, policy=policy)
    tokenizer = build_tokenizer(cfg)

    rng = jax.random.key(args.seed)
    v = cfg.model.vision
    dummy_video = jnp.zeros((2, 3, cfg.num_frames, v.img_size, v.img_size),
                            jnp.float32)
    dummy_ids = jnp.zeros((2, cfg.max_length), jnp.int32)
    dummy_mask = jnp.ones((2, cfg.max_length), jnp.int32)
    with jax.set_mesh(mesh):
        params = model.init(rng, dummy_video, dummy_ids, dummy_mask,
                            method=MPLUGVideo.full_init)["params"]
        params = shard_params(params, mesh, GPT3_SHARDING_RULES)

        # torch checkpoint import (ModelScope GPT-3 / timm / CLIP weights)
        importer_src = cfg.get("import_torch_weights")
        if importer_src:
            from youku_mplug_tpu.models.importers import import_all

            params = import_all(params, cfg, importer_src)
            params = shard_params(params, mesh, GPT3_SHARDING_RULES)

        frozen_dtype = (None if getattr(args, "fp32", False)
                        else policy.compute_dtype)
        state, tx, schedule = create_train_state(
            params, cfg.optimizer, frozen_dtype=frozen_dtype)

    is_main = jax.process_index() == 0
    os.makedirs(args.output_dir, exist_ok=True)
    if is_main:
        dump_config(cfg, args.output_dir)
    ckpt = CheckpointManager(
        os.path.join(args.output_dir, "checkpoints"),
        async_save=bool(cfg.get("async_checkpointing", False)))
    tb = TensorboardLogger(os.path.join(args.output_dir, "tb"),
                           enabled=is_main)

    state, start_epoch = resume_state(args, ckpt, state, mesh)

    return Runner(args=args, cfg=cfg, mesh=mesh, model=model,
                  tokenizer=tokenizer, state=state, tx=tx,
                  schedule=schedule, ckpt=ckpt, tb=tb,
                  start_epoch=start_epoch)


def resume_state(args, ckpt: CheckpointManager, state, mesh):
    """Shared resume wiring for every training entry point.

    --resume <dir> names an external run directory (reference --resume,
    run_cls_distributed_gpt3.py:317-340); without it, auto-resume from
    this run's own checkpoints.  A --resume/--evaluate_only pointing at
    a directory with no checkpoint raises instead of silently training
    from scratch.  Returns (state, start_epoch)."""
    start_epoch = 0
    ckpt_src = ckpt
    if args.resume and os.path.abspath(args.resume) != os.path.abspath(
            args.output_dir):
        src_dir = os.path.join(args.resume, "checkpoints")
        if not os.path.isdir(src_dir):
            src_dir = args.resume  # already a checkpoints dir
        ckpt_src = CheckpointManager(src_dir)
    step = ckpt_src.latest_step()
    if (args.resume or getattr(args, "evaluate_only", False)) \
            and step is None:
        raise FileNotFoundError(
            f"--resume/--evaluate_only set but no checkpoint found under "
            f"{ckpt_src.directory}")
    if step is not None:
        with jax.set_mesh(mesh):
            state = restore_with_resize(ckpt_src, step, state, mesh)
        meta = ckpt_src.restore_metadata(step) or {}
        start_epoch = int(meta.get("epoch", 0))
        print(f"resumed from step {step} (epoch {start_epoch})",
              flush=True)
    return state, start_epoch


def _resize_param_tree(raw: dict, tmpl: dict, path: str = "") -> dict:
    """Adapt a raw checkpoint param subtree to the template's shapes.

    Vision pos/temporal embeds are interpolated when the resume config
    uses a different resolution or frame count than the checkpoint
    (reference: run_cls_distributed_gpt3.py:332-340 bicubic pos-embed +
    linear temporal-embed interpolation). Any other mismatch is an error.
    """
    from youku_mplug_tpu.models.importers import (
        resize_pos_embed,
        resize_temporal_embed,
    )

    out = {}
    for k, v in raw.items():
        t = tmpl[k]
        if isinstance(v, dict):
            out[k] = _resize_param_tree(v, t, path + k + "/")
            continue
        v = np.asarray(v)
        if v.shape != t.shape:
            if k == "pos_embed":
                v = resize_pos_embed(v, int(t.shape[1]) - 1)
            elif k == "temporal_embed":
                v = resize_temporal_embed(v, int(t.shape[1]))
            else:
                raise ValueError(
                    f"checkpoint/model shape mismatch at {path + k}: "
                    f"{v.shape} vs {t.shape}")
            print(f"resume: interpolated {path + k} -> {v.shape}",
                  flush=True)
        out[k] = jax.device_put(v.astype(t.dtype), t.sharding)
    return out


def restore_with_resize(ckpt: CheckpointManager, step: int,
                        state: TrainState, mesh) -> TrainState:
    """Exact restore, falling back to vision-embed interpolation.

    The fallback matches the reference's finetune-from-pretrain semantics
    (run_cls_distributed_gpt3.py:317-340): model weights are loaded with
    pos/temporal embeds interpolated to the new shapes; optimizer state
    starts fresh.
    """
    try:
        return ckpt.restore(step, state)
    except Exception as exact_err:
        try:
            raw = ckpt.restore_raw(step)
            trainable = _resize_param_tree(raw["trainable"],
                                           state.trainable)
            frozen = _resize_param_tree(raw["frozen"], state.frozen)
        except Exception:
            raise exact_err
        print("resume: checkpoint shapes differ from config — vision "
              "embeds interpolated, optimizer state reset", flush=True)
        return state.replace(trainable=trainable, frozen=frozen)


def gather_eval_rows(rows: np.ndarray, order: np.ndarray):
    """Merge per-host evaluation shards (the analog of the reference's
    rank-partitioned eval + all_reduce merge, run_retrieval_itm:279-281 /
    collect_result): all-gather (rows, order) across processes and keep
    the first occurrence of each sample index (the loader wrap-pads, so
    duplicates are expected).  Single-process: dedup only."""
    rows = np.asarray(rows)
    order = np.asarray(order)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        rows = np.asarray(multihost_utils.process_allgather(
            jnp.asarray(rows))).reshape(-1, *rows.shape[1:])
        order = np.asarray(multihost_utils.process_allgather(
            jnp.asarray(order))).reshape(-1)
    _, first = np.unique(order, return_index=True)
    keep = np.sort(first)
    rows, order = rows[keep], order[keep]
    perm = np.argsort(order)
    return rows[perm], order[perm]


def sum_across_hosts(vec: np.ndarray) -> np.ndarray:
    """Sum a small metric vector over processes (the reference's
    ``dist.all_reduce`` on eval counters, run_cls:250-263).  Identity in
    single-process runs."""
    vec = np.asarray(vec)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        gathered = np.asarray(multihost_utils.process_allgather(
            jnp.asarray(vec)))
        vec = gathered.reshape(jax.process_count(), *vec.shape).sum(axis=0)
    return vec


def collect_records(records, dedup_key=None):
    """Merge per-host lists of JSON-serializable eval records (captions,
    QA answers) — the analog of the reference's ``collect_result``
    (dataset/utils.py:80-160), which writes per-rank JSON files and merges
    on rank 0.  Here the shards ride the ICI instead of a shared
    filesystem: each process all-gathers its UTF-8-encoded JSON payload as
    a padded uint8 array, so every host returns the SAME merged list (no
    rank-0 special case).  ``dedup_key`` drops wrap-padding duplicates
    from ShardedLoader, keeping the first occurrence."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        payload = np.frombuffer(
            json.dumps(records, ensure_ascii=False).encode("utf-8"),
            dtype=np.uint8)
        lens = np.asarray(multihost_utils.process_allgather(
            jnp.asarray(np.array([payload.size], np.int32)))).reshape(-1)
        buf = np.zeros(int(lens.max()), np.uint8)
        buf[:payload.size] = payload
        bufs = np.asarray(multihost_utils.process_allgather(
            jnp.asarray(buf))).reshape(jax.process_count(), -1)
        records = []
        for row, n in zip(bufs, lens):
            records += json.loads(bytes(row[:int(n)]).decode("utf-8"))
    if dedup_key is not None:
        seen, out = set(), []
        for r in records:
            k = r[dedup_key]
            if k not in seen:
                seen.add(k)
                out.append(r)
        records = out
    return records


def put_batch(mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """device_put array fields with batch sharding over the data axis."""
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.dtype != object:
            out[k] = jax.device_put(v, data_sharding(mesh))
        else:
            out[k] = v
    return out


def train_one_epoch(runner: Runner, loader, make_batch: Callable,
                    train_step, epoch: int, rng) -> Dict[str, float]:
    """Generic epoch loop: tokenize on host, shard to device, step, log,
    rolling iteration checkpoints + NaN-rollback watchdog (reference
    run_pretrain:56-197)."""
    args = runner.args
    logger = MetricLogger()
    nan_streak = 0
    t_step = time.time()
    profiling = False
    for it, raw in enumerate(logger.log_every(
            loader, args.log_freq, f"Epoch [{epoch}]")):
        if args.max_steps > 0 and it >= args.max_steps:
            break
        if getattr(args, "profile_dir", "") and epoch == runner.start_epoch:
            if it == 5 and not profiling:
                jax.profiler.start_trace(args.profile_dir)
                profiling = True
            elif it == 10 and profiling:
                jax.profiler.stop_trace()
                profiling = False
        batch = make_batch(runner, raw)
        batch = put_batch(runner.mesh, batch)
        step_rng = jax.random.fold_in(rng, int(runner.state.step))
        with jax.set_mesh(runner.mesh):
            runner.state, metrics = train_step(runner.state, batch,
                                               step_rng)
        metrics = {k: float(v) for k, v in metrics.items()}
        lr = float(runner.schedule(int(runner.state.step)))
        logger.update(lr=lr, **metrics)

        if metrics.get("skipped_nonfinite", 0) > 0:
            nan_streak += 1
            print(f"===== non-finite loss at step "
                  f"{int(runner.state.step)} (streak {nan_streak}) =====",
                  flush=True)
            if nan_streak >= 3 and args.auto_resume_iter:
                target = runner.ckpt.rollback_step()
                if target is not None:
                    print(f"rolling back to checkpoint step {target}",
                          flush=True)
                    with jax.set_mesh(runner.mesh):
                        runner.state = runner.ckpt.restore(
                            target, runner.state)
                    nan_streak = 0
        else:
            nan_streak = 0

        runner.tb.set_step(int(runner.state.step))
        runner.tb.update(head="loss", **{
            k: v for k, v in metrics.items() if "loss" in k})
        runner.tb.update(head="opt", lr=lr,
                         grad_norm=metrics.get("grad_norm"))
        runner.tb.update(head="time", step=None,
                         step_time=time.time() - t_step)
        t_step = time.time()
    return {k: m.global_avg for k, m in logger.meters.items()}


def save_epoch(runner: Runner, epoch: int):
    if (epoch + 1) % max(runner.args.save_ckpt_freq, 1) == 0:
        runner.ckpt.save(int(runner.state.step), runner.state,
                         metadata={"epoch": epoch + 1})


def write_log(args, entry: dict):
    if jax.process_index() == 0:
        with open(os.path.join(args.output_dir, "log.txt"), "a") as f:
            f.write(json.dumps(entry, ensure_ascii=False) + "\n")

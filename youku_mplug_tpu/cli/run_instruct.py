"""mPLUG-Video (BloomZ-7B) video instruction inference runner.

TPU-native counterpart of the reference's mPLUG-Owl inference recipe
(reference README.md:111-148: MplugOwlForConditionalGeneration +
MplugOwlProcessor over the ``MAGAer13/mplug-youku-bloomz-7b`` HF
checkpoint, Human/AI conversation prompts with a ``<|video|>``
placeholder, model.generate).

Here: per-frame ViT -> visual abstractor -> query features spliced into
the Bloom token embeddings at the placeholder positions -> batched jitted
decode over the packed KV cache (models/generation.py — the HF python
generate loop becomes one lax.while_loop program).

Inputs: ``--input_jsonl`` with rows {"video": path, "question": text}
(or "prompt" for a pre-formatted conversation), or ``--question`` +
``--video`` for a one-off.  ``--synthetic_data`` replaces file decode
with procedural clips (CI / smoke).

Checkpoints: ``--hf_checkpoint`` imports an HF-format directory
(pytorch_model*.bin / safetensors — the Bloom decoder import is
oracle-exact, tests/test_bloom.py; abstractor/vision tensors merge
shape-checked best-effort).  ``--tokenizer`` points at HF tokenizer
files; without it a hash tokenizer runs (synthetic smoke only).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from youku_mplug_tpu.data.instruct import (
    VIDEO_PLACEHOLDER,
    WhitespaceTokenizer,
    build_instruct_batch,
    format_prompt,
)
from youku_mplug_tpu.models.bloom import BloomConfig
from youku_mplug_tpu.models.generation import GenerationConfig
from youku_mplug_tpu.models.owl import (
    MPLUGOwlVideo,
    MPLUGOwlVideoConfig,
    OwlAbstractorConfig,
    generate_instruct,
)
from youku_mplug_tpu.models.vision import VisionConfig
from youku_mplug_tpu.ops.preprocess import normalize_clip
from youku_mplug_tpu.parallel.sharding import (
    BLOOM_SHARDING_RULES,
    shard_params,
)
from youku_mplug_tpu.runtime.mesh import MeshConfig, make_mesh
from youku_mplug_tpu.runtime.precision import DEFAULT_POLICY, FP32_POLICY


def parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="mPLUG-Video BloomZ video instruction inference (TPU)")
    p.add_argument("--config", required=True, help="YAML run config")
    p.add_argument("--output_dir", default="./output")
    p.add_argument("--input_jsonl", default="",
                   help="rows {'video':path,'question':text}")
    p.add_argument("--video", default="", help="one-off video path")
    p.add_argument("--question", default="", help="one-off question")
    p.add_argument("--hf_checkpoint", default="",
                   help="HF-format checkpoint dir to import")
    p.add_argument("--serving_ckpt", default="",
                   help="orbax serving checkpoint dir from "
                        "tools/export_serving.py --owl (LoRA merged, "
                        "optionally int8) — used instead of init/HF")
    p.add_argument("--tokenizer", default="",
                   help="HF tokenizer dir/file (BloomTokenizerFast)")
    p.add_argument("--synthetic_data", action="store_true")
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--max_new_tokens", type=int, default=0,
                   help="override config")
    p.add_argument("--engine", action="store_true",
                   help="serve through the continuous-batching engine "
                        "(slot pool + per-request admission) instead of "
                        "one lock-step batched generate — the deployment "
                        "path; token-identical for greedy decoding")
    p.add_argument("--num_slots", type=int, default=4,
                   help="--engine slot-pool size")
    p.add_argument("--lookup_k", type=int, default=0,
                   help="--engine: k>0 adds prompt-lookup speculative "
                        "steps (greedy-only, token-exact)")
    # ---- instruction finetuning (reference README.md:111-133) --------
    p.add_argument("--train", action="store_true",
                   help="instruction-finetune instead of inference: "
                        "response-masked LM loss, frozen Bloom (+LoRA "
                        "when text_overrides.lora_rank > 0), trainable "
                        "abstractor/visual_fc/vit_eos")
    p.add_argument("--train_jsonl", default="",
                   help="rows {'video','question','answer'} "
                        "(or 'prompt' pre-formatted)")
    p.add_argument("--resume", default="",
                   help="run dir (or checkpoints dir) to resume from")
    p.add_argument("--max_steps", type=int, default=-1,
                   help="cap steps per epoch (smoke tests)")
    p.add_argument("--save_ckpt_freq", type=int, default=1)
    p.add_argument("--auto_resume_iter", action="store_true", default=True)
    p.add_argument("--log_freq", type=int, default=10)
    p.add_argument("--profile_dir", default="")
    return p


def build_train_loader(args, cfg, raw_cfg):
    from youku_mplug_tpu.data.instruct import InstructJsonlDataset
    from youku_mplug_tpu.data.loader import ShardedLoader
    from youku_mplug_tpu.data.transforms import train_transform

    t = int(raw_cfg.get("num_frames", 8))
    res = cfg.vision.img_size
    if args.synthetic_data:
        from youku_mplug_tpu.data.datasets import SyntheticVideoDataset

        ds = SyntheticVideoDataset(
            length=int(raw_cfg.get("synthetic_length", 16)),
            num_frames=t, size=res)
    else:
        src = args.train_jsonl or raw_cfg.get("train_file", "")
        if not src:
            raise SystemExit("--train needs --train_jsonl or train_file")
        ds = InstructJsonlDataset(
            src, raw_cfg.get("video_root", ""),
            transform=train_transform(res), num_frames=t, train=True,
            seed=args.seed,
            decode_short_side=int(raw_cfg.get("decode_short_side", 0)))
    return ShardedLoader(ds, int(raw_cfg.get("batch_size", 2)),
                         shuffle=True, seed=args.seed,
                         num_workers=int(raw_cfg.get("num_workers", 2)))


def make_instruct_batch(runner, raw):
    """Collated loader rows -> instruct_loss inputs.  Accepts both the
    jsonl schema (question/answer) and the synthetic caption schema
    (text -> answer under a fixed question)."""
    from youku_mplug_tpu.data.instruct import build_instruct_train_batch

    if "question" in raw:
        pairs = list(zip(raw["question"], raw["answer"]))
    else:
        pairs = [("What is shown in the video ?", txt)
                 for txt in raw["text"]]
    cfg = runner.model.cfg
    text = build_instruct_train_batch(
        pairs, runner.tokenizer, cfg.num_media_tokens,
        pad_id=cfg.text.pad_id, eos_id=cfg.text.eos_id,
        max_length=int(runner.cfg.get("max_length", 0)))
    return {"video": raw["video"], **text}


def train_main(args):
    """Instruction finetune loop (reference README.md:111-133 — the
    mPLUG-Owl finetune recipe): frozen ViT + frozen Bloom (LoRA adapters
    train when cfg.text.lora_rank > 0), trainable visual abstractor /
    visual_fc / vit_eos, response-masked LM loss
    (models/owl.instruct_loss), orbax checkpoints + resume, NaN-skip
    train step — the same trainer stack as the downstream runners."""
    import time

    from youku_mplug_tpu.cli import common
    from youku_mplug_tpu.optim.factory import OptimizerConfig
    from youku_mplug_tpu.runtime.cache import enable_compilation_cache
    from youku_mplug_tpu.train.checkpoint import CheckpointManager
    from youku_mplug_tpu.train.metrics import TensorboardLogger
    from youku_mplug_tpu.train.state import create_train_state
    from youku_mplug_tpu.train.trainer import make_train_step

    enable_compilation_cache()
    cfg, raw_cfg = load_owl_config(args.config)
    policy = FP32_POLICY if args.fp32 else DEFAULT_POLICY
    mesh = make_mesh(MeshConfig(**(raw_cfg.get("mesh") or {})))
    model = MPLUGOwlVideo(cfg, policy=policy)
    tokenizer = build_tokenizer(args, cfg)
    loader = build_train_loader(args, cfg, raw_cfg)
    epochs = int(raw_cfg.get("epochs", 3))
    niter = len(loader) if args.max_steps <= 0 else min(
        len(loader), args.max_steps)

    opt_kw = dict(raw_cfg.get("optimizer") or {})
    opt_kw.setdefault("lr", 1e-4)
    for k in ("epochs", "niter_per_ep", "freeze_text_decoder",
              "freeze_vit"):
        opt_kw.pop(k, None)
    opt_cfg = OptimizerConfig(
        **opt_kw, epochs=epochs, niter_per_ep=max(niter, 1),
        freeze_text_decoder=bool(raw_cfg.get("freeze_text_decoder", True)),
        freeze_vit=bool(raw_cfg.get("freeze_vit", True)))

    res = cfg.vision.img_size
    t = int(raw_cfg.get("num_frames", 8))
    dummy_video = jnp.zeros((1, 3, t, res, res), jnp.float32)
    dummy_ids = jnp.ones((1, 8), jnp.int32)
    rng = jax.random.key(args.seed)
    with jax.set_mesh(mesh):
        params = model.init(rng, dummy_video, dummy_ids,
                            jnp.ones_like(dummy_ids),
                            jnp.zeros_like(dummy_ids),
                            jnp.zeros_like(dummy_ids))["params"]
        params = shard_params(params, mesh, BLOOM_SHARDING_RULES)
        if args.hf_checkpoint:
            from youku_mplug_tpu.models.importers import import_owl

            params = import_owl(params, cfg, args.hf_checkpoint)
            params = shard_params(params, mesh, BLOOM_SHARDING_RULES)
        state, tx, schedule = create_train_state(
            params, opt_cfg,
            frozen_dtype=None if args.fp32 else policy.compute_dtype)

    os.makedirs(args.output_dir, exist_ok=True)
    ckpt = CheckpointManager(
        os.path.join(args.output_dir, "checkpoints"),
        async_save=bool(raw_cfg.get("async_checkpointing", False)))
    tb = TensorboardLogger(os.path.join(args.output_dir, "tb"),
                           enabled=jax.process_index() == 0)
    state, start_epoch = common.resume_state(args, ckpt, state, mesh)

    runner = common.Runner(
        args=args, cfg=raw_cfg, mesh=mesh, model=model,
        tokenizer=tokenizer, state=state, tx=tx, schedule=schedule,
        ckpt=ckpt, tb=tb, start_epoch=start_epoch)

    dtype = policy.compute_dtype

    def loss_fn(params, batch, rng, step):
        video = normalize_clip(batch["video"], dtype=dtype)
        return model.apply(
            {"params": params}, video, batch["input_ids"],
            batch["attention_mask"], batch["media_mask"],
            batch["prompt_mask"], deterministic=False,
            rngs={"dropout": rng}, method=MPLUGOwlVideo.instruct_loss)

    train_step = jax.jit(
        make_train_step(loss_fn, tx,
                        update_freq=int(raw_cfg.get("update_freq", 1))),
        donate_argnums=(0,))
    rng = jax.random.key(args.seed)
    for epoch in range(start_epoch, epochs):
        loader.set_epoch(epoch)
        t0 = time.time()
        stats = common.train_one_epoch(
            runner, loader, make_instruct_batch, train_step, epoch,
            jax.random.fold_in(rng, epoch))
        common.save_epoch(runner, epoch)
        common.write_log(args, {"epoch": epoch, **stats,
                                "epoch_time": time.time() - t0})
    return runner


def load_owl_config(path: str) -> tuple:
    """YAML -> (MPLUGOwlVideoConfig, raw dict).  Model JSONs resolve
    relative to the YAML like the other runners (config.py)."""
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    base = os.path.dirname(os.path.abspath(path))

    def resolve(p):
        if p and not os.path.isabs(p):
            for cand in (os.path.join(base, p), p):
                if os.path.exists(cand):
                    return cand
        return p

    text_kw = dict(raw.get("text_overrides") or {})
    tj = resolve(raw.get("bloom_model_json", ""))
    text = (BloomConfig.from_json_file(tj, **text_kw) if tj
            else BloomConfig(**text_kw))
    vis_kw = dict(raw.get("vision_overrides") or {})
    # the owl vision tower is CLIP-lineage: QuickGELU unless the YAML
    # overrides (see MPLUGOwlVideoConfig)
    vis_kw.setdefault("gelu", "quick")
    vj = resolve(raw.get("vision_model_json", ""))
    vision = (VisionConfig.from_json_file(vj, **vis_kw) if vj
              else VisionConfig(**vis_kw))
    abstractor = OwlAbstractorConfig(**(raw.get("abstractor") or {}))
    cfg = MPLUGOwlVideoConfig(vision=vision, abstractor=abstractor,
                              text=text)
    return cfg, raw


def build_tokenizer(args, cfg):
    if args.tokenizer:
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(args.tokenizer)
    return WhitespaceTokenizer(cfg.text.vocab_size, eos_id=cfg.text.eos_id,
                               pad_id=cfg.text.pad_id)


def load_videos(args, raw_cfg, rows):
    """[B, T, H, W, C] uint8 frames per row."""
    t = int(raw_cfg.get("num_frames", 8))
    res = int(raw_cfg.get("image_res", 224))
    if args.synthetic_data:
        rng = np.random.default_rng(args.seed)
        return rng.integers(0, 255, size=(len(rows), t, res, res, 3),
                            dtype=np.uint8)
    from youku_mplug_tpu.data.transforms import test_transform
    from youku_mplug_tpu.data.video_decode import read_frames

    tf = test_transform(res)
    clips = []
    for r in rows:
        frames = read_frames(r["video"], num_frames=t, sample="middle",
                             short_side=int(raw_cfg.get(
                                 "decode_short_side", 0)))
        clips.append(tf(frames))
    return np.stack(clips)


def serve_instruct(model, params, clips, batch, gen_cfg, *,
                   num_slots=4, lookup_k=0, rng=None, qscales=None):
    """Instruct inference through the continuous-batching engine: videos
    are encoded and spliced into prompt embeddings in one batch, then
    each request is admitted to the slot pool as slots free (the
    deployment path — serving/engine.py).  Greedy output is token-
    identical to ``generate_instruct`` (tested: tests/test_owl.py).

    Returns sequences [B, max_new_tokens] right-padded with pad_id.
    """
    from youku_mplug_tpu.models.bloom import BloomLM
    from youku_mplug_tpu.models.owl import MPLUGOwlVideo
    from youku_mplug_tpu.serving.engine import ServingEngine

    if gen_cfg.beam_size > 1:
        raise ValueError("--engine serves beam_size=1 (greedy/sample); "
                         "use the batched generate path for beam search")
    input_ids = np.asarray(batch["input_ids"])
    media_mask = np.asarray(batch["media_mask"])
    prompt_len = np.asarray(batch["prompt_len"])
    b = input_ids.shape[0]

    task_vars = {"params": params}
    if qscales:
        task_vars["qscales"] = {"text_decoder": qscales}
    qf = model.apply(task_vars, jnp.asarray(clips),
                     method=MPLUGOwlVideo.encode_video)
    embeds = np.asarray(model.apply(
        task_vars, jnp.asarray(input_ids),
        jnp.asarray(media_mask), qf, method=MPLUGOwlVideo.spliced_embeds))

    decoder = BloomLM(model.cfg.text, policy=model.policy)
    dec_vars = ({"params": params["text_decoder"], "qscales": qscales}
                if qscales else params["text_decoder"])
    longest = int(prompt_len.max())
    bucket = 8
    while bucket < longest:
        bucket *= 2
    eng = ServingEngine(
        decoder, dec_vars, num_slots=min(num_slots, b),
        max_len=bucket + gen_cfg.max_new_tokens + 2,
        prefill_buckets=(bucket,), config=gen_cfg, rng=rng)
    rid_to_row = {}
    for i in range(b):
        n = int(prompt_len[i])
        rid = eng.submit(list(input_ids[i, :n]),
                         prompt_embeds=embeds[i, :n])
        rid_to_row[rid] = i

    seqs = np.full((b, gen_cfg.max_new_tokens), gen_cfg.pad_id, np.int32)
    for fin in eng.run_to_completion(lookup_k=lookup_k):
        toks = fin.tokens[:gen_cfg.max_new_tokens]
        seqs[rid_to_row[fin.rid], :len(toks)] = toks
    return seqs


def main(args):
    if args.train:
        return train_main(args)
    cfg, raw_cfg = load_owl_config(args.config)
    if args.serving_ckpt:
        # export_serving merged the adapters into the base kernels; the
        # serving model must not expect lora_* params
        cfg = dataclasses.replace(
            cfg,
            text=dataclasses.replace(cfg.text, lora_rank=0),
            vision=dataclasses.replace(cfg.vision, lora_rank=0))
    policy = FP32_POLICY if args.fp32 else DEFAULT_POLICY
    mesh = make_mesh(MeshConfig(**(raw_cfg.get("mesh") or {})))
    model = MPLUGOwlVideo(cfg, policy=policy)
    tokenizer = build_tokenizer(args, cfg)

    rows = []
    if args.input_jsonl:
        with open(args.input_jsonl) as f:
            rows = [json.loads(line) for line in f if line.strip()]
    elif args.question or args.synthetic_data:
        rows = [{"video": args.video,
                 "question": args.question or "What is in the video?"}]
    if not rows:
        raise SystemExit("nothing to do: pass --input_jsonl or --question")

    prompts = [r.get("prompt") or format_prompt(r["question"])
               for r in rows]
    for p in prompts:
        assert VIDEO_PLACEHOLDER in p, f"prompt lacks {VIDEO_PLACEHOLDER}"

    batch = build_instruct_batch(prompts, tokenizer, cfg.num_media_tokens,
                                 pad_id=cfg.text.pad_id)
    video = load_videos(args, raw_cfg, rows)

    rng = jax.random.key(args.seed)
    t = int(raw_cfg.get("num_frames", 8))
    res = cfg.vision.img_size
    dummy_video = jnp.zeros((1, 3, t, res, res), policy.compute_dtype)
    qscales = None
    with jax.set_mesh(mesh):
        if args.serving_ckpt:
            from youku_mplug_tpu.train.checkpoint import CheckpointManager

            sc = CheckpointManager(args.serving_ckpt)
            step = sc.latest_step()
            if step is None:
                raise SystemExit(
                    f"no serving checkpoint under {args.serving_ckpt}")
            raw = sc.restore_raw(step)
            params = raw["params"]
            qscales = (raw.get("qscales") or {}).get("text_decoder")
            params = shard_params(params, mesh, BLOOM_SHARDING_RULES)
            print(f"loaded serving checkpoint step {step} "
                  f"(int8={qscales is not None})", flush=True)
        else:
            params = model.init(
                rng, dummy_video, batch["input_ids"][:1],
                np.ones_like(batch["input_ids"][:1]),
                batch["media_mask"][:1],
                np.zeros_like(batch["input_ids"][:1]))["params"]
            params = shard_params(params, mesh, BLOOM_SHARDING_RULES)
        if args.hf_checkpoint and not args.serving_ckpt:
            from youku_mplug_tpu.models.importers import import_owl

            params = import_owl(params, cfg, args.hf_checkpoint)
            params = shard_params(params, mesh, BLOOM_SHARDING_RULES)

        gen_cfg = GenerationConfig(
            max_new_tokens=args.max_new_tokens
            or int(raw_cfg.get("max_new_tokens", 128)),
            eos_id=cfg.text.eos_id, pad_id=cfg.text.pad_id,
            do_sample=bool(raw_cfg.get("do_sample", False)),
            top_k=int(raw_cfg.get("top_k", 5)),
            top_p=float(raw_cfg.get("top_p", 0.9)),
            beam_size=int(raw_cfg.get("beam_size", 1)))

        clips = normalize_clip(jnp.asarray(video),
                               dtype=policy.compute_dtype)
        if args.engine:
            seqs = serve_instruct(
                model, params, clips, batch, gen_cfg,
                num_slots=args.num_slots, lookup_k=args.lookup_k,
                rng=jax.random.key(args.seed + 1), qscales=qscales)
        else:
            out = generate_instruct(
                model, params, clips, jnp.asarray(batch["input_ids"]),
                jnp.asarray(batch["media_mask"]),
                jnp.asarray(batch["prompt_len"]), gen_cfg,
                rng=jax.random.key(args.seed + 1), qscales=qscales)
            seqs = np.asarray(out["sequences"])
    results = []
    for r, seq in zip(rows, seqs):
        keep = seq[(seq != cfg.text.pad_id) & (seq != cfg.text.eos_id)]
        answer = tokenizer.decode(keep, skip_special_tokens=True).strip()
        results.append({**{k: v for k, v in r.items() if k != "prompt"},
                        "answer": answer})
        print(f"Q: {r.get('question', '')!r}\nA: {answer!r}", flush=True)

    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "instruct_results.json"),
              "w") as f:
        json.dump(results, f, ensure_ascii=False, indent=1)
    return results


if __name__ == "__main__":
    main(parser().parse_args())

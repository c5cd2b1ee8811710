"""Config loading: the reference's YAML/JSON contract, TPU-native runtime.

Keeps the public config surface of the reference intact (reference:
configs/*/*.yaml + configs/models/*.json; merge logic
run_pretrain_distributed_gpt3.py:398-425) so a user can bring their YAML
unchanged.  The only semantic remap is parallelism: ``megatron_cfg``'s
``tensor_model_parallel_size`` becomes the ``model`` mesh axis degree (a
``mesh`` block with explicit data/model axes is also accepted).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import yaml

from youku_mplug_tpu.models.gpt3 import GPT3Config
from youku_mplug_tpu.models.tasks import MPLUGVideoConfig
from youku_mplug_tpu.models.vision import VisionConfig
from youku_mplug_tpu.optim.factory import OptimizerConfig
from youku_mplug_tpu.runtime.mesh import MeshConfig


@dataclasses.dataclass
class RunConfig:
    """Everything a runner needs, assembled from YAML + model JSONs."""

    raw: Dict[str, Any]
    model: MPLUGVideoConfig
    optimizer: OptimizerConfig
    mesh: MeshConfig
    # data
    batch_size: int = 8
    num_workers: int = 8
    max_length: int = 80
    num_frames: int = 8
    image_res: int = 224
    prompt: str = ""
    # loop
    epochs: int = 10
    update_freq: int = 1
    seed: int = 42
    save_ckpt_freq: int = 1

    def get(self, key, default=None):
        return self.raw.get(key, default)


def load_config(yaml_path: str, overrides: Optional[Dict[str, Any]] = None,
                config_root: Optional[str] = None) -> RunConfig:
    with open(yaml_path) as f:
        raw = yaml.safe_load(f)
    raw.update(overrides or {})
    root = config_root or os.path.dirname(os.path.dirname(
        os.path.abspath(yaml_path)))

    def resolve(p):
        if p and not os.path.isabs(p) and not os.path.exists(p):
            cand = os.path.join(root, p)
            if os.path.exists(cand):
                return cand
        return p

    # model configs
    text_cfg_path = resolve(raw.get("text_cfg"))
    visual_cfg_path = resolve(raw.get("visual_cfg"))
    text = (GPT3Config.from_json_file(text_cfg_path)
            if text_cfg_path and os.path.exists(text_cfg_path)
            else GPT3Config())
    if raw.get("text_overrides"):
        over = dict(raw["text_overrides"])
        if "lora_targets" in over:  # YAML lists -> tuple
            over["lora_targets"] = tuple(over["lora_targets"])
        text = dataclasses.replace(text, **over)
    if raw.get("lora_rank"):  # top-level convenience for adapter tuning
        text = dataclasses.replace(
            text, lora_rank=int(raw["lora_rank"]),
            lora_alpha=float(raw.get("lora_alpha", text.lora_alpha)))
    vision = (VisionConfig.from_json_file(visual_cfg_path)
              if visual_cfg_path and os.path.exists(visual_cfg_path)
              else VisionConfig())
    num_frames = int(raw.get("num_frames", vision.num_frames))
    vision = dataclasses.replace(vision, num_frames=num_frames)
    if raw.get("visual_overrides"):
        vision = dataclasses.replace(vision, **raw["visual_overrides"])

    model = MPLUGVideoConfig(
        vision=vision,
        text=text,
        num_learnable_token=int(raw.get("num_learnable_token", 256)),
        use_contrastive=bool(raw.get("use_contrastive", False)),
        contrastive_embed_dim=int(raw.get("embed_dim", 256)),
        temp=float(raw.get("temp", 0.07)),
        use_cls=bool(raw.get("use_cls", False)),
        num_classes=int(raw.get("num_classes", 0)),
        connect_ln=bool(raw.get("connect_ln", False)),
        freeze_vit=bool(raw.get("freeze_vit", False)),
        freeze_text_decoder=bool(raw.get("freeze_text_decoder", True)),
    )

    opt = dict(raw.get("optimizer", {}))
    sched = dict(raw.get("schedular", raw.get("scheduler", {})))
    optimizer = OptimizerConfig(
        opt=str(opt.get("opt", "adamw")).lower(),
        lr=float(opt.get("lr", 1e-4)),
        min_lr=float(sched.get("min_lr", 1e-6)),
        weight_decay=float(opt.get("weight_decay", 0.05)),
        opt_betas=tuple(opt.get("opt_betas", (0.9, 0.999))),
        opt_eps=float(opt.get("opt_eps", 1e-8)),
        clip_grad=(float(opt["clip_grad"])
                   if opt.get("clip_grad") else None),
        warmup_steps=int(sched.get("warmup_steps", -1)),
        warmup_epochs=max(float(sched.get("warmup_epochs", 0) or 0), 0),
        epochs=int(sched.get("epochs", raw.get("epochs", 10))),
        sched_type=str(sched.get("lr_sched_type", "cos")
                       ).replace("cosine", "cos"),
        visual_backbone_scale=bool(vision.clip_model),
        freeze_text_decoder=model.freeze_text_decoder,
        freeze_vit=model.freeze_vit,
    )

    # mesh: explicit block wins; else map megatron TP -> model axis
    mesh_block = raw.get("mesh")
    if mesh_block:
        mesh = MeshConfig(data=int(mesh_block.get("data", -1)),
                          model=int(mesh_block.get("model", 1)))
    else:
        mcfg = raw.get("megatron_cfg", {})
        mesh = MeshConfig(
            data=-1,
            model=int(mcfg.get("tensor_model_parallel_size",
                               mcfg.get("model_parallel_size", 1))))

    return RunConfig(
        raw=raw,
        model=model,
        optimizer=optimizer,
        mesh=mesh,
        batch_size=int(raw.get("batch_size", 8)),
        num_workers=int(raw.get("num_workers", 8)),
        max_length=int(raw.get("max_length", 80)),
        num_frames=num_frames,
        image_res=int(raw.get("image_res", vision.img_size)),
        prompt=str(raw.get("prompt", "") or ""),
        epochs=int(sched.get("epochs", raw.get("epochs", 10))),
        update_freq=int(raw.get("update_freq", 1)),
        seed=int(raw.get("seed", 42)),
        save_ckpt_freq=int(raw.get("save_ckpt_freq", 1)),
    )


def dump_config(cfg: RunConfig, output_dir: str):
    """Persist the merged config for reproducibility (reference
    run_pretrain:425)."""
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "config.yaml"), "w") as f:
        yaml.safe_dump(cfg.raw, f, allow_unicode=True)

"""Shipped production configs: every task YAML must load through
config.py with the right model geometry, every model JSON must parse,
and every launch script must point at a config that exists (reference
surface: configs/**/*.yaml + configs/models/*.json + classname.json +
scripts/*.sh)."""

import glob
import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TASK_YAMLS = sorted(
    glob.glob(os.path.join(REPO, "configs", "**", "*.yaml"),
              recursive=True))
MODEL_JSONS = sorted(
    glob.glob(os.path.join(REPO, "configs", "models", "*.json")))

GPT3_GEOMETRY = {
    "config_gpt3_base": (768, 12, 12, 25600),
    "config_gpt3_large": (1024, 24, 16, 25600),
    "config_gpt3_1.3B": (2048, 24, 32, 51200),
    "config_gpt3_2.7B": (2560, 32, 32, 51200),
    "config_gpt3_13B": (5120, 40, 40, 51200),
}


def test_config_surface_shipped():
    assert len(TASK_YAMLS) >= 11  # 10 production + pretrain_tiny
    assert len(MODEL_JSONS) >= 12
    assert os.path.exists(os.path.join(REPO, "classname.json"))


@pytest.mark.parametrize("path", TASK_YAMLS,
                         ids=[os.path.basename(p) for p in TASK_YAMLS])
def test_task_yaml_loads(path):
    from youku_mplug_tpu.config import load_config

    cfg = load_config(path, config_root=REPO)
    assert cfg.batch_size > 0
    assert cfg.model.text.hidden_size % cfg.model.text.num_heads == 0 \
        if hasattr(cfg.model.text, "num_heads") else True
    assert cfg.optimizer.lr > 0
    assert cfg.optimizer.epochs > 0
    name = os.path.basename(path)
    if "1.3B" in name:
        assert cfg.model.text.hidden_size == 2048
        assert cfg.model.text.num_hidden_layers == 24
    if "2.7B" in name:
        assert cfg.model.text.hidden_size == 2560
        assert cfg.model.text.num_hidden_layers == 32
    if name.startswith("cls"):
        assert cfg.model.use_cls and cfg.model.num_classes == 45
    if name.startswith("pretrain_gpt3"):
        assert cfg.model.freeze_text_decoder
        assert cfg.model.num_learnable_token == 128


@pytest.mark.parametrize(
    "name", sorted(GPT3_GEOMETRY),
    ids=sorted(GPT3_GEOMETRY))
def test_gpt3_model_jsons(name):
    from youku_mplug_tpu.models.gpt3 import GPT3Config

    h, l, heads, vocab = GPT3_GEOMETRY[name]
    cfg = GPT3Config.from_json_file(
        os.path.join(REPO, "configs", "models", f"{name}.json"))
    assert (cfg.hidden_size, cfg.num_hidden_layers,
            cfg.num_attention_heads, cfg.vocab_size) == (h, l, heads, vocab)
    assert cfg.attention_dropout == 0.1


def test_vision_model_jsons():
    from youku_mplug_tpu.models.vision import VisionConfig

    for name, (dim, depth, clip) in {
            "vit-b16": (768, 12, False),
            "clip-b16": (768, 12, True),
            "clip-l14": (1024, 24, True)}.items():
        cfg = VisionConfig.from_json_file(
            os.path.join(REPO, "configs", "models", f"{name}.json"))
        assert (cfg.embed_dim, cfg.depth, cfg.clip_model) == \
            (dim, depth, clip)


def test_bert_model_jsons():
    from youku_mplug_tpu.models.bert import BertConfig

    for name, vocab in {"config_bert_mplug": 30522,
                        "config_bert_zh_mplug": 21128,
                        "config_bert_alpro": 30522,
                        "config_bert_zh_alpro": 21128}.items():
        cfg = BertConfig.from_json_file(
            os.path.join(REPO, "configs", "models", f"{name}.json"))
        assert cfg.vocab_size == vocab
        assert cfg.hidden_size == 768


def test_classname_json_is_the_45_way_map():
    raw = json.load(open(os.path.join(REPO, "classname.json")))
    assert len(raw) == 45
    assert sorted(raw.values()) == list(range(45))


def test_scripts_reference_existing_configs():
    scripts = sorted(glob.glob(os.path.join(REPO, "scripts", "*.sh")))
    assert len(scripts) >= 5
    for s in scripts:
        text = open(s).read()
        for m in re.finditer(r"--config\s+(\S+)", text):
            rel = m.group(1).rstrip("\\").strip()
            assert os.path.exists(os.path.join(REPO, rel)), \
                f"{os.path.basename(s)} references missing config {rel}"


def test_lora_yaml_plumbing(tmp_path):
    import yaml

    from youku_mplug_tpu.config import load_config

    p = tmp_path / "lora.yaml"
    p.write_text(yaml.safe_dump(
        {"lora_rank": 4, "text_overrides": {"lora_targets": ["qkv", "fc1"]}}))
    rc = load_config(str(p))
    assert rc.model.text.lora_rank == 4
    assert rc.model.text.lora_targets == ("qkv", "fc1")

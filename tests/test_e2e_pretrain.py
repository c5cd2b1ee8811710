"""Minimum end-to-end slice (SURVEY §7.3): tiny TimeSformer + tiny GPT-3 on
synthetic videos over the 8-device CPU mesh — data pipeline -> forward
(query-prefix caption loss) -> backward -> optax step -> checkpoint ->
resume."""

import json
import os

import numpy as np
import pytest
import yaml

TINY_TEXT = {
    "vocab_size": 128, "hidden_size": 32, "num_hidden_layers": 2,
    "num_attention_heads": 4, "max_position_embeddings": 128,
    "hidden_dropout_prob": 0.0, "attention_probs_dropout_prob": 0.0,
    "layernorm_epsilon": 1e-5,
}
TINY_VISION = {
    "img_size": 32, "patch_size": 16, "embed_dim": 32, "depth": 1,
    "num_heads": 2, "num_frames": 2, "mlp_ratio": 2,
}


@pytest.fixture(scope="module")
def tiny_config(tmp_path_factory):
    d = tmp_path_factory.mktemp("cfg")
    json.dump(TINY_TEXT, open(d / "text.json", "w"))
    json.dump(TINY_VISION, open(d / "vision.json", "w"))
    cfg = {
        "text_cfg": str(d / "text.json"),
        "visual_cfg": str(d / "vision.json"),
        "mesh": {"data": 4, "model": 2},
        "batch_size": 4,
        "num_workers": 2,
        "max_length": 16,
        "num_frames": 2,
        "image_res": 32,
        "num_learnable_token": 4,
        "use_contrastive": True,
        "embed_dim": 8,
        "freeze_text_decoder": True,
        "synthetic_length": 16,
        "optimizer": {"lr": 1e-3, "opt": "AdamW", "weight_decay": 0.01,
                      "clip_grad": 3.0},
        "schedular": {"epochs": 2, "min_lr": 1e-5, "warmup_steps": 2,
                      "lr_sched_type": "cosine"},
    }
    path = d / "pretrain.yaml"
    yaml.safe_dump(cfg, open(path, "w"))
    return str(path)


def test_pretrain_end_to_end(tiny_config, tmp_path):
    from youku_mplug_tpu.cli import common, run_pretrain

    out = str(tmp_path / "out")
    args = common.base_parser("t").parse_args([
        "--config", tiny_config, "--output_dir", out, "--fp32",
        "--synthetic_data", "--max_steps", "3", "--seed", "0"])
    runner = run_pretrain.main(args)

    # log written with finite losses for both epochs
    log = [json.loads(l) for l in open(os.path.join(out, "log.txt"))]
    assert len(log) == 2
    assert np.isfinite(log[0]["loss"])
    assert log[0]["loss_contrastive"] > 0
    # checkpoints saved
    assert runner.ckpt.latest_step() == int(runner.state.step)
    # merged config dumped
    assert os.path.exists(os.path.join(out, "config.yaml"))

    # resume: a fresh setup must restore step & epoch
    args2 = common.base_parser("t").parse_args([
        "--config", tiny_config, "--output_dir", out, "--fp32",
        "--synthetic_data", "--max_steps", "3", "--seed", "0"])
    runner2 = common.setup(args2, niter_per_ep=3)
    assert int(runner2.state.step) == int(runner.state.step)
    assert runner2.start_epoch == 2

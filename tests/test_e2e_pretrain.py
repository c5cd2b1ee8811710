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


def test_resume_interpolates_vision_embeds(tiny_config, tmp_path):
    """Resuming a checkpoint trained at T frames into a config with more
    frames / a different resolution interpolates pos/temporal embeds
    (reference run_cls_distributed_gpt3.py:332-340) instead of failing."""
    import json as _json

    import yaml as _yaml

    from youku_mplug_tpu.cli import common, run_pretrain

    out = str(tmp_path / "out_src")
    args = common.base_parser("t").parse_args([
        "--config", tiny_config, "--output_dir", out, "--fp32",
        "--synthetic_data", "--max_steps", "2", "--seed", "0"])
    runner = run_pretrain.main(args)
    src_temb = np.asarray(
        runner.params["visual_encoder"]["temporal_embed"], np.float32)
    assert src_temb.shape[1] == 2

    # new config: 4 frames and 48px (9 patches vs 4)
    cfg = _yaml.safe_load(open(tiny_config))
    vis = _json.load(open(cfg["visual_cfg"]))
    vis.update(num_frames=4, img_size=48)
    vis_path = str(tmp_path / "vision4.json")
    _json.dump(vis, open(vis_path, "w"))
    cfg.update(visual_cfg=vis_path, num_frames=4, image_res=48)
    cfg_path = str(tmp_path / "pretrain4.yaml")
    _yaml.safe_dump(cfg, open(cfg_path, "w"))

    args2 = common.base_parser("t").parse_args([
        "--config", cfg_path, "--output_dir", str(tmp_path / "out_dst"),
        "--fp32", "--synthetic_data", "--max_steps", "2", "--seed", "1",
        "--resume", out])
    runner2 = common.setup(args2, niter_per_ep=2)
    temb = np.asarray(
        runner2.params["visual_encoder"]["temporal_embed"], np.float32)
    assert temb.shape[1] == 4
    # linear interpolation endpoints preserved
    np.testing.assert_allclose(temb[:, 0], src_temb[:, 0], rtol=1e-5)
    np.testing.assert_allclose(temb[:, -1], src_temb[:, -1], rtol=1e-5)
    pos = np.asarray(
        runner2.params["visual_encoder"]["pos_embed"], np.float32)
    assert pos.shape[1] == 1 + (48 // 16) ** 2


def test_pretrain_with_lora_adapters(tiny_config, tmp_path):
    """lora_rank in YAML: frozen decoder, trainable adapters — the
    adapters live in the trainable subtree, get optimizer state, and
    move during training."""
    import jax
    import yaml

    from youku_mplug_tpu.cli import common, run_pretrain

    cfg = yaml.safe_load(open(tiny_config))
    cfg["lora_rank"] = 2
    lcfg = str(tmp_path / "lora.yaml")
    yaml.safe_dump(cfg, open(lcfg, "w"))

    out = str(tmp_path / "out_lora")
    args = common.base_parser("t").parse_args([
        "--config", lcfg, "--output_dir", out, "--fp32",
        "--synthetic_data", "--max_steps", "3", "--seed", "0"])
    runner = run_pretrain.main(args)

    keystr = jax.tree_util.keystr
    train_lora = {keystr(p): x for p, x in
                  jax.tree_util.tree_leaves_with_path(runner.state.trainable)
                  if "lora_" in keystr(p)}
    assert len(train_lora) == 8  # 4 targets x (a, b), stacked layers
    frozen_lora = [p for p, _ in
                   jax.tree_util.tree_leaves_with_path(runner.state.frozen)
                   if "lora_" in keystr(p)]
    assert not frozen_lora
    # b starts at zero and must have moved after 3 steps of training
    b_moved = [float(abs(x).max()) for k, x in train_lora.items()
               if k.endswith("_b']")]
    assert all(v > 0 for v in b_moved)


def test_export_serving_checkpoint(tiny_config, tmp_path):
    """tools/export_serving.py: restore -> merge LoRA -> int8 -> one
    serving checkpoint with qscales."""
    import sys as _sys

    import jax
    import yaml

    from youku_mplug_tpu.cli import common, run_pretrain

    cfg = yaml.safe_load(open(tiny_config))
    cfg["lora_rank"] = 2
    lcfg = str(tmp_path / "lora.yaml")
    yaml.safe_dump(cfg, open(lcfg, "w"))
    out = str(tmp_path / "run")
    args = common.base_parser("t").parse_args([
        "--config", lcfg, "--output_dir", out, "--fp32",
        "--synthetic_data", "--max_steps", "2", "--seed", "0"])
    run_pretrain.main(args)

    dest = str(tmp_path / "serving")
    # in-process (a subprocess would re-init the forced TPU backend);
    # the tool itself is backend-agnostic
    import importlib.util as _ilu
    spec = _ilu.spec_from_file_location(
        "export_serving",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools", "export_serving.py"))
    tool = _ilu.module_from_spec(spec)
    spec.loader.exec_module(tool)
    argv = _sys.argv
    _sys.argv = ["x", "--run_dir", out, "--config", lcfg,
                 "--dest", dest, "--int8"]
    try:
        tool.main()
    finally:
        _sys.argv = argv

    from youku_mplug_tpu.train.checkpoint import CheckpointManager
    ckpt = CheckpointManager(dest)
    step = ckpt.latest_step()
    raw = ckpt.restore_raw(step)
    leaves = jax.tree_util.tree_leaves_with_path(raw["params"])
    assert not any("lora_" in jax.tree_util.keystr(p) for p, _ in leaves)
    import numpy as _np
    int8_kernels = [x for _, x in leaves if x.dtype == _np.int8]
    assert int8_kernels, "decoder kernels should be int8"
    assert "qscales" in raw

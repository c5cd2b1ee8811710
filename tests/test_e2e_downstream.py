"""End-to-end smoke for the downstream runners (synthetic data, tiny
models, 8-device CPU mesh): train 2 steps + evaluate, per task."""

import json
import os

import numpy as np
import pytest
import yaml

TINY_TEXT = {
    "vocab_size": 128, "hidden_size": 32, "num_hidden_layers": 1,
    "num_attention_heads": 4, "max_position_embeddings": 128,
    "hidden_dropout_prob": 0.0, "attention_probs_dropout_prob": 0.0,
    "layernorm_epsilon": 1e-5,
}
TINY_VISION = {
    "img_size": 32, "patch_size": 16, "embed_dim": 32, "depth": 1,
    "num_heads": 2, "num_frames": 2, "mlp_ratio": 2,
}


def write_cfg(d, name, **extra):
    json.dump(TINY_TEXT, open(d / "text.json", "w"))
    json.dump(TINY_VISION, open(d / "vision.json", "w"))
    cfg = {
        "text_cfg": str(d / "text.json"),
        "visual_cfg": str(d / "vision.json"),
        "mesh": {"data": 4, "model": 2},
        "batch_size": 4,
        "num_workers": 2,
        "max_length": 12,
        "num_frames": 2,
        "image_res": 32,
        "num_learnable_token": 4,
        "embed_dim": 8,
        "freeze_text_decoder": True,
        "synthetic_length": 8,
        "optimizer": {"lr": 1e-3, "opt": "AdamW", "weight_decay": 0.01,
                      "clip_grad": 3.0},
        "schedular": {"epochs": 1, "min_lr": 1e-5, "warmup_steps": 1,
                      "lr_sched_type": "cosine"},
    }
    cfg.update(extra)
    path = d / f"{name}.yaml"
    yaml.safe_dump(cfg, open(path, "w"))
    return str(path)


def _args(common, cfg_path, out, extra=()):
    return common.base_parser("t").parse_args([
        "--config", cfg_path, "--output_dir", out, "--fp32",
        "--synthetic_data", "--max_steps", "2", "--seed", "0", *extra])


def test_cls_runner(tmp_path):
    from youku_mplug_tpu.cli import common, run_cls

    cfg = write_cfg(tmp_path, "cls", use_cls=True, num_classes=3)
    runner = run_cls.main(_args(common, cfg, str(tmp_path / "out")))
    log = [json.loads(l) for l in open(tmp_path / "out" / "log.txt")]
    assert "val_gen_top1_accuracy" in log[0]
    assert np.isfinite(log[0]["loss"])
    assert "test" in log[-1]
    assert 0 <= log[-1]["test"]["gen_top1_accuracy"] <= 100


def test_caption_runner(tmp_path):
    from youku_mplug_tpu.cli import common, run_caption

    cfg = write_cfg(tmp_path, "cap", prompt="", max_new_tokens=4,
                    beam_size=2)
    runner = run_caption.main(_args(common, cfg, str(tmp_path / "out")))
    log = [json.loads(l) for l in open(tmp_path / "out" / "log.txt")]
    assert np.isfinite(log[0]["loss"])
    assert "CIDEr" in log[-1]["test"]
    results = json.load(open(tmp_path / "out" / "caption_results.json"))
    assert len(results) > 0
    assert "pred_caption" in results[0]


def test_retrieval_runner(tmp_path):
    from youku_mplug_tpu.cli import common, run_retrieval

    cfg = write_cfg(tmp_path, "ret")
    runner = run_retrieval.main(_args(common, cfg, str(tmp_path / "out")))
    log = [json.loads(l) for l in open(tmp_path / "out" / "log.txt")]
    assert np.isfinite(log[0]["loss"])
    assert "r_mean" in log[-1]["test"]


def test_retrieval_itm_runner(tmp_path):
    from youku_mplug_tpu.cli import common, run_retrieval_itm

    cfg = write_cfg(tmp_path, "itm", use_cls=True, num_classes=2,
                    eval_video_batch=4)
    runner = run_retrieval_itm.main(
        _args(common, cfg, str(tmp_path / "out")))
    log = [json.loads(l) for l in open(tmp_path / "out" / "log.txt")]
    assert np.isfinite(log[0]["loss"])
    assert "gen_r_mean" in log[-1]["test"]
    assert "cls_r_mean" in log[-1]["test"]


def test_mplug_pretrain_runner(tmp_path):
    from youku_mplug_tpu.cli import common, run_mplug_pretrain

    cfg = write_cfg(tmp_path, "mplug",
                    bert_overrides={"vocab_size": 256, "hidden_size": 32,
                                    "num_hidden_layers": 2,
                                    "num_attention_heads": 4,
                                    "intermediate_size": 64,
                                    "encoder_width": 32, "fusion_layer": 1,
                                    "text_encoder_layers": 1,
                                    "hidden_dropout_prob": 0.0,
                                    "attention_probs_dropout_prob": 0.0},
                    embed_dim=8, queue_size=8, alpha=0.4)
    state, mstate = run_mplug_pretrain.main(
        _args(common, cfg, str(tmp_path / "out")))
    import json as _json

    log = [_json.loads(l) for l in open(tmp_path / "out" / "log.txt")]
    assert np.isfinite(log[0]["loss"])
    assert log[0]["loss_ita"] > 0 and log[0]["loss_mlm"] > 0
    # queues advanced: 2 steps x batch 4 wraps the size-8 queue to ptr 0
    assert int(mstate.ptr) == 0
    assert np.isfinite(np.asarray(mstate.image_queue)).all()


def test_mplug_downstream_runner(tmp_path):
    from youku_mplug_tpu.cli import run_mplug_downstream

    bert_over = {"vocab_size": 256, "hidden_size": 32,
                 "num_hidden_layers": 2, "num_attention_heads": 4,
                 "intermediate_size": 64, "encoder_width": 32,
                 "fusion_layer": 1, "text_encoder_layers": 1,
                 "hidden_dropout_prob": 0.0,
                 "attention_probs_dropout_prob": 0.0}
    cfg = write_cfg(tmp_path, "mplug_ds", bert_overrides=bert_over,
                    embed_dim=8, num_classes=3, beam_size=3,
                    max_new_tokens=4)
    args = run_mplug_downstream.parser().parse_args([
        "--config", cfg, "--output_dir", str(tmp_path / "out_cls"),
        "--fp32", "--synthetic_data", "--max_steps", "2", "--seed", "0",
        "--task", "cls"])
    _, res = run_mplug_downstream.main(args)
    assert 0 <= res["top1"] <= 100

    args = run_mplug_downstream.parser().parse_args([
        "--config", cfg, "--output_dir", str(tmp_path / "out_ret"),
        "--fp32", "--synthetic_data", "--max_steps", "2", "--seed", "0",
        "--task", "retrieval"])
    _, res = run_mplug_downstream.main(args)
    assert "r_mean" in res

    # caption decodes with beam_size=3 (in-jit BERT-decoder beam)
    args = run_mplug_downstream.parser().parse_args([
        "--config", cfg, "--output_dir", str(tmp_path / "out_cap"),
        "--fp32", "--synthetic_data", "--max_steps", "1", "--seed", "0",
        "--task", "caption"])
    _, res = run_mplug_downstream.main(args)
    assert "CIDEr" in res or "Bleu_4" in res or "ROUGE_L" in res


def test_cls_evaluate_only_resume(tmp_path):
    """Train briefly, then a fresh --evaluate_only invocation must restore
    the checkpoint and evaluate (the reference's eval story,
    scripts/run_cls_gpt3_1.3b.sh:14-16)."""
    from youku_mplug_tpu.cli import common, run_cls

    cfg = write_cfg(tmp_path, "cls_eo", use_cls=True, num_classes=3)
    out = str(tmp_path / "out")
    run_cls.main(_args(common, cfg, out))

    args = common.base_parser("t").parse_args([
        "--config", cfg, "--output_dir", out, "--fp32",
        "--synthetic_data", "--max_steps", "2", "--seed", "0",
        "--evaluate_only", "--resume", out])
    runner = run_cls.main(args)
    assert int(runner.state.step) > 0  # restored, not fresh
    import json as _json

    log = [_json.loads(l) for l in open(tmp_path / "out" / "log.txt")]
    tests = [e for e in log if "test" in e]
    assert len(tests) >= 2  # one from training run, one from eval-only

    # --resume pointing at the TRAINED dir with a FRESH output_dir must
    # restore the trained weights, not evaluate a fresh init
    out2 = str(tmp_path / "out_fresh")
    args = common.base_parser("t").parse_args([
        "--config", cfg, "--output_dir", out2, "--fp32",
        "--synthetic_data", "--max_steps", "2", "--seed", "0",
        "--evaluate_only", "--resume", out])
    runner = run_cls.main(args)
    assert int(runner.state.step) > 0  # restored from external dir

    # --evaluate_only with no checkpoint anywhere must fail loudly
    import pytest as _pytest

    args = common.base_parser("t").parse_args([
        "--config", cfg, "--output_dir", str(tmp_path / "out_none"),
        "--fp32", "--synthetic_data", "--max_steps", "2", "--seed", "0",
        "--evaluate_only"])
    with _pytest.raises(FileNotFoundError):
        run_cls.main(args)


def test_alpro_runner(tmp_path):
    from youku_mplug_tpu.cli import run_alpro

    bert_over = {"vocab_size": 256, "hidden_size": 32,
                 "num_hidden_layers": 2, "num_attention_heads": 4,
                 "intermediate_size": 64, "encoder_width": 32,
                 "fusion_layer": 1, "hidden_dropout_prob": 0.0,
                 "attention_probs_dropout_prob": 0.0}
    cfg = write_cfg(tmp_path, "alpro", bert_overrides=bert_over,
                    embed_dim=8, num_classes=3)

    # pretrain: ITA + hard-neg ITM + MLM, finite losses
    args = run_alpro.parser().parse_args([
        "--config", cfg, "--output_dir", str(tmp_path / "out_pt"),
        "--fp32", "--synthetic_data", "--max_steps", "2", "--seed", "0",
        "--task", "pretrain"])
    state, _ = run_alpro.main(args)
    log = [json.loads(l) for l in open(tmp_path / "out_pt" / "log.txt")]
    assert np.isfinite(log[0]["loss"])
    assert log[0]["loss_ita"] > 0 and log[0]["loss_mlm"] > 0

    # cls finetune + eval
    args = run_alpro.parser().parse_args([
        "--config", cfg, "--output_dir", str(tmp_path / "out_cls"),
        "--fp32", "--synthetic_data", "--max_steps", "2", "--seed", "0",
        "--task", "cls"])
    _, res = run_alpro.main(args)
    assert 0 <= res["top1"] <= 100

    # retrieval finetune + sim-matrix eval
    args = run_alpro.parser().parse_args([
        "--config", cfg, "--output_dir", str(tmp_path / "out_ret"),
        "--fp32", "--synthetic_data", "--max_steps", "2", "--seed", "0",
        "--task", "retrieval"])
    _, res = run_alpro.main(args)
    assert "r_mean" in res


def test_serve_runner(tmp_path):
    """Continuous-batching serving CLI: synthetic videos stream through the
    engine; every request must finish with tokens and a latency."""
    from youku_mplug_tpu.cli import serve

    cfg = write_cfg(tmp_path, "serve", prompt="", max_new_tokens=4)
    args = serve.serve_parser().parse_args([
        "--config", cfg, "--output_dir", str(tmp_path / "out"),
        "--fp32", "--synthetic_data", "--seed", "0",
        "--num_requests", "5", "--num_slots", "2"])
    stats = serve.main(args)
    assert stats["requests"] == 5
    results = json.load(open(tmp_path / "out" / "serve_results.json"))
    assert len(results) == 5
    assert all(r["n_tokens"] > 0 for r in results)
    assert stats["tokens_per_sec"] > 0


def test_serve_runner_speculative(tmp_path):
    """--speculative k: lock-step speculative decoding with a
    truncated-depth twin draft; same request/latency contract."""
    from youku_mplug_tpu.cli import serve

    cfg = write_cfg(tmp_path, "serve_spec", prompt="", max_new_tokens=4)
    args = serve.serve_parser().parse_args([
        "--config", cfg, "--output_dir", str(tmp_path / "out"),
        "--fp32", "--synthetic_data", "--seed", "0",
        "--num_requests", "4", "--num_slots", "2",
        "--speculative", "2", "--draft_layers", "1"])
    stats = serve.main(args)
    assert stats["requests"] == 4
    assert stats["speculative_k"] == 2
    assert stats["tokens_per_round"] is None or \
        stats["tokens_per_round"] >= 1.0
    results = json.load(open(tmp_path / "out" / "serve_results.json"))
    assert len(results) == 4
    assert all(r["n_tokens"] > 0 for r in results)


def test_serve_runner_ngram_speculative(tmp_path):
    """--speculative k --draft ngram: draft-free prompt-lookup decoding;
    same request contract, no draft model built at all."""
    from youku_mplug_tpu.cli import serve

    cfg = write_cfg(tmp_path, "serve_ngram", prompt="", max_new_tokens=4)
    args = serve.serve_parser().parse_args([
        "--config", cfg, "--output_dir", str(tmp_path / "out"),
        "--fp32", "--synthetic_data", "--seed", "0",
        "--num_requests", "4", "--num_slots", "2",
        "--speculative", "3", "--draft", "ngram", "--ngram_n", "2"])
    stats = serve.main(args)
    assert stats["requests"] == 4
    assert stats["draft"] == "ngram" and stats["draft_layers"] == 0
    assert stats["tokens_per_round"] is None or \
        stats["tokens_per_round"] >= 1.0
    results = json.load(open(tmp_path / "out" / "serve_results.json"))
    assert len(results) == 4
    assert all(r["n_tokens"] > 0 for r in results)

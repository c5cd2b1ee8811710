"""mPLUG-Owl video instruction path: splice contract, abstractor,
instruct loss, end-to-end generate on the 8-device CPU mesh, CLI smoke.

Reference capability: README.md:111-148 (mPLUG-Video BloomZ-7B video
instruction inference via the external mPLUG-Owl repo).
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from youku_mplug_tpu.data.instruct import (
    VIDEO_PLACEHOLDER,
    WhitespaceTokenizer,
    build_instruct_batch,
    expand_video_prompt,
    format_prompt,
)
from youku_mplug_tpu.models.bloom import BloomConfig
from youku_mplug_tpu.models.owl import (
    MPLUGOwlVideo,
    MPLUGOwlVideoConfig,
    OwlAbstractorConfig,
    generate_instruct,
    instruct_targets,
    splice_media,
)
from youku_mplug_tpu.models.vision import VisionConfig
from youku_mplug_tpu.runtime.precision import FP32_POLICY

V = 128
NQ = 4
NM = NQ + 1  # num_media_tokens: queries + the vit_eos token


def tiny_cfg():
    return MPLUGOwlVideoConfig(
        vision=VisionConfig(img_size=16, patch_size=8, embed_dim=32,
                            depth=1, num_heads=4, num_frames=2,
                            attn_impl="xla", clip_model=True),
        abstractor=OwlAbstractorConfig(
            hidden_size=32, num_layers=2, num_heads=4,
            intermediate_size=64, num_queries=NQ, max_frames=8),
        text=BloomConfig(vocab_size=V, hidden_size=32,
                         num_hidden_layers=2, num_attention_heads=4,
                         attn_impl="xla", decode_attn_impl="gather"))


def test_splice_media_order():
    tok = jnp.arange(2 * 7 * 3, dtype=jnp.float32).reshape(2, 7, 3)
    qf = -(jnp.arange(2 * NQ * 3, dtype=jnp.float32).reshape(2, NQ, 3) + 1)
    media = jnp.asarray([[0, 1, 1, 1, 1, 0, 0],
                         [1, 1, 1, 1, 0, 0, 0]], jnp.int32)
    out = splice_media(tok, qf, media)
    # k-th media position gets the k-th query row
    np.testing.assert_array_equal(np.asarray(out[0, 1:5]),
                                  np.asarray(qf[0]))
    np.testing.assert_array_equal(np.asarray(out[1, :4]),
                                  np.asarray(qf[1]))
    # non-media positions untouched
    np.testing.assert_array_equal(np.asarray(out[0, 0]),
                                  np.asarray(tok[0, 0]))
    np.testing.assert_array_equal(np.asarray(out[0, 5:]),
                                  np.asarray(tok[0, 5:]))


def test_expand_and_batch():
    tk = WhitespaceTokenizer(V)
    prompt = format_prompt("what is happening ?")
    assert VIDEO_PLACEHOLDER in prompt
    ids, media = expand_video_prompt(prompt, tk, NQ)
    assert sum(media) == NQ
    assert len(ids) == len(media)
    # media positions are contiguous and in prompt order
    first = media.index(1)
    assert media[first:first + NQ] == [1] * NQ

    batch = build_instruct_batch(
        [prompt, format_prompt("a much longer question about the video "
                               "with more words")], tk, NQ, pad_id=3)
    assert batch["input_ids"].shape == batch["media_mask"].shape
    assert (batch["media_mask"].sum(axis=1) == NQ).all()
    assert (batch["prompt_len"]
            <= batch["input_ids"].shape[1]).all()
    with pytest.raises(ValueError):
        build_instruct_batch(["no placeholder"], tk, NQ, pad_id=3)


def test_instruct_targets_masks_prompt_and_media():
    ids = jnp.asarray([[5, 0, 0, 7, 8, 9, 2, 3]])
    attn = jnp.asarray([[1, 1, 1, 1, 1, 1, 1, 0]])
    media = jnp.asarray([[0, 1, 1, 0, 0, 0, 0, 0]])
    prompt = jnp.asarray([[1, 1, 1, 1, 0, 0, 0, 0]])  # instruction part
    labels, mask = instruct_targets(ids, attn, media, prompt)
    np.testing.assert_array_equal(np.asarray(labels[0, :7]),
                                  np.asarray(ids[0, 1:]))
    # loss only where the TARGET is a response token: targets at
    # positions 4,5,6 (values 8,9,2) -> mask indices 3,4,5
    np.testing.assert_array_equal(np.asarray(mask[0]),
                                  [0, 0, 0, 1, 1, 1, 0])


def test_instruct_train_batch_masks():
    """build_instruct_train_batch: prompt span (media included) masked
    out, answer+eos supervised, right padding, answer truncation."""
    from youku_mplug_tpu.data.instruct import build_instruct_train_batch

    tk = WhitespaceTokenizer(V)
    b = build_instruct_train_batch(
        [("what is this ?", "a small cat"),
         ("describe the video please now", "dog")],
        tk, NM, pad_id=3, eos_id=2)
    ids, attn = b["input_ids"], b["attention_mask"]
    media, prompt = b["media_mask"], b["prompt_mask"]
    assert ids.shape == attn.shape == media.shape == prompt.shape
    assert (media.sum(axis=1) == NM).all()
    for i in range(2):
        n = attn[i].sum()
        # prompt strictly precedes answer; answer ends with eos
        p_end = prompt[i].nonzero()[0].max() + 1
        assert prompt[i, :p_end].all() and not prompt[i, p_end:].any()
        assert p_end < n
        assert ids[i, n - 1] == 2          # eos supervised
        assert (ids[i, n:] == 3).all()     # right pad
        # media positions sit inside the prompt span
        assert media[i, p_end:].sum() == 0
    # loss mask derived the model's way supervises only answer tokens
    labels, mask = instruct_targets(
        jnp.asarray(ids), jnp.asarray(attn), jnp.asarray(media),
        jnp.asarray(prompt))
    m = np.asarray(mask)
    for i in range(2):
        n = int(attn[i].sum())
        p_end = int(prompt[i].nonzero()[0].max() + 1)
        # targets p_end..n-1 (the answer incl. eos) -> mask idx p_end-1..
        assert m[i, p_end - 1:n - 1].all()
        assert not m[i, :p_end - 1].any()
        assert not m[i, n - 1:].any()

    # truncation: answers clipped (never the prompt), eos kept
    p_ids, _ = expand_video_prompt(format_prompt("what is this ?"), tk,
                                   NM)
    cap = len(p_ids) + 3  # room for 2 answer tokens + eos
    bt = build_instruct_train_batch(
        [("what is this ?", "a very long answer with many words here")],
        tk, NM, pad_id=3, eos_id=2, max_length=cap)
    n = bt["attention_mask"][0].sum()
    assert n == cap and bt["input_ids"][0, n - 1] == 2
    assert bt["prompt_mask"][0].sum() == len(p_ids)  # prompt intact
    # a pre-formatted prompt with the wrong number of placeholders fails
    with pytest.raises(ValueError):
        build_instruct_train_batch(
            [(format_prompt("q") + " " + VIDEO_PLACEHOLDER, "x")],
            tk, NM, pad_id=3, eos_id=2)


@pytest.fixture(scope="module")
def owl_setup():
    from youku_mplug_tpu.parallel.sharding import (
        BLOOM_SHARDING_RULES,
        shard_params,
    )
    from youku_mplug_tpu.runtime.mesh import make_mesh

    cfg = tiny_cfg()
    mesh = make_mesh()
    model = MPLUGOwlVideo(cfg, policy=FP32_POLICY)
    tk = WhitespaceTokenizer(V)
    prompts = [format_prompt("what is this ?"),
               format_prompt("describe the longer video please")]
    assert cfg.num_media_tokens == NM
    batch = build_instruct_batch(prompts, tk, NM, pad_id=cfg.text.pad_id)
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.standard_normal((2, 3, 2, 16, 16)), jnp.float32)
    with jax.set_mesh(mesh):
        params = model.init(
            jax.random.key(0), video, jnp.asarray(batch["input_ids"]),
            jnp.ones_like(jnp.asarray(batch["input_ids"])),
            jnp.asarray(batch["media_mask"]),
            jnp.zeros_like(jnp.asarray(batch["input_ids"])))["params"]
        params = shard_params(params, mesh, BLOOM_SHARDING_RULES)
    return cfg, mesh, model, batch, video, params


def test_instruct_loss_and_grads(owl_setup):
    cfg, mesh, model, batch, video, params = owl_setup
    ids = jnp.asarray(batch["input_ids"])
    attn = (ids != cfg.text.pad_id).astype(jnp.int32)
    media = jnp.asarray(batch["media_mask"])
    # treat everything before the last 3 tokens as prompt
    ln = jnp.asarray(batch["prompt_len"])
    pos = jnp.arange(ids.shape[1])[None]
    prompt_mask = (pos < (ln - 3)[:, None]).astype(jnp.int32)

    def loss_fn(p):
        return model.apply({"params": p}, video, ids, attn, media,
                           prompt_mask)["loss"]

    with jax.set_mesh(mesh):
        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss)) and float(loss) > 0
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # the supervised path must touch the abstractor
    gq = grads["abstractor"]["query_embeds"]
    assert float(jnp.abs(gq).sum()) > 0


def test_generate_instruct_e2e(owl_setup):
    cfg, mesh, model, batch, video, params = owl_setup
    from youku_mplug_tpu.models.generation import GenerationConfig

    gcfg = GenerationConfig(max_new_tokens=4, eos_id=cfg.text.eos_id,
                            pad_id=cfg.text.pad_id, beam_size=1)
    with jax.set_mesh(mesh):
        out = generate_instruct(
            model, params, video, jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["media_mask"]),
            jnp.asarray(batch["prompt_len"]), gcfg)
        out2 = generate_instruct(
            model, params, video, jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["media_mask"]),
            jnp.asarray(batch["prompt_len"]), gcfg)
    seqs = np.asarray(out["sequences"])
    assert seqs.shape == (2, 4)
    assert ((seqs >= 0) & (seqs < V)).all()
    # greedy decode is deterministic
    np.testing.assert_array_equal(seqs, np.asarray(out2["sequences"]))

    # the video must actually reach the LM: different videos must
    # produce different next-token logits over the spliced prefix
    ids = jnp.asarray(batch["input_ids"])
    media = jnp.asarray(batch["media_mask"])

    def prefix_logits(vid):
        qf = model.apply({"params": params}, vid,
                         method=MPLUGOwlVideo.encode_video)
        emb = model.apply({"params": params}, ids, media, qf,
                          method=MPLUGOwlVideo.spliced_embeds)
        from youku_mplug_tpu.models.bloom import BloomLM

        dec = BloomLM(cfg.text, policy=FP32_POLICY)
        out = dec.apply({"params": params["text_decoder"]},
                        input_embeds=emb, return_logits=True)
        return np.asarray(out["logits"])

    with jax.set_mesh(mesh):
        la = prefix_logits(video)
        lb = prefix_logits(video * -1.0 + 0.5)
    assert np.abs(la - lb).max() > 1e-6


def test_engine_serving_matches_generate(owl_setup):
    """The continuous-batching engine (prompt_embeds submission — the
    deployment path, run_instruct --engine) must produce token-identical
    greedy output to the lock-step batched generate, with and without
    prompt-lookup speculative steps."""
    cfg, mesh, model, batch, video, params = owl_setup
    from youku_mplug_tpu.cli.run_instruct import serve_instruct
    from youku_mplug_tpu.models.generation import GenerationConfig

    gcfg = GenerationConfig(max_new_tokens=5, eos_id=cfg.text.eos_id,
                            pad_id=cfg.text.pad_id, beam_size=1)
    with jax.set_mesh(mesh):
        want = np.asarray(generate_instruct(
            model, params, video, jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["media_mask"]),
            jnp.asarray(batch["prompt_len"]), gcfg)["sequences"])
        got = serve_instruct(model, params, video, batch, gcfg,
                             num_slots=2)
        got_lk = serve_instruct(model, params, video, batch, gcfg,
                                num_slots=2, lookup_k=3)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got_lk, want)


def test_instruct_finetune_e2e(tmp_path):
    """--train mode: response-masked finetune on synthetic video/QA with
    frozen Bloom + LoRA, loss drops over steps, checkpoints land, and a
    second invocation resumes past training (reference README.md:111-133
    — the mPLUG-Owl finetune recipe)."""
    import yaml

    from youku_mplug_tpu.cli import run_instruct

    cfg_yaml = {
        "text_overrides": {
            "vocab_size": V, "hidden_size": 32, "num_hidden_layers": 2,
            "num_attention_heads": 4, "attn_impl": "xla",
            "decode_attn_impl": "gather", "lora_rank": 2},
        "vision_overrides": {
            "img_size": 16, "patch_size": 8, "embed_dim": 32, "depth": 1,
            "num_heads": 4, "num_frames": 2, "attn_impl": "xla",
            "clip_model": True},
        "abstractor": {
            "hidden_size": 32, "num_layers": 1, "num_heads": 4,
            "intermediate_size": 64, "num_queries": NQ, "max_frames": 8},
        "num_frames": 2, "image_res": 16, "batch_size": 8, "epochs": 2,
        "synthetic_length": 16, "num_workers": 1,
        "optimizer": {"lr": 0.01, "warmup_steps": 1, "clip_grad": 1.0},
    }
    cfg_path = tmp_path / "owl_train.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg_yaml))
    out_dir = tmp_path / "out"
    args = run_instruct.parser().parse_args([
        "--config", str(cfg_path), "--output_dir", str(out_dir),
        "--synthetic_data", "--train", "--fp32", "--log_freq", "1"])
    runner = run_instruct.main(args)
    assert int(runner.state.step) == 4  # 2 epochs x 2 steps

    log = [json.loads(ln) for ln in
           open(out_dir / "log.txt").read().splitlines()]
    assert len(log) == 2
    assert all(np.isfinite(e["loss"]) for e in log)
    assert log[-1]["loss"] < log[0]["loss"]  # synthetic QA is learnable
    assert log[-1]["skipped_nonfinite"] == 0

    # frozen-Bloom contract: base decoder weights untouched, LoRA +
    # abstractor trained
    assert "text_decoder" in runner.state.frozen
    flat_trainable = jax.tree_util.tree_leaves_with_path(
        runner.state.trainable)
    paths = ["/".join(str(getattr(k, "key", k)) for k in p)
             for p, _ in flat_trainable]
    assert any("lora_" in p for p in paths)
    assert any(p.startswith("abstractor") for p in paths)
    assert not any("qkv_kernel" in p and "text_decoder" in p
                   for p in paths)

    # orbax checkpoint + resume-with-nothing-left-to-train
    ckpts = os.listdir(out_dir / "checkpoints")
    assert len(ckpts) >= 1
    runner2 = run_instruct.main(args)
    assert int(runner2.state.step) == 4
    assert runner2.start_epoch == 2

    # ---- export -> serve loop (tools/export_serving.py --owl) --------
    # LoRA merges into the Bloom base, optional int8; run_instruct
    # --serving_ckpt loads the exported artifact and the engine path
    # stays token-identical to batched generate.
    import sys as _sys

    from tools import export_serving

    argv = _sys.argv
    try:
        for dest, extra in ((str(tmp_path / "srv_bf16"), []),
                            (str(tmp_path / "srv_int8"), ["--int8"])):
            _sys.argv = ["x", "--run_dir", str(out_dir), "--config",
                         str(cfg_path), "--dest", dest, "--owl"] + extra
            export_serving.main()
    finally:
        _sys.argv = argv

    def infer(extra):
        a = run_instruct.parser().parse_args([
            "--config", str(cfg_path), "--output_dir",
            str(tmp_path / "srv_out"), "--synthetic_data", "--question",
            "what is shown ?", "--fp32", "--max_new_tokens", "4"] + extra)
        return run_instruct.main(a)

    bf = infer(["--serving_ckpt", str(tmp_path / "srv_bf16")])
    i8 = infer(["--serving_ckpt", str(tmp_path / "srv_int8")])
    bf_e = infer(["--serving_ckpt", str(tmp_path / "srv_bf16"),
                  "--engine"])
    assert bf[0]["answer"] and i8[0]["answer"]
    assert bf_e[0]["answer"] == bf[0]["answer"]  # engine == generate


def test_run_instruct_cli_smoke(tmp_path):
    from youku_mplug_tpu.cli import run_instruct

    cfg_yaml = {
        "text_overrides": {
            "vocab_size": V, "hidden_size": 32, "num_hidden_layers": 2,
            "num_attention_heads": 4, "attn_impl": "xla",
            "decode_attn_impl": "gather"},
        "vision_overrides": {
            "img_size": 16, "patch_size": 8, "embed_dim": 32, "depth": 1,
            "num_heads": 4, "num_frames": 2, "attn_impl": "xla",
            "clip_model": True},
        "abstractor": {
            "hidden_size": 32, "num_layers": 2, "num_heads": 4,
            "intermediate_size": 64, "num_queries": NQ, "max_frames": 8},
        "num_frames": 2, "image_res": 16, "max_new_tokens": 3,
    }
    cfg_path = tmp_path / "owl.yaml"
    import yaml

    cfg_path.write_text(yaml.safe_dump(cfg_yaml))
    args = run_instruct.parser().parse_args([
        "--config", str(cfg_path), "--output_dir", str(tmp_path / "out"),
        "--synthetic_data", "--question", "what happens ?", "--fp32"])
    results = run_instruct.main(args)
    assert len(results) == 1 and "answer" in results[0]
    saved = json.load(open(tmp_path / "out" / "instruct_results.json"))
    assert saved[0]["answer"] == results[0]["answer"]

"""Owl abstractor checkpoint import: deterministic, bit-exact, fail-loud.

The external mPLUG-Owl checkpoint (reference README.md:111-148,
``MAGAer13/mplug-youku-bloomz-7b``) stores the visual abstractor as a
``MplugOwlVisualAbstractor*`` module tree.  These tests synthesize a
checkpoint in that exact naming, round-trip it through
``importers.import_owl`` / ``owl_abstractor_params_from_torch``, and pin

- bit-exact tensor placement (kernels transposed, norms to scale/bias),
- naming-drift fallback (q_proj/fc1-style names still map),
- FAIL-LOUD behavior: any unconsumed abstractor tensor raises instead of
  leaving the abstractor at random init (the silent-noise failure mode).
"""

import numpy as np
import pytest

from youku_mplug_tpu.models.bloom import BloomConfig
from youku_mplug_tpu.models.importers import (
    import_owl,
    owl_abstractor_params_from_torch,
)
from youku_mplug_tpu.models.owl import (
    MPLUGOwlVideo,
    MPLUGOwlVideoConfig,
    OwlAbstractorConfig,
)
from youku_mplug_tpu.models.vision import VisionConfig
from youku_mplug_tpu.runtime.precision import FP32_POLICY

D = 32       # abstractor hidden
F = 64       # abstractor intermediate
NL = 2       # abstractor layers
NQ = 4
HTXT = 32    # text hidden
DV = 32      # vision embed dim
TMAX = 8


def owl_cfg():
    return MPLUGOwlVideoConfig(
        vision=VisionConfig(img_size=16, patch_size=8, embed_dim=DV,
                            depth=1, num_heads=4, num_frames=2,
                            attn_impl="xla", clip_model=True),
        abstractor=OwlAbstractorConfig(
            hidden_size=D, num_layers=NL, num_heads=4,
            intermediate_size=F, num_queries=NQ, max_frames=TMAX),
        text=BloomConfig(vocab_size=64, hidden_size=HTXT,
                         num_hidden_layers=1, num_attention_heads=4,
                         attn_impl="xla", decode_attn_impl="gather"))


def external_abstractor_sd(rng, t_frames=TMAX):
    """A state dict in the external MplugOwlVisualAbstractor naming
    (keys WITHOUT the top-level 'abstractor.' prefix, as
    owl_abstractor_params_from_torch receives them)."""
    sd = {}
    r = lambda *s: rng.standard_normal(s).astype(np.float32)  # noqa: E731
    sd["query_tokens"] = r(1, NQ, D)
    for i in range(NL):
        p = f"encoder.layers.{i}.crossattention."
        for nrm in ("norm1", "normk"):
            sd[p + nrm + ".weight"] = r(D)
            sd[p + nrm + ".bias"] = r(D)
        for proj in ("query", "key", "value"):
            sd[p + "attention." + proj + ".weight"] = r(D, D)
            sd[p + "attention." + proj + ".bias"] = r(D)
        sd[p + "output.out_proj.weight"] = r(D, D)
        sd[p + "output.out_proj.bias"] = r(D)
        sd[p + "output.norm2.weight"] = r(D)
        sd[p + "output.norm2.bias"] = r(D)
        for w, shp in (("w1", (F, D)), ("w2", (D, F)), ("w3", (F, D))):
            sd[p + "output.mlp." + w + ".weight"] = r(*shp)
            sd[p + "output.mlp." + w + ".bias"] = r(shp[0])
        sd[p + "output.mlp.ffn_ln.weight"] = r(F)
        sd[p + "output.mlp.ffn_ln.bias"] = r(F)
    sd["visual_fc.weight"] = r(HTXT, D)
    sd["visual_fc.bias"] = r(HTXT)
    sd["vit_eos"] = r(1, 1, HTXT)
    sd["temporal_position_embeddings"] = r(t_frames, DV)
    return sd


def test_mapper_bit_exact(rng):
    cfg = owl_cfg()
    sd = external_abstractor_sd(rng)
    out = owl_abstractor_params_from_torch(sd, cfg.abstractor)

    ab = out["abstractor"]
    np.testing.assert_array_equal(ab["query_embeds"], sd["query_tokens"])
    np.testing.assert_array_equal(
        ab["temporal_embed"], sd["temporal_position_embeddings"])
    np.testing.assert_array_equal(
        out["visual_fc"]["kernel"], sd["visual_fc.weight"].T)
    np.testing.assert_array_equal(
        out["visual_fc"]["bias"], sd["visual_fc.bias"])
    np.testing.assert_array_equal(out["vit_eos"], sd["vit_eos"])
    for i in range(NL):
        p = f"encoder.layers.{i}.crossattention."
        lt = ab[f"layers_{i}"]
        np.testing.assert_array_equal(
            lt["q_kernel"], sd[p + "attention.query.weight"].T)
        np.testing.assert_array_equal(
            lt["k_bias"], sd[p + "attention.key.bias"])
        np.testing.assert_array_equal(
            lt["v_kernel"], sd[p + "attention.value.weight"].T)
        np.testing.assert_array_equal(
            lt["out_kernel"], sd[p + "output.out_proj.weight"].T)
        np.testing.assert_array_equal(
            lt["norm_q"]["scale"], sd[p + "norm1.weight"])
        np.testing.assert_array_equal(
            lt["norm_kv"]["bias"], sd[p + "normk.bias"])
        np.testing.assert_array_equal(
            lt["norm_mlp"]["scale"], sd[p + "output.norm2.weight"])
        np.testing.assert_array_equal(
            lt["mlp"]["w1_kernel"], sd[p + "output.mlp.w1.weight"].T)
        np.testing.assert_array_equal(
            lt["mlp"]["w2_kernel"], sd[p + "output.mlp.w2.weight"].T)
        np.testing.assert_array_equal(
            lt["mlp"]["w3_bias"], sd[p + "output.mlp.w3.bias"])
        np.testing.assert_array_equal(
            lt["mlp"]["ffn_ln"]["scale"],
            sd[p + "output.mlp.ffn_ln.weight"])


def test_temporal_embed_resized(rng):
    cfg = owl_cfg()
    sd = external_abstractor_sd(rng, t_frames=4)  # checkpoint has 4 frames
    out = owl_abstractor_params_from_torch(sd, cfg.abstractor)
    assert out["abstractor"]["temporal_embed"].shape == (TMAX, DV)


def test_fallback_naming_drift(rng):
    """q_proj/fc1-style names (naming drift across releases) map through
    the keyword classifier to the same targets."""
    cfg = owl_cfg()
    r = lambda *s: rng.standard_normal(s).astype(np.float32)  # noqa: E731
    wq = r(D, D)
    w1 = r(F, D)
    sd = {
        "encoder.layers.0.crossattention.attention.q_proj.weight": wq,
        "encoder.layers.0.crossattention.output.mlp.fc1.weight": w1,
    }
    out = owl_abstractor_params_from_torch(sd, cfg.abstractor)
    lt = out["abstractor"]["layers_0"]
    np.testing.assert_array_equal(lt["q_kernel"], wq.T)
    np.testing.assert_array_equal(lt["mlp"]["w1_kernel"], w1.T)


def test_unconsumed_tensor_raises(rng):
    cfg = owl_cfg()
    sd = external_abstractor_sd(rng)
    sd["encoder.layers.0.crossattention.mystery_block.weight"] = (
        rng.standard_normal((D, D)).astype(np.float32))
    with pytest.raises(ValueError, match="no mapping"):
        owl_abstractor_params_from_torch(sd, cfg.abstractor)
    sd2 = {"totally_unknown.weight":
           rng.standard_normal((3, 3)).astype(np.float32)}
    with pytest.raises(ValueError, match="no mapping"):
        owl_abstractor_params_from_torch(sd2, cfg.abstractor)


def test_layer_out_of_range_raises(rng):
    cfg = owl_cfg()
    sd = {f"encoder.layers.{NL}.crossattention.norm1.weight":
          rng.standard_normal(D).astype(np.float32)}
    with pytest.raises(ValueError, match="num_layers"):
        owl_abstractor_params_from_torch(sd, cfg.abstractor)


def external_vision_sd(rng, depth=1, dim=DV, patches=4):
    """MplugOwlVisionModel (megatron-style) naming at tiny shape."""
    r = lambda *s: rng.standard_normal(s).astype(np.float32)  # noqa: E731
    sd = {
        "embeddings.cls_token": r(1, 1, dim),
        "embeddings.position_embedding": r(1, patches + 1, dim),
        "embeddings.patch_embed.weight": r(dim, 3, 8, 8),
        "embeddings.pre_layernorm.weight": r(dim),
        "embeddings.pre_layernorm.bias": r(dim),
        "post_layernorm.weight": r(dim),
        "post_layernorm.bias": r(dim),
    }
    for i in range(depth):
        p = f"encoder.layers.{i}."
        sd[p + "input_layernorm.weight"] = r(dim)
        sd[p + "input_layernorm.bias"] = r(dim)
        sd[p + "post_attention_layernorm.weight"] = r(dim)
        sd[p + "post_attention_layernorm.bias"] = r(dim)
        sd[p + "self_attn.query_key_value.weight"] = r(3 * dim, dim)
        sd[p + "self_attn.query_key_value.bias"] = r(3 * dim)
        sd[p + "self_attn.dense.weight"] = r(dim, dim)
        sd[p + "self_attn.dense.bias"] = r(dim)
        f = 4 * dim  # VisionConfig mlp_ratio=4 default
        sd[p + "mlp.fc1.weight"] = r(f, dim)
        sd[p + "mlp.fc1.bias"] = r(f)
        sd[p + "mlp.fc2.weight"] = r(dim, f)
        sd[p + "mlp.fc2.bias"] = r(dim)
    return sd


def test_owl_vision_mapper(rng):
    """External megatron-style vision tensors land bit-exactly: fused
    head-major qkv de-interleaved, k-bias dropped (inert), conv patch
    kernel flattened, layernorms to scale/bias."""
    from youku_mplug_tpu.models.importers import (
        owl_vision_params_from_torch,
    )

    cfg = owl_cfg().vision
    n, d = cfg.num_heads, cfg.embed_dim // cfg.num_heads
    sd = external_vision_sd(rng)
    out = owl_vision_params_from_torch(sd, cfg)

    w = sd["encoder.layers.0.self_attn.query_key_value.weight"]
    want_qkv = w.T.reshape(DV, n, 3, d).transpose(0, 2, 1, 3)
    np.testing.assert_array_equal(
        out["blocks_0"]["attn"]["qkv_kernel"], want_qkv)
    b = sd["encoder.layers.0.self_attn.query_key_value.bias"
           ].reshape(n, 3, d)
    np.testing.assert_array_equal(out["blocks_0"]["attn"]["q_bias"],
                                  b[:, 0])
    np.testing.assert_array_equal(out["blocks_0"]["attn"]["v_bias"],
                                  b[:, 2])
    np.testing.assert_array_equal(
        out["blocks_0"]["attn"]["proj_kernel"],
        sd["encoder.layers.0.self_attn.dense.weight"].T.reshape(n, d, DV))
    np.testing.assert_array_equal(
        out["blocks_0"]["norm1"]["scale"],
        sd["encoder.layers.0.input_layernorm.weight"])
    np.testing.assert_array_equal(
        out["blocks_0"]["mlp"]["fc1_kernel"],
        sd["encoder.layers.0.mlp.fc1.weight"].T)
    pw = sd["embeddings.patch_embed.weight"]
    np.testing.assert_array_equal(
        out["patch_embed"]["kernel"], pw.reshape(DV, -1).T)
    np.testing.assert_array_equal(out["norm"]["scale"],
                                  sd["post_layernorm.weight"])
    np.testing.assert_array_equal(out["norm_pre"]["bias"],
                                  sd["embeddings.pre_layernorm.bias"])

    # fail-loud on unknown vision tensors
    sd["encoder.layers.0.mystery.weight"] = np.zeros((2,), np.float32)
    with pytest.raises(ValueError, match="no mapping"):
        owl_vision_params_from_torch(sd, cfg)


def test_import_owl_external_vision_forward(rng, tmp_path):
    """A checkpoint with external-style vision + abstractor imports
    through import_owl and the imported vision tower runs finitely."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    cfg = owl_cfg()
    model = MPLUGOwlVideo(cfg, policy=FP32_POLICY)
    B, S, T = 1, 8, 2
    video = jnp.zeros((B, 3, T, 16, 16), jnp.float32)
    ids = jnp.ones((B, S), jnp.int32)
    media = jnp.zeros((B, S), jnp.int32).at[:, 1:1 + cfg.num_media_tokens
                                            ].set(1)
    params = model.init(jax.random.key(0), video, ids,
                        jnp.ones_like(ids), media,
                        jnp.zeros_like(ids))["params"]

    sd = {("abstractor." + k if not k.startswith("query_tokens") else k):
          v for k, v in external_abstractor_sd(rng).items()}
    sd.update({"vision_model." + k: v
               for k, v in external_vision_sd(rng).items()})
    torch.save({k: torch.from_numpy(np.asarray(v))
                for k, v in sd.items()},
               tmp_path / "pytorch_model.bin")
    imported = import_owl(params, cfg, str(tmp_path))

    np.testing.assert_array_equal(
        np.asarray(imported["visual_encoder"]["cls_token"]),
        sd["vision_model.embeddings.cls_token"])
    qf = model.apply({"params": imported}, video,
                     method=MPLUGOwlVideo.encode_video)
    assert np.isfinite(np.asarray(qf)).all()

    # a vision tensor set missing a required param refuses to import
    sd.pop("vision_model.encoder.layers.0.mlp.fc2.weight")
    torch.save({k: torch.from_numpy(np.asarray(v))
                for k, v in sd.items()},
               tmp_path / "pytorch_model.bin")
    with pytest.raises(ValueError):
        import_owl(params, cfg, str(tmp_path))


def test_owl_import_full_shape(rng):
    """Production geometry for the round-5 mappers: ViT-L/14 (1024 dim,
    16 heads, 257 positions) + the real abstractor (1024/2816, 64
    queries, 6 layers -> 2 here for speed; layers are homogeneous) with
    pos-embed identity at matching grid and resize from a 197-position
    (16x16-patch) checkpoint.  Catches geometry bugs tiny shapes hide
    (head de-interleave at n=16, 3*1024 fused rows, 2816 ffn_ln)."""
    from youku_mplug_tpu.models.importers import (
        owl_abstractor_params_from_torch,
        owl_vision_params_from_torch,
    )
    from youku_mplug_tpu.models.vision import VisionConfig

    vis_cfg = VisionConfig(img_size=224, patch_size=14, embed_dim=1024,
                           depth=2, num_heads=16, clip_model=True,
                           attn_impl="xla")
    n, d = 16, 64
    sd = external_vision_sd(rng, depth=2, dim=1024,
                            patches=vis_cfg.num_patches)
    sd["embeddings.patch_embed.weight"] = rng.standard_normal(
        (1024, 3, 14, 14)).astype(np.float32)
    out = owl_vision_params_from_torch(sd, vis_cfg)
    assert out["blocks_1"]["attn"]["qkv_kernel"].shape == (1024, 3, n, d)
    assert out["pos_embed"].shape == (1, vis_cfg.num_patches + 1, 1024)
    assert out["patch_embed"]["kernel"].shape == (3 * 14 * 14, 1024)
    w = sd["encoder.layers.1.self_attn.query_key_value.weight"]
    np.testing.assert_array_equal(
        out["blocks_1"]["attn"]["qkv_kernel"],
        w.T.reshape(1024, n, 3, d).transpose(0, 2, 1, 3))

    # checkpoint at a DIFFERENT patch grid: bilinear pos-embed resize
    sd197 = dict(sd)
    sd197["embeddings.position_embedding"] = rng.standard_normal(
        (1, 197, 1024)).astype(np.float32)  # 14x14 grid + cls
    out197 = owl_vision_params_from_torch(sd197, vis_cfg)
    assert out197["pos_embed"].shape == (1, vis_cfg.num_patches + 1,
                                         1024)

    # production abstractor geometry (1024/2816/16h/64q)
    acfg = OwlAbstractorConfig(hidden_size=1024, num_layers=2,
                               num_heads=16, intermediate_size=2816,
                               num_queries=64, max_frames=32)
    asd = {}
    r = lambda *s: rng.standard_normal(s).astype(np.float32)  # noqa: E731
    asd["query_tokens"] = r(1, 64, 1024)
    for i in range(2):
        p = f"encoder.layers.{i}.crossattention."
        for nrm in ("norm1", "normk"):
            asd[p + nrm + ".weight"] = r(1024)
            asd[p + nrm + ".bias"] = r(1024)
        for proj in ("query", "key", "value"):
            asd[p + "attention." + proj + ".weight"] = r(1024, 1024)
            asd[p + "attention." + proj + ".bias"] = r(1024)
        asd[p + "output.out_proj.weight"] = r(1024, 1024)
        asd[p + "output.out_proj.bias"] = r(1024)
        asd[p + "output.norm2.weight"] = r(1024)
        asd[p + "output.norm2.bias"] = r(1024)
        for w_, shp in (("w1", (2816, 1024)), ("w2", (1024, 2816)),
                        ("w3", (2816, 1024))):
            asd[p + "output.mlp." + w_ + ".weight"] = r(*shp)
            asd[p + "output.mlp." + w_ + ".bias"] = r(shp[0])
        asd[p + "output.mlp.ffn_ln.weight"] = r(2816)
        asd[p + "output.mlp.ffn_ln.bias"] = r(2816)
    asd["visual_fc.weight"] = r(4096, 1024)  # bloomz-7b1 hidden
    asd["visual_fc.bias"] = r(4096)
    asd["vit_eos"] = r(1, 1, 4096)
    aout = owl_abstractor_params_from_torch(asd, acfg)
    lt = aout["abstractor"]["layers_1"]
    assert lt["mlp"]["w1_kernel"].shape == (1024, 2816)
    assert lt["mlp"]["ffn_ln"]["scale"].shape == (2816,)
    assert aout["visual_fc"]["kernel"].shape == (1024, 4096)
    np.testing.assert_array_equal(
        lt["q_kernel"],
        asd["encoder.layers.1.crossattention.attention.query.weight"].T)


def test_owl_vision_uses_quick_gelu(rng):
    """The external vision tower is CLIP-lineage (hidden_act =
    'quick_gelu'); the owl config must run x*sigmoid(1.702x), not
    standard GELU (max |Δ| ~2e-2 — far above the bf16 tanh/erf budget,
    so the wrong activation silently corrupts imported features)."""
    import jax
    import jax.numpy as jnp

    from youku_mplug_tpu.models.vision import Mlp

    assert MPLUGOwlVideoConfig().vision.gelu == "quick"  # class default
    # run_instruct's YAML loader applies the same default
    import yaml as _yaml

    from youku_mplug_tpu.cli.run_instruct import load_owl_config
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".yaml") as f:
        f.write(_yaml.safe_dump({"vision_overrides": {"img_size": 16,
                                                      "patch_size": 8}}))
        f.flush()
        loaded, _ = load_owl_config(f.name)
    assert loaded.vision.gelu == "quick"

    x = jnp.asarray(rng.standard_normal((2, 3, 8)).astype(np.float32))
    mlp = Mlp(8, 16, gelu="quick")
    p = mlp.init(jax.random.key(0), x)["params"]
    got = mlp.apply({"params": p}, x)
    h = x @ p["fc1_kernel"] + p["fc1_bias"]
    h = h * jax.nn.sigmoid(1.702 * h)  # QuickGELU
    want = h @ p["fc2_kernel"] + p["fc2_bias"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def external_bloom_sd(rng, cfg):
    """HF BloomModel naming at tiny shape (the language_model side of
    the external checkpoint; bloom_params_from_torch is oracle-exact,
    this just provides integration-test tensors)."""
    h, n, L = cfg.hidden_size, cfg.num_attention_heads, \
        cfg.num_hidden_layers
    r = lambda *s: rng.standard_normal(s).astype(np.float32)  # noqa: E731
    sd = {
        "word_embeddings.weight": r(cfg.vocab_size, h),
        "word_embeddings_layernorm.weight": r(h),
        "word_embeddings_layernorm.bias": r(h),
        "ln_f.weight": r(h),
        "ln_f.bias": r(h),
    }
    for i in range(L):
        t = f"h.{i}."
        sd[t + "input_layernorm.weight"] = r(h)
        sd[t + "input_layernorm.bias"] = r(h)
        sd[t + "post_attention_layernorm.weight"] = r(h)
        sd[t + "post_attention_layernorm.bias"] = r(h)
        sd[t + "self_attention.query_key_value.weight"] = r(3 * h, h)
        sd[t + "self_attention.query_key_value.bias"] = r(3 * h)
        sd[t + "self_attention.dense.weight"] = r(h, h)
        sd[t + "self_attention.dense.bias"] = r(h)
        sd[t + "mlp.dense_h_to_4h.weight"] = r(4 * h, h)
        sd[t + "mlp.dense_h_to_4h.bias"] = r(4 * h)
        sd[t + "mlp.dense_4h_to_h.weight"] = r(h, 4 * h)
        sd[t + "mlp.dense_4h_to_h.bias"] = r(h)
    return sd


def test_finetune_from_external_checkpoint(rng, tmp_path):
    """Capstone user journey: a FULL external-naming checkpoint (Bloom +
    vision + abstractor) imports into `run_instruct --train`, the frozen
    Bloom side carries the imported values through the trainable/frozen
    split, and a finetune epoch runs finitely on top."""
    torch = pytest.importorskip("torch")
    import yaml

    from youku_mplug_tpu.cli import run_instruct

    cfg = owl_cfg()
    sd = {("abstractor." + k if not k.startswith("query_tokens") else k):
          v for k, v in external_abstractor_sd(rng).items()}
    sd.update({"vision_model." + k: v
               for k, v in external_vision_sd(rng).items()})
    sd.update({"language_model.transformer." + k: v
               for k, v in external_bloom_sd(rng, cfg.text).items()})
    ckpt_dir = tmp_path / "hf"
    ckpt_dir.mkdir()
    torch.save({k: torch.from_numpy(np.asarray(v))
                for k, v in sd.items()},
               ckpt_dir / "pytorch_model.bin")

    cfg_yaml = {
        "text_overrides": {
            "vocab_size": 64, "hidden_size": HTXT,
            "num_hidden_layers": 1, "num_attention_heads": 4,
            "attn_impl": "xla", "decode_attn_impl": "gather",
            "lora_rank": 2},
        "vision_overrides": {
            "img_size": 16, "patch_size": 8, "embed_dim": DV, "depth": 1,
            "num_heads": 4, "num_frames": 2, "attn_impl": "xla",
            "clip_model": True},
        "abstractor": {
            "hidden_size": D, "num_layers": NL, "num_heads": 4,
            "intermediate_size": F, "num_queries": NQ, "max_frames": TMAX},
        "num_frames": 2, "image_res": 16, "batch_size": 8, "epochs": 1,
        "synthetic_length": 8, "num_workers": 1,
        "optimizer": {"lr": 0.001, "warmup_steps": 1},
    }
    cfg_path = tmp_path / "owl.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg_yaml))
    args = run_instruct.parser().parse_args([
        "--config", str(cfg_path), "--output_dir",
        str(tmp_path / "out"), "--synthetic_data", "--train", "--fp32",
        "--hf_checkpoint", str(ckpt_dir), "--log_freq", "1"])
    runner = run_instruct.main(args)
    assert int(runner.state.step) == 1

    # the imported (frozen) Bloom embedding carries the checkpoint
    # values through the trainable/frozen split, untouched by the step
    got = np.asarray(
        runner.state.frozen["text_decoder"]["word_embeddings"]
        ["embedding"], np.float32)
    np.testing.assert_allclose(
        got, sd["language_model.transformer.word_embeddings.weight"],
        rtol=1e-6)
    # the imported abstractor queries were the TRAIN starting point
    # (one warmup step at lr~0 leaves them ~unchanged; movement over
    # epochs is pinned by test_instruct_finetune_e2e's loss-drop)
    q0 = sd["query_tokens"]
    q1 = np.asarray(runner.state.trainable["abstractor"]["query_embeds"])
    assert np.abs(q1 - q0).max() < 0.1


def test_import_owl_end_to_end(rng, tmp_path):
    """Full-path round trip: torch-save an external-named checkpoint,
    import into an initialized MPLUGOwlVideo tree, verify tensors landed
    AND the model forward consumes them (no orphan init values)."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    cfg = owl_cfg()
    model = MPLUGOwlVideo(cfg, policy=FP32_POLICY)
    B, S, T = 1, 8, 2
    video = jnp.zeros((B, 3, T, 16, 16), jnp.float32)
    ids = jnp.ones((B, S), jnp.int32)
    media = jnp.zeros((B, S), jnp.int32).at[:, 1:1 + cfg.num_media_tokens
                                            ].set(1)
    params = model.init(jax.random.key(0), video, ids,
                        jnp.ones_like(ids), media,
                        jnp.zeros_like(ids))["params"]

    sd = {("abstractor." + k if not k.startswith("query_tokens") else k): v
          for k, v in external_abstractor_sd(rng).items()}
    torch.save({k: torch.from_numpy(np.asarray(v))
                for k, v in sd.items()},
               tmp_path / "pytorch_model.bin")

    imported = import_owl(params, cfg, str(tmp_path))
    np.testing.assert_array_equal(
        np.asarray(imported["abstractor"]["query_embeds"]),
        sd["query_tokens"])
    np.testing.assert_array_equal(
        np.asarray(imported["vit_eos"]), sd["abstractor.vit_eos"])
    np.testing.assert_array_equal(
        np.asarray(imported["abstractor"]["layers_1"]["mlp"]["w3_kernel"]),
        sd["abstractor.encoder.layers.1.crossattention.output.mlp.w3"
           ".weight"].T)

    # the imported abstractor must change the visual conditioning
    qf_init = model.apply({"params": params}, video,
                          method=MPLUGOwlVideo.encode_video)
    qf_imp = model.apply({"params": imported}, video,
                         method=MPLUGOwlVideo.encode_video)
    assert qf_imp.shape == (B, cfg.num_media_tokens, HTXT)
    assert float(np.abs(np.asarray(qf_imp - qf_init)).max()) > 1e-6
    assert np.isfinite(np.asarray(qf_imp)).all()

    # an extra unmapped tensor in the file fails the whole import
    sd["abstractor.rogue.weight"] = np.zeros((2, 2), np.float32)
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               tmp_path / "pytorch_model.bin")
    with pytest.raises(ValueError, match="no mapping"):
        import_owl(params, cfg, str(tmp_path))

    # fail-loud the OTHER way: a checkpoint MISSING required abstractor
    # tensors (partial shard set) refuses to import
    del sd["abstractor.rogue.weight"]
    del sd["abstractor.encoder.layers.1.crossattention.attention.query"
           ".weight"]
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               tmp_path / "pytorch_model.bin")
    with pytest.raises(ValueError, match="partial import"):
        import_owl(params, cfg, str(tmp_path))
    # ... and absent vit_eos with use_vit_eos=True also refuses
    sd["abstractor.encoder.layers.1.crossattention.attention.query"
       ".weight"] = np.asarray(
        sd["abstractor.encoder.layers.0.crossattention.attention.query"
           ".weight"])
    vit_eos = sd.pop("abstractor.vit_eos")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               tmp_path / "pytorch_model.bin")
    with pytest.raises(ValueError, match="partial import"):
        import_owl(params, cfg, str(tmp_path))
    # temporal_embed absent is LEGAL (image-variant checkpoints)
    sd["abstractor.vit_eos"] = vit_eos
    sd.pop("abstractor.temporal_position_embeddings")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               tmp_path / "pytorch_model.bin")
    import_owl(params, cfg, str(tmp_path))

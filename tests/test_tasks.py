import jax
import jax.numpy as jnp
import numpy as np
import pytest

from youku_mplug_tpu.models.gpt3 import GPT3Config
from youku_mplug_tpu.models.tasks import (
    MPLUGVideo,
    MPLUGVideoConfig,
    last_token_index,
    prefix_lm_targets,
)
from youku_mplug_tpu.models.tokenizer import BatchTokenizer, ToyTokenizer
from youku_mplug_tpu.models.vision import VisionConfig
from youku_mplug_tpu.runtime.precision import FP32_POLICY

CFG = MPLUGVideoConfig(
    vision=VisionConfig(img_size=16, patch_size=8, embed_dim=16, depth=1,
                        num_heads=2, num_frames=2, mlp_ratio=2.0),
    text=GPT3Config(vocab_size=211, hidden_size=24, num_hidden_layers=1,
                    num_attention_heads=2, max_position_embeddings=64,
                    hidden_dropout=0.0, attention_dropout=0.0),
    num_learnable_token=4,
    use_contrastive=True,
    contrastive_embed_dim=8,
    use_cls=True,
    num_classes=5,
)

B, T, S = 2, 2, 10


@pytest.fixture(scope="module")
def setup():
    model = MPLUGVideo(CFG, policy=FP32_POLICY)
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(B, 3, T, 16, 16)), jnp.float32)
    ids = jnp.asarray(rng.integers(3, 211, size=(B, S)), jnp.int32)
    mask = jnp.asarray(
        (np.arange(S)[None] < np.array([[7], [10]])).astype(np.int32))
    params = model.init(jax.random.key(0), video, ids, mask,
                        method=MPLUGVideo.full_init)["params"]
    return model, params, video, ids, mask


def test_prefix_lm_targets_semantics():
    ids = jnp.asarray([[5, 6, 7, 8, 2, 0]])
    mask = jnp.asarray([[1, 1, 1, 1, 1, 0]])
    labels, loss_mask = prefix_lm_targets(ids, mask, n_query=2,
                                          prompt_lengths=jnp.asarray([1]))
    # shifted targets with duplicated-from-col0 last entry
    np.testing.assert_array_equal(
        np.asarray(labels[0]), [100, 100, 6, 7, 8, 2, 0, 5])
    # loss mask: queries zeroed, first prompt_length text positions zeroed,
    # pad position zeroed
    np.testing.assert_array_equal(
        np.asarray(loss_mask[0]), [0, 0, 0, 1, 1, 1, 0])


def test_last_token_index():
    mask = jnp.asarray([[1, 1, 1, 0], [1, 1, 1, 1]])
    np.testing.assert_array_equal(
        np.asarray(last_token_index(mask, n_query=3)), [5, 6])


def test_pretrain_loss(setup):
    model, params, video, ids, mask = setup
    out = model.apply({"params": params}, video, ids, mask,
                      method=MPLUGVideo.pretrain_loss)
    for k in ("loss", "loss_caption", "loss_contrastive"):
        assert np.isfinite(float(out[k])), k
    assert float(out["loss_contrastive"]) > 0


def test_cls_train_and_eval(setup):
    model, params, video, ids, mask = setup
    plens = jnp.asarray([2, 3])
    labels = jnp.asarray([1, 4])
    out = model.apply({"params": params}, video, ids, mask, plens,
                      prompt_ids=ids, prompt_mask=mask, labels=labels,
                      method=MPLUGVideo.cls_train_loss)
    assert np.isfinite(float(out["loss"]))
    assert float(out["loss_cls"]) > 0

    num_cls = 3
    rng = np.random.default_rng(1)
    ids_c = jnp.asarray(rng.integers(3, 211, size=(B * num_cls, S)))
    mask_c = jnp.ones((B * num_cls, S), jnp.int32)
    plens_c = jnp.full((B * num_cls,), 2)
    scores = model.apply({"params": params}, video, ids_c, mask_c, plens_c,
                         prompt_ids=ids, prompt_mask=mask, num_cls=num_cls,
                         method=MPLUGVideo.cls_eval_scores)
    assert scores["generation_logits"].shape == (B, num_cls)
    np.testing.assert_allclose(
        np.asarray(scores["generation_logits"]).sum(-1), 1.0, rtol=1e-5)
    assert scores["cls_logits"].shape == (B, 5)


def test_retrieval_loss_and_features(setup):
    model, params, video, ids, mask = setup
    idx = jnp.asarray([0, 0])  # duplicated match ids -> soft targets
    out = model.apply({"params": params}, video, ids, mask, idx,
                      method=MPLUGVideo.retrieval_loss)
    assert np.isfinite(float(out["loss"]))

    vf = model.apply({"params": params}, video,
                     method=MPLUGVideo.extract_vision_feature)
    tf = model.apply({"params": params}, ids, mask,
                     method=MPLUGVideo.extract_text_feature)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(vf), axis=-1), 1.0,
                               rtol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(tf), axis=-1), 1.0,
                               rtol=1e-5)


def test_itm_train_and_eval(setup):
    model, params, video, ids, mask = setup
    ids2 = jnp.concatenate([ids, ids], axis=0)
    mask2 = jnp.concatenate([mask, mask], axis=0)
    plens2 = jnp.full((2 * B,), 1)
    neg = jnp.asarray([1, 0])  # derangement of batch 2
    labels = jnp.asarray([1, 1, 0, 0])
    out = model.apply({"params": params}, video, ids2, mask2, plens2, neg,
                      prompt_ids=ids2, prompt_mask=mask2, labels=labels,
                      method=MPLUGVideo.itm_train_loss)
    assert np.isfinite(float(out["loss"]))

    num_text = 3
    rng = np.random.default_rng(2)
    ids_t = jnp.asarray(rng.integers(3, 211, size=(B * num_text, S)))
    mask_t = jnp.ones((B * num_text, S), jnp.int32)
    plens_t = jnp.full((B * num_text,), 1)
    scores = model.apply({"params": params}, video, ids_t, mask_t, plens_t,
                         prompt_ids=ids_t, prompt_mask=mask_t,
                         num_text=num_text,
                         method=MPLUGVideo.itm_eval_scores)
    assert scores["generation_logits"].shape == (B, num_text)
    assert scores["cls_logits"].shape == (B, num_text)
    assert np.all(np.asarray(scores["cls_logits"]) >= 0)
    assert np.all(np.asarray(scores["cls_logits"]) <= 1)


def test_batch_tokenizer_prompt_semantics():
    tok = BatchTokenizer(ToyTokenizer(vocab_size=300), max_length=12)
    out = tok([("prompt", "target text")])
    assert out["input_ids"].shape == (1, 12)
    # layout: [bos, prompt..., text..., eos, pad...]
    ids = out["input_ids"][0]
    assert ids[0] == 1  # bos
    n = out["attention_mask"][0].sum()
    assert ids[n - 1] == 2  # eos at last real position
    assert out["prompt_lengths"][0] == len("prompt")

    # truncation shortens the prompt first, preserving the target
    tok_s = BatchTokenizer(ToyTokenizer(vocab_size=300), max_length=8)
    out_s = tok_s([("promptpromptprompt", "tgt")])
    assert out_s["attention_mask"][0].sum() == 8
    assert out_s["prompt_lengths"][0] == 8 - 2 - 3  # max - bos/eos - text


def test_batch_tokenizer_plain():
    tok = BatchTokenizer(ToyTokenizer(vocab_size=300), max_length=16)
    out = tok(["hello", "hi"])
    assert out["input_ids"].shape == (2, 16)
    assert out["attention_mask"][0].sum() == len("hello") + 2
    # round-trip detokenize drops specials
    text = tok.decode(out["input_ids"][0][:out["attention_mask"][0].sum()])
    assert isinstance(text, str)


def test_eva_vit_sharding_rules():
    """EVA-style vision params must land on the model axis (VERDICT: a
    1.9B encoder cannot be replicated per device; ref eva_vit.py:413-427)
    and a sharded forward must run on the mesh."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu
    import numpy as np

    from youku_mplug_tpu.models.vision import EVA_VIT_G, VisionTransformer
    from youku_mplug_tpu.parallel.sharding import (
        GPT3_SHARDING_RULES,
        shard_params,
    )
    from youku_mplug_tpu.runtime.mesh import MeshConfig, make_mesh
    from youku_mplug_tpu.runtime.precision import FP32_POLICY

    # EVA-g geometry scaled down: same param paths, mesh-divisible dims
    tiny = dataclasses.replace(EVA_VIT_G, img_size=28, patch_size=14,
                               depth=2, embed_dim=32, num_heads=4,
                               mlp_ratio=2.0, grad_ckpt=False, drop_path=0.0)
    model = VisionTransformer(tiny, policy=FP32_POLICY)
    imgs = jnp.zeros((4, 3, 28, 28), jnp.float32)
    mesh = make_mesh(MeshConfig(data=4, model=2))
    with jax.set_mesh(mesh):
        params = model.init(jax.random.key(0), imgs)["params"]
        params = shard_params(params, mesh, GPT3_SHARDING_RULES)

        specs = {jtu.keystr(p): l.sharding.spec
                 for p, l in jtu.tree_flatten_with_path(params)[0]}
        qkv = specs["['blocks_0']['attn']['qkv_kernel']"]
        assert "model" in qkv, qkv
        assert "model" in specs["['blocks_0']['attn']['proj_kernel']"]
        assert "model" in specs["['blocks_0']['attn']['q_bias']"]
        assert "model" in specs["['blocks_0']['mlp']['fc1_kernel']"]
        assert "model" in specs["['blocks_0']['mlp']['fc2_kernel']"]

        cls, tokens = jax.jit(
            lambda p, x: model.apply({"params": p}, x))(params, imgs)
    assert np.isfinite(np.asarray(cls)).all()
    assert tokens.shape == (4, 1 + (28 // 14) ** 2, 32)

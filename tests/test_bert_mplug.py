"""BERT/fusion parity vs the reference's modeling_mplug (torch oracle) and
mPLUG task-head functional tests."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from youku_mplug_tpu.models.bert import (
    BertConfig,
    BertModel,
    BertPrefixModel,
    FusionModel,
)
from youku_mplug_tpu.runtime.precision import FP32_POLICY

from tests.oracle import load_reference_module

torch = pytest.importorskip("torch")

CFG = BertConfig(vocab_size=120, hidden_size=32, num_hidden_layers=3,
                 num_attention_heads=4, intermediate_size=64,
                 max_position_embeddings=64, encoder_width=32,
                 fusion_layer=2, hidden_dropout_prob=0.0,
                 attention_probs_dropout_prob=0.0, text_decoder_layers=3)


def torch_bert_config(mod, **over):
    from transformers.models.bert.configuration_bert import (
        BertConfig as HFConfig,
    )

    kw = dict(vocab_size=CFG.vocab_size, hidden_size=CFG.hidden_size,
              num_hidden_layers=CFG.num_hidden_layers,
              num_attention_heads=CFG.num_attention_heads,
              intermediate_size=CFG.intermediate_size,
              max_position_embeddings=CFG.max_position_embeddings,
              hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    kw.update(over)
    cfg = HFConfig(**kw)
    cfg.encoder_width = CFG.encoder_width
    cfg.fusion_layers = CFG.fusion_layer
    cfg.fusion_layer = CFG.fusion_layer
    cfg.stride_layer = 100
    return cfg


def port_bert(sd, prefix, n_layers, has_cross=False):
    """torch (mplug) bert weights -> our flax tree."""
    def ln(p):
        return {"scale": sd[p + ".weight"], "bias": sd[p + ".bias"]}

    def dense(p):
        return {"kernel": sd[p + ".weight"].T, "bias": sd[p + ".bias"]}

    def attn(p):
        return {
            "query": dense(p + ".self.query"),
            "key": dense(p + ".self.key"),
            "value": dense(p + ".self.value"),
            "out": dense(p + ".output.dense"),
            "out_layernorm": ln(p + ".output.LayerNorm"),
        }

    tree = {
        "embeddings": {
            "word_embeddings": {
                "embedding": sd[prefix + "embeddings.word_embeddings"
                                ".weight"]},
            "position_embeddings": {
                "embedding": sd[prefix + "embeddings.position_embeddings"
                                ".weight"]},
            "token_type_embeddings": {
                "embedding": sd[prefix + "embeddings.token_type_embeddings"
                                ".weight"]},
            "layernorm": ln(prefix + "embeddings.LayerNorm"),
        },
        "encoder": {},
    }
    for i in range(n_layers):
        lp = prefix + f"encoder.layer.{i}."
        entry = {
            "attention": attn(lp + "attention"),
            "ffn": {
                "intermediate": dense(lp + "intermediate.dense"),
                "output": dense(lp + "output.dense"),
                "output_layernorm": ln(lp + "output.LayerNorm"),
            },
        }
        if has_cross and lp + "crossattention.self.query.weight" in sd:
            entry["crossattention"] = attn(lp + "crossattention")
        tree["encoder"][f"layer_{i}"] = entry
    return jax.tree.map(jnp.asarray, tree)


@pytest.fixture(scope="module")
def ref_mod():
    return load_reference_module("models/modeling_mplug.py", "ref_mplug")


def test_bert_encoder_parity(ref_mod):
    torch.manual_seed(0)
    tcfg = torch_bert_config(ref_mod)
    ref = ref_mod.BertModel(tcfg, add_pooling_layer=False).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = port_bert(sd, "", CFG.num_hidden_layers)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 120, (2, 9))
    mask = np.ones((2, 9), np.int64)
    mask[0, 7:] = 0
    with torch.no_grad():
        want = ref(torch.tensor(ids), attention_mask=torch.tensor(mask),
                   return_dict=True).last_hidden_state.numpy()
    ours = BertModel(CFG, policy=FP32_POLICY)
    got = ours.apply({"params": params}, jnp.asarray(ids),
                     jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-4)


def test_fusion_parity(ref_mod):
    torch.manual_seed(1)
    tcfg = torch_bert_config(ref_mod)
    ref = ref_mod.FusionModel(tcfg, add_pooling_layer=False).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {"fusion_encoder":
              port_bert(sd, "", CFG.num_hidden_layers, has_cross=True)
              ["encoder"]}

    rng = np.random.default_rng(2)
    text = rng.normal(size=(2, 7, 32)).astype(np.float32)
    image = rng.normal(size=(2, 11, 32)).astype(np.float32)
    tmask = np.ones((2, 7), np.int64)
    imask = np.ones((2, 11), np.int64)
    with torch.no_grad():
        img_out, txt_out = ref(
            encoder_embeds=torch.tensor(text),
            attention_mask=torch.tensor(tmask),
            encoder_hidden_states=torch.tensor(image),
            encoder_attention_mask=torch.tensor(imask),
            return_dict=False)
    ours = FusionModel(CFG, policy=FP32_POLICY)
    got_img, got_txt = ours.apply(
        {"params": params}, jnp.asarray(text), jnp.asarray(tmask),
        jnp.asarray(image), jnp.asarray(imask))
    np.testing.assert_allclose(np.asarray(got_txt), txt_out.numpy(),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(got_img), img_out.numpy(),
                               rtol=3e-4, atol=3e-4)


def test_prefix_decoder_parity(ref_mod):
    torch.manual_seed(2)
    tcfg = torch_bert_config(ref_mod, is_decoder=True,
                             add_cross_attention=True)
    ref = ref_mod.BertPrefixModel(tcfg).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {"bert": port_bert(sd, "bert.", CFG.num_hidden_layers,
                                has_cross=True),
              "cls": {
                  "transform": {
                      "kernel": jnp.asarray(
                          sd["cls.predictions.transform.dense.weight"].T),
                      "bias": jnp.asarray(
                          sd["cls.predictions.transform.dense.bias"])},
                  "transform_layernorm": {
                      "scale": jnp.asarray(
                          sd["cls.predictions.transform.LayerNorm.weight"]),
                      "bias": jnp.asarray(
                          sd["cls.predictions.transform.LayerNorm.bias"])},
                  "decoder": {"kernel": jnp.asarray(
                      sd["cls.predictions.decoder.weight"].T)},
                  "bias": jnp.asarray(sd["cls.predictions.bias"]),
              }}

    rng = np.random.default_rng(3)
    ids = rng.integers(0, 120, (2, 6))
    mask = np.ones((2, 6), np.int64)
    enc = rng.normal(size=(2, 10, 32)).astype(np.float32)
    with torch.no_grad():
        want = ref(input_ids=torch.tensor(ids),
                   attention_mask=torch.tensor(mask),
                   encoder_hidden_states=torch.tensor(enc),
                   encoder_attention_mask=torch.ones(2, 10).long(),
                   return_dict=True, is_decoder=True).logits.numpy()
    ours = BertPrefixModel(CFG, policy=FP32_POLICY)
    got = ours.apply({"params": params}, jnp.asarray(ids),
                     jnp.asarray(mask),
                     encoder_hidden_states=jnp.asarray(enc))["logits"]
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-4)


def test_mplug_pretrain_and_heads():
    from youku_mplug_tpu.models.mplug import (
        MPLUG,
        MPLUGConfig,
        init_momentum_state,
        mlm_mask_tokens,
        update_momentum,
    )
    from youku_mplug_tpu.models.vision import VisionConfig

    cfg = MPLUGConfig(
        vision=VisionConfig(img_size=16, patch_size=8, embed_dim=24,
                            depth=1, num_heads=2, num_frames=2,
                            mlp_ratio=2.0),
        bert=dataclasses.replace(CFG, encoder_width=32),
        embed_dim=8, queue_size=16, num_classes=3)
    model = MPLUG(cfg, policy=FP32_POLICY)
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(2, 3, 2, 16, 16)), jnp.float32)
    ids = jnp.asarray(rng.integers(3, 120, (2, 8)), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)

    params = model.init({"params": jax.random.key(0),
                         "dropout": jax.random.key(1)},
                        video, ids, mask, method=MPLUG.full_init)["params"]

    # mlm masking
    mlm_ids, mlm_labels = mlm_mask_tokens(jax.random.key(2), ids, mask, 120)
    assert mlm_ids.shape == ids.shape
    assert ((np.asarray(mlm_labels) == -100)
            | (np.asarray(mlm_labels) == np.asarray(ids))).all()

    # momentum state + full distillation step
    mstate = init_momentum_state(params, cfg.embed_dim, cfg.queue_size)
    feats_m = model.apply({"params": mstate.ema_params}, video, ids, mask,
                          method=MPLUG.momentum_features)
    out = model.apply({"params": params}, video, ids, mask, mlm_ids,
                      mlm_labels, feats_m=feats_m,
                      image_queue=mstate.image_queue,
                      text_queue=mstate.text_queue, alpha=0.4,
                      rng=jax.random.key(3),
                      method=MPLUG.pretrain_loss)
    for k in ("loss", "loss_ita", "loss_itm", "loss_mlm"):
        assert np.isfinite(float(out[k])), k
    mstate2 = update_momentum(mstate, params, out["image_feat"],
                              out["text_feat"])
    assert int(mstate2.ptr) == 2
    assert not np.allclose(np.asarray(mstate2.image_queue[:, :2]),
                           np.asarray(mstate.image_queue[:, :2]))

    # cls / caption / retrieval / rerank heads
    cls = model.apply({"params": params}, video, ids, mask,
                      labels=jnp.asarray([0, 2]), method=MPLUG.cls_forward)
    assert cls["logits"].shape == (2, 3) and np.isfinite(float(cls["loss"]))

    cap = model.apply({"params": params}, video, ids, mask,
                      input_ids=ids, attention_mask=mask,
                      method=MPLUG.caption_loss)
    assert np.isfinite(float(cap["loss"]))

    ret = model.apply({"params": params}, video, ids, mask,
                      jnp.asarray([0, 1]), rng=jax.random.key(4),
                      method=MPLUG.retrieval_loss)
    assert np.isfinite(float(ret["loss"]))

    score = model.apply({"params": params}, video, ids, mask,
                        method=MPLUG.itm_rerank_score)
    assert score.shape == (2,) and (np.asarray(score) <= 1).all()


def test_alpro_heads():
    from youku_mplug_tpu.models.alpro import ALPRO, ALPROConfig
    from youku_mplug_tpu.models.vision import VisionConfig

    cfg = ALPROConfig(
        vision=VisionConfig(img_size=16, patch_size=8, embed_dim=24,
                            depth=1, num_heads=2, num_frames=2,
                            mlp_ratio=2.0),
        bert=dataclasses.replace(CFG, encoder_width=32, fusion_layer=2),
        embed_dim=8, num_classes=3)
    model = ALPRO(cfg, policy=FP32_POLICY)
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(2, 3, 2, 16, 16)), jnp.float32)
    ids = jnp.asarray(rng.integers(3, 120, (2, 8)), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)

    params = model.init({"params": jax.random.key(0),
                         "dropout": jax.random.key(1)},
                        video, ids, mask, method=ALPRO.full_init)["params"]
    # one BERT parameter set serves text AND fusion ranges
    layers = sorted(params["text_encoder"]["encoder"].keys())
    assert layers == [f"layer_{i}" for i in range(3)]

    mlm_labels = jnp.where(ids >= 0, ids, -100)
    out = model.apply({"params": params}, video, ids, mask, ids, mlm_labels,
                      rng=jax.random.key(2), method=ALPRO.pretrain_loss)
    for k in ("loss", "loss_ita", "loss_itm", "loss_mlm"):
        assert np.isfinite(float(out[k])), k

    ret = model.apply({"params": params}, video, ids, mask,
                      jnp.asarray([0, 1]), rng=jax.random.key(3),
                      method=ALPRO.retrieval_loss)
    assert np.isfinite(float(ret["loss"]))

    cls = model.apply({"params": params}, video, ids, mask,
                      labels=jnp.asarray([1, 0]), method=ALPRO.cls_forward)
    assert cls["logits"].shape == (2, 3)
    assert np.isfinite(float(cls["loss"]))

    # temporal mean pooling: image embeds length = 1 + N (not 1 + T*N)
    emb = model.apply({"params": params}, video,
                      method=ALPRO.encode_image)
    assert emb.shape == (2, 1 + 4, 32)


def test_gpt2_coca():
    from youku_mplug_tpu.models.gpt2_multimodal import (
        COCAConfig,
        GPT2Config,
        MPLUGCOCA,
        blockwise_mask,
        mixed_causal_bias,
    )
    from youku_mplug_tpu.models.vision import VisionConfig

    cfg = COCAConfig(
        vision=VisionConfig(img_size=16, patch_size=8, embed_dim=24,
                            depth=1, num_heads=2, mlp_ratio=2.0),
        gpt2=GPT2Config(vocab_size=120, n_positions=64, n_embd=32,
                        n_layer=2, n_head=4),
        predict_feature_dim=8)
    model = MPLUGCOCA(cfg, policy=FP32_POLICY)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(2, 3, 16, 16)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 120, (2, 6)), jnp.int32)
    mask = jnp.ones((2, 6), jnp.int32)
    n_patches = 4
    bmask = blockwise_mask(jax.random.key(1), 2, 2, 2)
    target = jnp.asarray(rng.normal(size=(2, n_patches, 8)), jnp.float32)

    params = model.init(jax.random.key(0), images, ids, mask,
                        bool_masked_pos=bmask,
                        image_target=target)["params"]
    out = model.apply({"params": params}, images, ids, mask,
                      bool_masked_pos=bmask, image_target=target)
    for k in ("loss", "loss_caption", "loss_mim"):
        assert np.isfinite(float(out[k])), k
    assert 0 < float(out["loss_mim"]) < 2.1

    # mixed mask semantics: text row attends visual, visual row doesn't
    bias = np.asarray(mixed_causal_bias(3, 4, jnp.ones((1, 7))))
    assert bias[0, 0, 3, 0] == 0.0       # text -> visual allowed
    assert bias[0, 0, 0, 3] < -1e3       # visual -> text blocked
    assert bias[0, 0, 4, 5] < -1e3       # text future blocked
    assert bias[0, 0, 0, 2] == 0.0       # visual <-> visual allowed

    # blockwise mask: exactly num_masked per row
    assert np.asarray(bmask).sum(axis=1).tolist() == [2, 2]


def test_mplug_generate():
    from youku_mplug_tpu.models.mplug import MPLUG, MPLUGConfig, \
        mplug_generate
    from youku_mplug_tpu.models.vision import VisionConfig

    cfg = MPLUGConfig(
        vision=VisionConfig(img_size=16, patch_size=8, embed_dim=24,
                            depth=1, num_heads=2, num_frames=2,
                            mlp_ratio=2.0),
        bert=dataclasses.replace(CFG, encoder_width=32), embed_dim=8)
    model = MPLUG(cfg, policy=FP32_POLICY)
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(2, 3, 2, 16, 16)), jnp.float32)
    ids = jnp.asarray(rng.integers(3, 120, (2, 8)), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    params = model.init({"params": jax.random.key(0),
                         "dropout": jax.random.key(1)},
                        video, ids, mask, method=MPLUG.full_init)["params"]
    out = mplug_generate(model, params, video, bos_id=101, eos_id=102,
                         max_new_tokens=5)
    assert out.shape == (2, 5)
    seq = np.asarray(out[0])
    if 102 in seq:
        i = list(seq).index(102)
        assert all(t == 102 for t in seq[i:])


def test_mplug_beam_matches_reference_textgenerator():
    """Our in-jit beam and the reference TextGenerator beam, driven by the
    SAME logits function, must pick the same token sequences (beam
    semantics parity: Wu penalty, finished pool, min-length EOS
    suppression — predictor_mplug.py:133-310)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from tests.oracle import load_reference_module

    torch = __import__("torch")
    pred_mod = load_reference_module("models/predictor_mplug.py",
                                     "ref_predictor")

    v, b, k, max_new = 23, 3, 3, 7
    eos, bos = 2, 1
    rng = np.random.default_rng(7)
    # a fixed random "decoder": logits depend on the last token and
    # position so beams genuinely diverge
    table = rng.normal(size=(v, max_new + 1, v)).astype(np.float32) * 2.0

    def logits_np(ids):  # ids [N, T] -> [N, T, V]
        ids = np.asarray(ids)
        n, t = ids.shape
        out = np.stack([table[ids[i], np.arange(t) % (max_new + 1)]
                        for i in range(n)])
        return out

    class TorchModel:
        def __call__(self, ids, encoder_hidden_states=None,
                     encoder_attention_mask=None, return_dict=True,
                     reduction="none"):
            class Out:
                pass

            o = Out()
            o.logits = torch.tensor(logits_np(ids.numpy()))
            return o

    gen = pred_mod.TextGenerator(
        {"beam_size": k, "min_length": 2, "max_length": max_new},
        TorchModel())
    gen.start_token, gen.end_token = bos, eos
    src = torch.zeros(b, 4, 8)
    mask = torch.ones(b, 4, dtype=torch.long)
    results = gen._fast_translate_batch((src, mask), max_new, min_length=2)
    # reference returns list of lists of tensors (incl. leading bos)
    ref_seqs = []
    for preds in (results[0] if isinstance(results, tuple) else
                  results["predictions" if isinstance(results, dict)
                          else 0]):
        seq = preds[0].numpy().tolist()
        ref_seqs.append(seq)

    # ours: monkeypatch the model.apply path by calling the beam directly
    # with a decode stub via a tiny shim module
    from youku_mplug_tpu.models import mplug as mplug_mod

    table_j = jnp.asarray(table)

    class StubModel:
        def apply(self, variables, ids, mask_, encoder_hidden_states=None,
                  encoder_attention_mask=None, method=None):
            # emulate text_decoder: full-length logits; positions beyond
            # the mask are irrelevant (beam reads position t-1 only)
            t = ids.shape[1]
            pos = jnp.arange(t) % (max_new + 1)
            return {"logits": table_j[ids, pos[None, :]]}

    enc = jnp.zeros((b, 4, 8))
    enc_mask = jnp.ones((b, 4), jnp.int32)
    ours = mplug_mod.mplug_beam_search(
        StubModel(), {}, enc, enc_mask, bos_id=bos, eos_id=eos,
        max_new_tokens=max_new, beam_size=k, min_length=2, alpha=0.6)
    ours = np.asarray(ours)

    for i in range(b):
        ref = ref_seqs[i]
        # reference keeps bos at [0]? predictions store alive_seq[...,0:]
        # which starts with bos
        ref_gen = ref[1:] if ref and ref[0] == bos else ref
        got = ours[i].tolist()
        # compare up to the reference's (variable) length; ours pads with
        # the eos fill after the hypothesis ends
        assert got[:len(ref_gen)] == ref_gen, (
            f"batch {i}: ours {got} vs reference {ref_gen}")

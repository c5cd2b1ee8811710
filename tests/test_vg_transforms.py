"""Box-aware grounding transforms: the box must keep tracking the object
through every augmentation (reference dataset/vg_transforms.py)."""

import json

import numpy as np
import pytest

from youku_mplug_tpu.data.vg_transforms import (
    hflip,
    normalize_and_pad,
    random_size_crop,
    resize_long_side,
    vg_test_transform,
    vg_train_transform,
)


def _img_with_rect(h=480, w=640, rect=(100, 150, 260, 330)):
    """Black image, white rectangle at xyxy=rect."""
    img = np.zeros((h, w, 3), np.uint8)
    x0, y0, x1, y1 = rect
    img[y0:y1, x0:x1] = 255
    return img, np.asarray(rect, np.float32)


def _rect_from_pixels(img, mask=None):
    """xyxy of the bright object: threshold halfway between the darkest
    and brightest *valid* pixel (mask==0 excludes the mean-color pad);
    jitter rescales both ends together so the midpoint still separates
    the white rectangle from the black background."""
    lum = img.mean(-1)
    if mask is not None:
        lum = np.where(mask == 0, lum, 0.0)
    thresh = (lum.max() + lum[mask == 0].min() if mask is not None
              else lum.max() + lum.min()) / 2
    ys, xs = np.where(lum > thresh)
    return np.asarray([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1],
                      np.float32)


def _iou(a, b):
    ix0, iy0 = max(a[0], b[0]), max(a[1], b[1])
    ix1, iy1 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(ix1 - ix0, 0) * max(iy1 - iy0, 0)
    ar = (a[2] - a[0]) * (a[3] - a[1])
    br = (b[2] - b[0]) * (b[3] - b[1])
    return inter / (ar + br - inter + 1e-9)


def test_resize_long_side_scales_box():
    img, box = _img_with_rect()
    out, bo = resize_long_side(img, box, 320)
    assert max(out.shape[:2]) == 320
    assert _iou(bo, _rect_from_pixels(out)) > 0.85


def test_hflip_swaps_box_and_words():
    img, box = _img_with_rect()
    out, bo, text = hflip(img, box, "the cat left of the right door")
    assert text == "the cat right of the left door"
    assert _iou(bo, _rect_from_pixels(out)) > 0.95
    # involution
    out2, bo2, text2 = hflip(out, bo, text)
    np.testing.assert_allclose(bo2, box, atol=1e-5)
    assert text2 == "the cat left of the right door"


def test_random_size_crop_keeps_center():
    img, box = _img_with_rect(700, 700, (300, 300, 420, 430))
    rng = np.random.default_rng(0)
    for _ in range(5):
        out, bo = random_size_crop(img, box, 384, 600, rng)
        got = _rect_from_pixels(out)
        assert _iou(bo, got) > 0.6  # clamped box still covers the object


def test_normalize_and_pad_box_normalized():
    img, box = _img_with_rect(200, 320, rect=(100, 50, 260, 180))
    out, mask, cxcywh = normalize_and_pad(img, box, 320)
    assert out.shape == (320, 320, 3) and mask.shape == (320, 320)
    assert mask.sum() == 320 * 320 - 200 * 320  # pad area marked
    # denormalize and compare against pixels
    cx, cy, w, h = cxcywh * 320
    den = np.asarray([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2])
    assert _iou(den, _rect_from_pixels(out, mask)) > 0.9


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_train_pipeline_box_tracks_object(seed):
    img, box = _img_with_rect(700, 640, (280, 300, 430, 452))
    tf = vg_train_transform(384, aug_blur=False)
    rng = np.random.default_rng(seed)
    out, mask, cxcywh, text = tf(img, box, "a white square", rng)
    assert out.shape == (384, 384, 3)
    cx, cy, w, h = cxcywh * 384
    den = np.asarray([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2])
    assert _iou(den, _rect_from_pixels(out, mask)) > 0.6


def test_train_pipeline_direction_word_skips_crop_flip_unaffected():
    """Direction words forbid the crop branch (RandomSelect semantics);
    flips still happen and rewrite the words consistently."""
    img, box = _img_with_rect()
    tf = vg_train_transform(384, aug_crop=True)
    saw_left = saw_right = False
    for seed in range(8):
        rng = np.random.default_rng(seed)
        _, _, _, text = tf(img, box, "thing on the left", rng)
        assert text in ("thing on the left", "thing on the right")
        saw_left |= text.endswith("left")
        saw_right |= text.endswith("right")
    assert saw_left and saw_right


def test_eval_transform_deterministic():
    img, box = _img_with_rect()
    tf = vg_test_transform(224)
    a = tf(img, box, "q")
    b = tf(img, box, "q")
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_allclose(a[2], b[2])


def test_grounding_dataset_train_path(tmp_path):
    from youku_mplug_tpu.data.image_datasets import GroundingDataset

    img, box = _img_with_rect()
    import cv2

    cv2.imwrite(str(tmp_path / "im.png"), img[..., ::-1])
    ann = [{"image": "im.png", "sentence": "white square",
            "bbox": [float(box[0]), float(box[1]),
                     float(box[2] - box[0]), float(box[3] - box[1])]}]
    json.dump(ann, open(tmp_path / "ann.json", "w"))
    ds = GroundingDataset(str(tmp_path / "ann.json"), str(tmp_path),
                          image_res=384, train=True, seed=0)
    row = ds[0]
    assert row["image"].shape == (384, 384, 3)
    assert row["pad_mask"].shape == (384, 384)
    assert row["box"].shape == (4,)
    assert 0 < row["box"][2] <= 1 and 0 < row["box"][3] <= 1
    # eval path deterministic
    ds_ev = GroundingDataset(str(tmp_path / "ann.json"), str(tmp_path),
                             image_res=384, train=False)
    r1, r2 = ds_ev[0], ds_ev[0]
    np.testing.assert_array_equal(r1["image"], r2["image"])

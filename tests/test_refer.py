"""Refer dataset API + mask-based grounding eval, oracle-checked against
the reference refTools/refer_python3.py REFER on identical synthetic
RefCOCO files."""

import importlib.util
import json
import pickle
import sys
import types

import numpy as np
import pytest

from youku_mplug_tpu.data.refer import Refer
from youku_mplug_tpu.evals.grounding import (
    grounding_eval_masks,
    rank_detections,
)


def make_dataset(tmp_path):
    root = tmp_path / "refer_root"
    (root / "refcoco").mkdir(parents=True)
    refs = [
        {"ref_id": 1, "ann_id": 10, "image_id": 100, "category_id": 1,
         "split": "train",
         "sentences": [{"sent_id": 0, "sent": "left dog",
                        "tokens": ["left", "dog"]}]},
        {"ref_id": 2, "ann_id": 11, "image_id": 100, "category_id": 2,
         "split": "val",
         "sentences": [{"sent_id": 1, "sent": "right cat",
                        "tokens": ["right", "cat"]}]},
        {"ref_id": 3, "ann_id": 12, "image_id": 101, "category_id": 1,
         "split": "testA",
         "sentences": [{"sent_id": 2, "sent": "the dog",
                        "tokens": ["the", "dog"]},
                       {"sent_id": 3, "sent": "dog below",
                        "tokens": ["dog", "below"]}]},
        {"ref_id": 4, "ann_id": 13, "image_id": 102, "category_id": 2,
         "split": "testB",
         "sentences": [{"sent_id": 4, "sent": "a cat",
                        "tokens": ["a", "cat"]}]},
    ]
    instances = {
        "images": [
            {"id": 100, "height": 48, "width": 64},
            {"id": 101, "height": 48, "width": 64},
            {"id": 102, "height": 48, "width": 64},
        ],
        "annotations": [
            {"id": 10, "image_id": 100, "category_id": 1,
             "bbox": [2.0, 3.0, 20.0, 24.0]},
            {"id": 11, "image_id": 100, "category_id": 2,
             "bbox": [40.0, 8.0, 16.0, 30.0]},
            {"id": 12, "image_id": 101, "category_id": 1,
             "bbox": [10.0, 20.0, 30.0, 20.0]},
            {"id": 13, "image_id": 102, "category_id": 2,
             "bbox": [0.0, 0.0, 32.0, 24.0]},
        ],
        "categories": [{"id": 1, "name": "dog"}, {"id": 2, "name": "cat"}],
    }
    with open(root / "refcoco" / "refs(unc).p", "wb") as f:
        pickle.dump(refs, f)
    with open(root / "refcoco" / "instances.json", "w") as f:
        json.dump(instances, f)
    return str(root)


def load_reference_refer():
    """refer_python3.py needs skimage (absent); stub its unused imports."""
    path = "/root/reference/refTools/refer_python3.py"
    import os

    if not os.path.exists(path):
        pytest.skip("reference refer API not available")
    for name in ("skimage", "skimage.io"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__spec__ = importlib.util.spec_from_loader(name, loader=None)
            sys.modules[name] = mod
    sys.modules["skimage"].io = sys.modules["skimage.io"]
    spec = importlib.util.spec_from_file_location("ref_refer", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_refer"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_refer_matches_reference_api(tmp_path):
    root = make_dataset(tmp_path)
    ours = Refer(root, "refcoco", "unc")
    ref_mod = load_reference_refer()
    theirs = ref_mod.REFER(root, "refcoco", "unc")

    assert ours.get_ref_ids() == theirs.getRefIds()
    for split in ("train", "val", "test", "testA", "testB"):
        assert ours.get_ref_ids(split=split) == theirs.getRefIds(
            split=split), split
    # the reference's image_ids filter is broken upstream (refer_python3
    # .py:146 builds a list of lists and then indexes refs by key); ours
    # flattens — assert the correct result directly
    assert ours.get_ref_ids(image_ids=[100]) == [1, 2]
    assert ours.get_ref_ids(cat_ids=[1]) == theirs.getRefIds(cat_ids=[1])
    assert ours.get_ann_ids() == theirs.getAnnIds()
    assert ours.get_ann_ids(image_ids=[100]) == theirs.getAnnIds(
        image_ids=[100])
    assert ours.get_ann_ids(cat_ids=[2]) == theirs.getAnnIds(cat_ids=[2])
    assert sorted(ours.get_img_ids(ref_ids=[1, 3])) == sorted(
        theirs.getImgIds(ref_ids=[1, 3]))
    assert list(ours.get_cat_ids()) == list(theirs.getCatIds())
    for rid in (1, 2, 3, 4):
        assert ours.get_ref_box(rid) == theirs.getRefBox(rid)
        assert ours.load_refs([rid]) == theirs.loadRefs([rid])
    assert ours.sent_to_tokens == theirs.sentToTokens
    # camelCase compatibility surface
    assert ours.getRefIds(split="val") == [2]
    assert ours.Refs[3]["split"] == "testA"
    assert ours.refToAnn[4]["id"] == 13


def test_grounding_eval_masks(tmp_path):
    root = make_dataset(tmp_path)
    refer = Refer(root, "refcoco", "unc")

    def mask_for(bbox):
        """24x24 relevance map concentrated on the given box (or, for
        bbox None, on a far corner so every real proposal scores low)."""
        m = np.zeros((24, 24), np.float32)
        if bbox is None:
            m[-6:, -6:] = 1.0  # bottom-right: the wrong proposal box
            return m
        x, y, w, h = bbox
        sx, sy = 24 / 64, 24 / 48
        m[int(y * sy):int((y + h) * sy) or 1,
          int(x * sx):int((x + w) * sx) or 1] = 1.0
        return m

    dets = {
        "100": [[2, 3, 20, 24, 0.9], [40, 8, 16, 30, 0.8]],
        "101": [[10, 20, 30, 20, 0.9], [0, 0, 10, 10, 0.5]],
        "102": [[0, 0, 32, 24, 0.9], [32, 24, 30, 20, 0.5]],
    }
    results = [
        {"ref_id": 2, "pred": mask_for(refer.get_ref_box(2))},      # hit
        {"ref_id": 3, "pred": mask_for(refer.get_ref_box(3))},      # hit
        {"ref_id": 4, "pred": mask_for(None)},           # miss
    ]
    out = grounding_eval_masks(results, dets, refer, alpha=0.5)
    assert out["val_d"] == 1.0
    assert out["testA_d"] == 1.0
    assert out["testB_d"] == 0.0

    # rank_detections picks the box under the hot mask
    m = np.zeros((48, 64), np.float32)
    m[8:38, 40:56] = 1.0
    best = rank_detections(m, dets["100"], alpha=0.5)
    assert best == [40, 8, 16, 30]


def test_ref_evaluation(tmp_path):
    from youku_mplug_tpu.evals.metrics import ref_evaluation

    refer = Refer(make_dataset(tmp_path), "refcoco", "unc")
    # exact-match generations score perfectly; a wrong one drags Bleu_1
    perfect = [{"ref_id": r, "sent": refer.refs[r]["sentences"][0]["sent"]}
               for r in (1, 2, 3, 4)]
    out = ref_evaluation(refer, perfect)
    assert out["Bleu_1"] == pytest.approx(1.0)
    assert out["ROUGE_L"] == pytest.approx(1.0)

    wrong = list(perfect)
    wrong[0] = {"ref_id": 1, "sent": "blue banana"}
    out2 = ref_evaluation(refer, wrong)
    assert out2["Bleu_1"] < out["Bleu_1"]

import numpy as np
import pytest

from youku_mplug_tpu.evals.metrics import (
    bleu,
    caption_eval,
    cider,
    itm_eval,
    normalize_chinese,
    rouge_l,
    topk_accuracy,
)

from tests.oracle import load_reference_module

HYPS = ["这 是 一 个 测 试", "猫 在 沙 发 上 睡 觉", "今 天 天 气 很 好",
        "他 在 打 篮 球"]
REFS = [["这 是 测 试", "这 是 一 个 测 试 吗"],
        ["猫 在 沙 发 上", "一 只 猫 在 睡 觉"],
        ["天 气 很 好", "今 天 天 气 不 错"],
        ["他 喜 欢 打 篮 球", "他 在 操 场 打 球"]]


def test_topk_accuracy():
    scores = np.asarray([[0.1, 0.9, 0.0], [0.8, 0.1, 0.15],
                         [0.2, 0.3, 0.5]])
    labels = np.asarray([1, 2, 2])
    top1, top2 = topk_accuracy(scores, labels, topk=(1, 2))
    np.testing.assert_allclose(top1, 100.0 * 2 / 3)
    np.testing.assert_allclose(top2, 100.0)


def test_itm_eval_perfect_scores():
    v2t = np.eye(4)
    t2v = np.eye(4)
    vid2txt = {i: [i] for i in range(4)}
    txt2vid = {i: [i] for i in range(4)}
    res = itm_eval(v2t, t2v, txt2vid, vid2txt)
    assert res["txt_r1"] == 100.0 and res["vid_r1"] == 100.0
    assert res["r_mean"] == 100.0


def test_normalize_chinese():
    assert normalize_chinese("今天ABC天气!!好123") == "今 天 天 气 好"


def test_bleu_matches_reference_scorer():
    mod = load_reference_module(
        "refTools/evaluation/bleu/bleu_scorer.py", "ref_bleu")
    scorer = mod.BleuScorer(n=4)
    for h, rs in zip(HYPS, REFS):
        scorer += (h, rs)
    ref_scores, _ = scorer.compute_score(option="closest")
    got = bleu(HYPS, REFS)
    np.testing.assert_allclose(got, ref_scores, rtol=1e-6, atol=1e-8)


def test_cider_matches_reference_scorer():
    mod = load_reference_module(
        "refTools/evaluation/cider/cider_scorer.py", "ref_cider")
    scorer = mod.CiderScorer(n=4, sigma=6.0)
    for h, rs in zip(HYPS, REFS):
        scorer += (h, rs)
    ref_score, _ = scorer.compute_score()
    got = cider(HYPS, REFS)
    np.testing.assert_allclose(got, ref_score, rtol=1e-6, atol=1e-8)


def test_rouge_matches_reference_scorer():
    mod = load_reference_module(
        "refTools/evaluation/rouge/rouge.py", "ref_rouge")
    r = mod.Rouge()
    want = np.mean([r.calc_score([h], rs) for h, rs in zip(HYPS, REFS)])
    got = rouge_l(HYPS, REFS)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_caption_eval_end_to_end():
    results = [
        {"video_id": "a", "pred_caption": "今天天气很好",
         "gold_caption": ["今天天气很好", "天气不错"]},
        {"video_id": "a", "pred_caption": "dup ignored",
         "gold_caption": ["x"]},
        {"video_id": "b", "pred_caption": "猫在睡觉",
         "gold_caption": ["猫在沙发上睡觉"]},
    ]
    out = caption_eval(results)
    assert set(out) == {"Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "ROUGE_L",
                        "CIDEr", "METEOR"}
    assert out["Bleu_1"] > 0.5  # exact match on one of two videos
    assert 0 <= out["ROUGE_L"] <= 1


def test_grounding_utils():
    from youku_mplug_tpu.evals.grounding import (
        box_iou,
        cxcywh_to_xyxy,
        grounding_accuracy,
        xyxy_to_cxcywh,
    )

    box = np.asarray([[0.5, 0.5, 0.5, 0.5]])  # cxcywh
    xyxy = cxcywh_to_xyxy(box)
    np.testing.assert_allclose(xyxy, [[0.25, 0.25, 0.75, 0.75]])
    np.testing.assert_allclose(xyxy_to_cxcywh(xyxy), box)

    a = np.asarray([[0, 0, 1, 1]])
    b = np.asarray([[0, 0, 1, 1], [0.5, 0.5, 1.5, 1.5]])
    iou = box_iou(a, b)
    np.testing.assert_allclose(iou[0, 0], 1.0)
    np.testing.assert_allclose(iou[0, 1], 0.25 / 1.75, rtol=1e-5)

    acc, ious = grounding_accuracy(
        np.asarray([[0.5, 0.5, 0.5, 0.5], [0.1, 0.1, 0.1, 0.1]]),
        np.asarray([[0.5, 0.5, 0.5, 0.5], [0.9, 0.9, 0.1, 0.1]]))
    assert acc == 50.0

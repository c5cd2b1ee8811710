"""Metric-level parity vs the reference's OWN eval loops (the
BASELINE.md "accuracy parity" north star, measured not constructed).

tools/metric_parity.py executes the reference's ``evaluation`` +
``cal_metric`` (downstream/run_cls_distributed_gpt3.py:201,250) and
``itm_eval`` (downstream/run_retrieval_distributed_gpt3_itm.py:296)
against this repo's run_cls / evals.metrics on shared model outputs and
shared synthetic annotations; these tests pin exact (fp32) agreement.
Skips when the reference tree or torch is unavailable.
"""

import os

import numpy as np
import pytest

from tools.metric_parity import (
    REFERENCE,
    load_reference_eval_modules,
    max_divergence,
    run_cls_parity,
    run_itm_loop_parity,
    run_itm_parity,
    run_topk_parity,
)


def _require_reference():
    if not os.path.isdir(os.path.join(REFERENCE, "downstream")):
        pytest.skip("reference tree unavailable")
    pytest.importorskip("torch")


def test_reference_eval_modules_load():
    _require_reference()
    ref_cls, ref_itm = load_reference_eval_modules()
    assert callable(ref_cls.cal_metric)
    assert callable(ref_cls.evaluation)
    assert callable(ref_itm.itm_eval)


def test_topk_metric_parity():
    """cal_metric == topk_accuracy exactly on continuous logits, over
    several seeds."""
    _require_reference()
    for seed in range(5):
        pair = run_topk_parity(seed)
        assert max_divergence(pair) == 0.0, pair


def test_itm_metric_parity():
    """Reference itm_eval == ours to fp64 round-off on shared score
    matrices + multi-caption annotations."""
    _require_reference()
    for seed in range(3):
        pair = run_itm_parity(seed)
        assert max_divergence(pair) < 1e-9, pair
        # sanity: the bumped diagonal makes R@1 meaningfully nonzero
        assert pair["reference"]["txt_r1"] > 0


def test_itm_eval_loop_parity(tmp_path):
    """The reference's WHOLE retrieval-ITM evaluation (chunked V x T
    是-probability matrices + its own itm_eval) agrees with
    run_retrieval_itm.evaluation to float round-off on shared weights,
    batches and texts — gen and cls heads both."""
    _require_reference()
    pair = run_itm_loop_parity(str(tmp_path))
    assert {"gen_r_mean", "cls_r_mean"} <= set(pair["ours"])
    assert max_divergence(pair) < 1e-9, pair
    vals = list(pair["reference"].values())
    assert any(0.0 < v < 100.0 for v in vals), pair


def test_cls_eval_loop_parity(tmp_path):
    """The reference's WHOLE evaluation loop (per-class prompt
    construction, scoring arrangement, MetricLogger weighted
    aggregation over uneven batches) produces identical top-1/top-5 to
    this repo's run_cls.evaluation when both consume the same tiny
    checkpoint's outputs."""
    _require_reference()
    pair = run_cls_parity(str(tmp_path))
    assert set(pair["ours"]) >= {"gen_top1_accuracy",
                                 "gen_top5_accuracy",
                                 "cls_top1_accuracy",
                                 "cls_top5_accuracy"}
    assert max_divergence(pair) == 0.0, pair
    # metrics are non-degenerate (not all 0/100)
    vals = list(pair["reference"].values())
    assert any(0.0 < v < 100.0 for v in vals), pair

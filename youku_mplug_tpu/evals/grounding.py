"""Box utilities + grounding evaluation (reference utils/box_utils.py,
utils/eval_utils.py, refTools/refEvaluation.py): cxcywh/xyxy conversion,
IoU / generalized IoU, and the P@IoU>=0.5 referring-expression protocol."""

from __future__ import annotations

import numpy as np


def cxcywh_to_xyxy(box):
    box = np.asarray(box, np.float32)
    cx, cy, w, h = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
    return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def xyxy_to_cxcywh(box):
    box = np.asarray(box, np.float32)
    x0, y0, x1, y1 = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
    return np.stack([(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], -1)


def box_iou(a, b):
    """Pairwise IoU of xyxy boxes a [N,4] vs b [M,4] -> [N,M]."""
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    area_a = (a[:, 2] - a[:, 0]).clip(0) * (a[:, 3] - a[:, 1]).clip(0)
    area_b = (b[:, 2] - b[:, 0]).clip(0) * (b[:, 3] - b[:, 1]).clip(0)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = (rb - lt).clip(0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / np.maximum(union, 1e-9)


def generalized_box_iou(a, b):
    """GIoU (pairwise) — the grounding regression loss term."""
    iou = box_iou(a, b)
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    lt = np.minimum(a[:, None, :2], b[None, :, :2])
    rb = np.maximum(a[:, None, 2:], b[None, :, 2:])
    wh = (rb - lt).clip(0)
    hull = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    inter = iou * (area_a[:, None] + area_b[None, :]) / (1 + iou)
    union = area_a[:, None] + area_b[None, :] - inter
    return iou - (hull - union) / np.maximum(hull, 1e-9)


def grounding_accuracy(pred_cxcywh, gt_cxcywh, threshold: float = 0.5):
    """P@IoU>=threshold over matched (pred, gt) pairs, in percent."""
    pred = cxcywh_to_xyxy(pred_cxcywh)
    gt = cxcywh_to_xyxy(gt_cxcywh)
    ious = np.diag(box_iou(pred, gt))
    return 100.0 * float((ious >= threshold).mean()), ious

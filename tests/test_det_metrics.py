"""Standard mAP validator sanity (eval/det_metrics.py)."""

import numpy as np

from ood_in_object_detection_tpu.eval.det_metrics import compute_det_metrics


def _p(img, bboxes, cls, conf):
    return dict(img_name=img, bboxes=np.asarray(bboxes, float),
                cls=np.asarray(cls, float), conf=np.asarray(conf, float))


def _t(img, bboxes, cls):
    return dict(img_name=img, bboxes=np.asarray(bboxes, float),
                cls=np.asarray(cls, float))


def test_perfect_predictions_map_one():
    tgts = [_t("a", [[0, 0, 10, 10], [20, 20, 40, 40]], [0, 1])]
    preds = [_p("a", [[0, 0, 10, 10], [20, 20, 40, 40]], [0, 1], [0.9, 0.8])]
    r = compute_det_metrics(preds, tgts, num_classes=2)
    assert abs(r["mAP50"] - 1.0) < 1e-9
    assert abs(r["mAP50_95"] - 1.0) < 1e-9


def test_offset_box_counts_at_low_iou_only():
    # IoU = 0.7225: TP at thresholds 0.50..0.70 (5 of 10), FP above
    tgts = [_t("a", [[0, 0, 100, 100]], [0])]
    preds = [_p("a", [[15, 15, 100, 100]], [0], [0.9])]
    r = compute_det_metrics(preds, tgts, num_classes=1)
    assert r["mAP50"] == 1.0
    assert abs(r["mAP50_95"] - 0.5) < 1e-9


def test_duplicate_detection_is_fp():
    tgts = [_t("a", [[0, 0, 10, 10]], [0])]
    preds = [_p("a", [[0, 0, 10, 10], [0, 0, 10, 10]], [0, 0], [0.9, 0.8])]
    r = compute_det_metrics(preds, tgts, num_classes=1)
    assert r["mAP50"] == 1.0  # AP unaffected: TP found at rank 1
    # classes with no GT in the eval set are EXCLUDED from the mean (reference
    # DetMetrics averages over ap_class_index only; per-class entry is NaN)
    r2 = compute_det_metrics(preds, tgts, num_classes=2)
    assert abs(r2["mAP50"] - 1.0) < 1e-9
    assert np.isnan(r2["per_class_ap50"][1])


def test_class_with_gt_but_no_preds_counts_zero():
    tgts = [_t("a", [[0, 0, 10, 10], [30, 30, 60, 60]], [0, 1])]
    preds = [_p("a", [[0, 0, 10, 10]], [0], [0.9])]
    r = compute_det_metrics(preds, tgts, num_classes=2)
    assert abs(r["mAP50"] - 0.5) < 1e-9  # class 1 present but missed -> AP 0

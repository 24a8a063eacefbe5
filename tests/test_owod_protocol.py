"""OWOD eval protocol semantics (reference owod_evaluation_protocol.py)."""

import numpy as np

from ood_in_object_detection_tpu.eval.owod_protocol import (
    UNKNOWN_CLASS_INDEX, compute_metrics, voc_ap, voc_eval_class,
)


def _p(img, bboxes, cls, conf):
    return dict(img_name=img, bboxes=np.asarray(bboxes, float),
                cls=np.asarray(cls, float), conf=np.asarray(conf, float))


def _t(img, bboxes, cls):
    return dict(img_name=img, bboxes=np.asarray(bboxes, float),
                cls=np.asarray(cls, float))


def test_voc_ap_area_interpolation():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 0.5])
    # envelope: p=1 up to r=0.5, p=0.5 up to 1.0 -> 0.5*1 + 0.5*0.5 = 0.75
    assert abs(voc_ap(rec, prec) - 0.75) < 1e-9


def test_voc_ap_07_metric():
    rec = np.array([1.0])
    prec = np.array([1.0])
    assert abs(voc_ap(rec, prec, use_07_metric=True) - 1.0) < 1e-9


def test_greedy_matching_plus1_convention():
    # GT 0..9 box; detection 0..9 => IoU=1 with +1 convention; detection at
    # 5..14 overlaps (5*5=25 with +1: iw=ih=5) union=2*100-25... all via eval:
    targets = [_t("a", [[0, 0, 9, 9]], [0])]
    preds = [_p("a", [[0, 0, 9, 9], [0, 0, 9, 9]], [0, 0], [0.9, 0.8])]
    r = voc_eval_class(preds, targets, 0)
    # first det TP, duplicate det FP
    np.testing.assert_array_equal(r["tp"], [1, 0])
    np.testing.assert_array_equal(r["fp"], [0, 1])
    assert r["ap"] == 1.0  # recall 1 precision 1 at rank1


def test_aose_counts_known_preds_on_unknown_gt():
    targets = [_t("a", [[0, 0, 10, 10], [50, 50, 60, 60]], [0, UNKNOWN_CLASS_INDEX])]
    preds = [_p("a", [[0, 0, 10, 10], [50, 50, 60, 60]], [0, 0], [0.9, 0.8])]
    r = voc_eval_class(preds, targets, 0)
    assert r["is_unk_sum"] == 1.0  # second det sits on unknown GT
    assert r["n_unk"] == 1


def test_compute_metrics_full_and_short_circuit():
    # mixed dataset: 1 known class + unknowns
    targets = [
        _t("a", [[0, 0, 10, 10], [50, 50, 60, 60]], [0, UNKNOWN_CLASS_INDEX]),
        _t("b", [[5, 5, 20, 20]], [0]),
    ]
    preds = [
        _p("a", [[0, 0, 10, 10], [50, 50, 60, 60]], [0, UNKNOWN_CLASS_INDEX], [0.9, 0.7]),
        _p("b", [[5, 5, 20, 20]], [0], [0.8]),
    ]
    res = compute_metrics(preds, targets, ["cat", "unknown"], known_classes=[0])
    assert set(res) == {"mAP", "U-AP", "U-F1", "U-PRE", "U-REC", "A-OSE", "WI-08"}
    assert abs(res["mAP"] - 1.0) < 1e-9   # both known dets perfect (07 metric)
    assert res["U-PRE"] == 1.0 and res["U-REC"] == 1.0 and res["U-F1"] == 1.0
    assert res["A-OSE"] == 0.0

    # unknown-only targets -> COCO-OOD short-circuit (reference :241-253)
    t2 = [_t("a", [[0, 0, 10, 10]], [UNKNOWN_CLASS_INDEX])]
    p2 = [_p("a", [[0, 0, 10, 10]], [UNKNOWN_CLASS_INDEX], [0.9])]
    res2 = compute_metrics(p2, t2, ["cat", "unknown"], known_classes=[0])
    assert set(res2) == {"U-AP", "U-F1", "U-PRE", "U-REC"}
    assert res2["U-REC"] == 1.0


def test_misclassified_unknown_raises_aose():
    targets = [_t("a", [[0, 0, 20, 20]], [UNKNOWN_CLASS_INDEX]),
               _t("b", [[0, 0, 20, 20]], [0])]
    preds = [_p("a", [[1, 1, 20, 20]], [0], [0.9]),   # known pred on unknown GT
             _p("b", [[0, 0, 20, 20]], [0], [0.9])]
    res = compute_metrics(preds, targets, ["cat", "unknown"], known_classes=[0])
    assert res["A-OSE"] == 1.0
    assert res["U-REC"] == 0.0  # the unknown was never predicted as unknown

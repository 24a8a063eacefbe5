"""Fixed-shape NMS semantics (vs reference non_max_suppression_old, ops.py:348-533)."""

import numpy as np
import jax.numpy as jnp

from ood_in_object_detection_tpu.ops import batched_nms
from ood_in_object_detection_tpu.ops.boxes import box_iou, xywh2xyxy


def _lg(p):
    return float(np.log(p / (1 - p)))


def make_synthetic():
    A, nc = 6, 3
    boxes = np.zeros((A, 4), np.float32)
    logits = np.full((A, nc), -10.0, np.float32)
    boxes[0] = [50, 50, 20, 20]; logits[0, 0] = _lg(0.9)
    boxes[1] = [52, 52, 20, 20]; logits[1, 0] = _lg(0.8)   # suppressed by 0
    boxes[2] = [50, 50, 20, 20]; logits[2, 1] = _lg(0.7)   # other class, kept
    boxes[3] = [200, 200, 30, 30]; logits[3, 0] = _lg(0.6)
    boxes[4] = [225, 200, 30, 30]; logits[4, 0] = _lg(0.5)  # IoU<0.45 w/ 3, kept
    boxes[5] = [10, 10, 5, 5]; logits[5, 2] = _lg(0.001)    # below conf thr
    return boxes, logits


def test_nms_keep_set_and_order():
    boxes, logits = make_synthetic()
    det = batched_nms(jnp.asarray(boxes)[None], jnp.asarray(logits)[None],
                      conf_thres=0.01, iou_thres=0.45, max_det=5, pre_nms_k=6)
    v = np.asarray(det.valid[0])
    np.testing.assert_array_equal(np.asarray(det.anchor_idx[0])[v], [0, 2, 3, 4])
    np.testing.assert_array_equal(np.asarray(det.cls[0])[v], [0, 1, 0, 0])
    np.testing.assert_allclose(np.asarray(det.conf[0])[v], [0.9, 0.7, 0.6, 0.5], atol=1e-6)
    # xyxy conversion
    np.testing.assert_allclose(np.asarray(det.boxes[0, 0]), [40, 40, 60, 60], atol=1e-5)


def test_nms_class_agnostic_suppresses_across_classes():
    boxes, logits = make_synthetic()
    det = batched_nms(jnp.asarray(boxes)[None], jnp.asarray(logits)[None],
                      conf_thres=0.01, iou_thres=0.45, max_det=5, pre_nms_k=6,
                      class_agnostic=True)
    v = np.asarray(det.valid[0])
    np.testing.assert_array_equal(np.asarray(det.anchor_idx[0])[v], [0, 3, 4])


def test_nms_max_det_caps_output():
    boxes, logits = make_synthetic()
    det = batched_nms(jnp.asarray(boxes)[None], jnp.asarray(logits)[None],
                      conf_thres=0.01, iou_thres=0.45, max_det=2, pre_nms_k=6)
    assert int(det.num_valid[0]) == 2
    v = np.asarray(det.valid[0])
    np.testing.assert_array_equal(np.asarray(det.anchor_idx[0])[v], [0, 2])


def test_nms_random_matches_numpy_greedy(rng):
    """Random but non-degenerate boxes: exact keep-set parity with a
    straightforward float64 numpy greedy NMS."""
    A, nc = 200, 5
    centers = rng.uniform(40, 600, (A, 2))
    wh = rng.uniform(20, 80, (A, 2))
    boxes = np.concatenate([centers, wh], 1).astype(np.float32)
    logits = rng.normal(-2, 1.5, (A, nc)).astype(np.float32)

    det = batched_nms(jnp.asarray(boxes)[None], jnp.asarray(logits)[None],
                      conf_thres=0.05, iou_thres=0.45, max_det=50, pre_nms_k=A)
    got = np.asarray(det.anchor_idx[0])[np.asarray(det.valid[0])]

    s = 1 / (1 + np.exp(-logits.astype(np.float64)))
    conf, cls = s.max(1), s.argmax(1)
    order = np.argsort(-np.where(conf > 0.05, conf, -1), kind="stable")
    b = xywh2xyxy(jnp.asarray(boxes, jnp.float64))
    b = np.asarray(b) + (cls * 7680.0)[:, None]
    keep, sup = [], np.zeros(A, bool)
    for i in order:
        if conf[i] <= 0.05 or sup[i]:
            continue
        keep.append(i)
        lt = np.maximum(b[i, :2], b[:, :2]); rb = np.minimum(b[i, 2:], b[:, 2:])
        whp = np.clip(rb - lt, 0, None); inter = whp[:, 0] * whp[:, 1]
        area = lambda x: np.clip(x[..., 2] - x[..., 0], 0, None) * np.clip(x[..., 3] - x[..., 1], 0, None)
        iou = inter / (area(b[i]) + area(b) - inter + 1e-7)
        newly = (iou > 0.45) & (conf < conf[i])
        sup |= newly
    keep = np.array(keep[:50])
    np.testing.assert_array_equal(np.sort(got), np.sort(keep))


def test_box_iou_matches_manual():
    a = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    b = jnp.asarray([[5, 5, 15, 15], [20, 20, 30, 30]], jnp.float32)
    got = np.asarray(box_iou(a, b))[0]
    np.testing.assert_allclose(got, [25 / 175, 0.0], atol=1e-6)

"""Lazy top-k decode (ops/fused_detect.py) vs the full-anchor reference path.

The fused path must agree with decode_detections + batched_nms — the two
differ only in WHEN boxes are decoded (per-candidate vs per-anchor), which the
reference proves is irrelevant because NMS candidate selection depends only on
class confidences (ultralytics/utils/ops.py:410)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ood_in_object_detection_tpu.models.head import decode_detections, REG_MAX
from ood_in_object_detection_tpu.ops import batched_nms, fused_detect


def _raw_levels(rng, b=2, nc=7, sizes=((12, 12), (6, 6), (3, 3))):
    c = 4 * REG_MAX + nc
    return [jnp.asarray(rng.normal(size=(b, h, w, c)) * 2.0, jnp.float32)
            for h, w in sizes]


@pytest.mark.parametrize("conf_thres", [0.05, 0.4])
def test_fused_matches_full_decode(rng, conf_thres):
    nc = 7
    raw = _raw_levels(rng, nc=nc)
    boxes_xywh, cls_logits, _ = decode_detections(raw, nc)
    ref = batched_nms(boxes_xywh, cls_logits, conf_thres=conf_thres,
                      iou_thres=0.45, max_det=20, pre_nms_k=64)
    out = fused_detect(raw, nc, conf_thres, iou_thres=0.45, max_det=20,
                       pre_nms_k=64)
    det = out.det
    np.testing.assert_array_equal(np.asarray(det.valid), np.asarray(ref.valid))
    v = np.asarray(ref.valid)
    assert v.any()
    np.testing.assert_array_equal(np.asarray(det.anchor_idx)[v],
                                  np.asarray(ref.anchor_idx)[v])
    np.testing.assert_array_equal(np.asarray(det.cls)[v], np.asarray(ref.cls)[v])
    np.testing.assert_allclose(np.asarray(det.conf)[v], np.asarray(ref.conf)[v],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(det.boxes)[v], np.asarray(ref.boxes)[v],
                               rtol=1e-4, atol=1e-3)
    # per-box logits match a direct gather from the full logits tensor
    want = np.take_along_axis(np.asarray(cls_logits),
                              np.asarray(ref.anchor_idx)[..., None], axis=1)
    np.testing.assert_allclose(np.asarray(out.logits)[v], want[v], rtol=1e-5)


def test_dfl_per_chunk_max_no_underflow(rng):
    """A 16-bin chunk sitting ~200 below another chunk's max must still produce
    the reference per-chunk softmax expectation (advisor r2 #3: a shared
    anchor-wide rowmax underflowed such chunks to distance 0)."""
    from ood_in_object_detection_tpu.ops.fused_detect import nhwc_dfl_boxes

    nc, h, w = 3, 4, 4
    raw = rng.normal(size=(1, h, w, 4 * REG_MAX + nc)).astype(np.float32)
    # chunk 0 (left) huge, chunk 2 (right) tiny: shared-rowmax would zero chunk 2
    raw[..., :REG_MAX] += 200.0
    raw[..., 2 * REG_MAX + 5] = 3.0  # right-dist chunk peaked at bin 5
    got = np.asarray(nhwc_dfl_boxes(jnp.asarray(raw), stride=8.0))

    x = raw[..., : 4 * REG_MAX].reshape(1, h, w, 4, REG_MAX).astype(np.float64)
    p = np.exp(x - x.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    dist = (p * np.arange(REG_MAX)).sum(-1)  # (1,H,W,4) ltrb
    gx = (np.arange(w) + 0.5)[None, None, :]
    gy = (np.arange(h) + 0.5)[None, :, None]
    want = np.stack([(gx - dist[..., 0]) * 8.0, (gy - dist[..., 1]) * 8.0,
                     (gx + dist[..., 2]) * 8.0, (gy + dist[..., 3]) * 8.0], -1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
    # the right edge reflects bin≈5, not the anchor point
    assert np.all(dist[..., 2] > 2.0)


def test_fused_zeroes_invalid_rows(rng):
    nc = 7
    raw = _raw_levels(rng, nc=nc)
    out = fused_detect(raw, nc, conf_thres=0.995, max_det=20, pre_nms_k=64)
    inv = ~np.asarray(out.det.valid)
    assert inv.any()
    assert np.all(np.asarray(out.logits)[inv] == 0)
    assert np.all(np.asarray(out.det.boxes)[inv] == 0)


def test_engine_fused_matches_unfused():
    from ood_in_object_detection_tpu.engine import Detector

    det_f = Detector.create("yolov8n", nc=5, img_size=96)
    det_u = Detector.create("yolov8n", nc=5, img_size=96)
    det_u = type(det_u)(model=det_u.model, variables=det_f.variables,
                        img_size=96, fused=False)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 96, 96, 3))
    a = det_f.predict(imgs, conf_thres=0.001, pre_nms_k=32, max_det=8)
    b = det_u.predict(imgs, conf_thres=0.001, pre_nms_k=32, max_det=8)
    np.testing.assert_array_equal(np.asarray(a.det.valid), np.asarray(b.det.valid))
    v = np.asarray(a.det.valid)
    np.testing.assert_array_equal(np.asarray(a.det.anchor_idx)[v],
                                  np.asarray(b.det.anchor_idx)[v])
    np.testing.assert_allclose(np.asarray(a.det.boxes)[v],
                               np.asarray(b.det.boxes)[v], rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(a.logits)[v], np.asarray(b.logits)[v],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(a.roi_feats)[v],
                               np.asarray(b.roi_feats)[v], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(a.exact_feats)[v],
                               np.asarray(b.exact_feats)[v], rtol=1e-4, atol=1e-4)

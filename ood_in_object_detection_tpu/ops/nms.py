"""Fixed-shape batched NMS returning keep indices (TPU/jit-native).

Replaces the reference's ``non_max_suppression_old`` which drags the extra
logits/stride tensors through every filtering step
(ultralytics/utils/ops.py:348-533). Here NMS works on static shapes with
validity masks and returns per-box *anchor indices*; callers gather logits,
strides or RoI features from those indices on device.

Semantics parity notes (vs ops.py:348-533, best-class-only path):
- candidate filter: max-class *sigmoid* score > conf_thres (ops.py:410)
- class-offset trick with max_wh=7680 for per-class NMS (ops.py:496-498)
- greedy IoU suppression in descending-confidence order, keep max_det=300
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .boxes import box_iou, xywh2xyxy

MAX_WH = 7680.0


class Detections(NamedTuple):
    """Padded per-image detections (all arrays have a leading batch dim).

    The reference returns ragged per-image tensors plus parallel lists of
    carried extras (ops.py:520-533, engine/results.py:238-281); this struct is
    the fixed-shape equivalent with `valid` as the raggedness mask and
    `anchor_idx` as the universal key into per-anchor data.
    """

    boxes: jnp.ndarray       # (B, max_det, 4) xyxy pixels
    conf: jnp.ndarray        # (B, max_det)
    cls: jnp.ndarray         # (B, max_det) int32
    anchor_idx: jnp.ndarray  # (B, max_det) int32, index into the A anchors
    valid: jnp.ndarray       # (B, max_det) bool

    @property
    def num_valid(self):
        return self.valid.sum(axis=-1)


def _nms_single(
    boxes_xywh: jnp.ndarray,   # (A, 4)
    cls_logits: jnp.ndarray,   # (A, nc)
    conf_thres: float,
    iou_thres: float,
    max_det: int,
    pre_nms_k: int,
    class_agnostic: bool,
    boxes_already_xyxy: bool,
) -> Detections:
    num_anchors = boxes_xywh.shape[0]
    k = min(pre_nms_k, num_anchors)
    scores = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    conf = scores.max(axis=-1)
    cls = scores.argmax(axis=-1).astype(jnp.int32)

    cand = conf > conf_thres
    masked_conf = jnp.where(cand, conf, -1.0)
    top_conf, top_idx = lax.top_k(masked_conf, k)
    top_boxes = boxes_xywh[top_idx]
    if not boxes_already_xyxy:
        top_boxes = xywh2xyxy(top_boxes)
    top_cls = cls[top_idx]
    top_valid = top_conf > conf_thres

    offset = jnp.where(class_agnostic, 0.0, top_cls.astype(jnp.float32) * MAX_WH)
    shifted = top_boxes + offset[:, None]
    iou = box_iou(shifted, shifted)

    def body(i, keep):
        suppress = (iou[i] > iou_thres) & keep[i] & (jnp.arange(k) > i)
        return keep & ~suppress

    keep = lax.fori_loop(0, k, body, top_valid)

    final_conf = jnp.where(keep, top_conf, -1.0)
    md = min(max_det, k)
    sel_conf, sel = lax.top_k(final_conf, md)
    valid = sel_conf > conf_thres
    z = jnp.where(valid, 1.0, 0.0)
    pad = max_det - md

    def p(x):
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths)

    return Detections(
        boxes=p(top_boxes[sel] * z[:, None]),
        conf=p(jnp.where(valid, sel_conf, 0.0)),
        cls=p(jnp.where(valid, top_cls[sel], 0)),
        anchor_idx=p(jnp.where(valid, top_idx[sel], 0)),
        valid=p(valid),
    )


def batched_nms(
    boxes_xywh: jnp.ndarray,
    cls_logits: jnp.ndarray,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    pre_nms_k: int = 2048,
    class_agnostic: bool = False,
    boxes_already_xyxy: bool = False,
) -> Detections:
    """Batched fixed-shape NMS.

    Args:
        boxes_xywh: (B, A, 4) decoded cxcywh boxes in pixels.
        cls_logits: (B, A, nc) pre-sigmoid class logits.
    Returns:
        Detections with (B, max_det, ...) padded arrays + validity mask.
    """
    fn = lambda b, l: _nms_single(
        b, l, conf_thres, iou_thres, max_det, pre_nms_k, class_agnostic, boxes_already_xyxy
    )
    return jax.vmap(fn)(boxes_xywh, cls_logits)

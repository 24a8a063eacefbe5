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

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .boxes import box_iou, xywh2xyxy

MAX_WH = 7680.0


def _greedy_keep_tiled(boxes: jnp.ndarray, valid: jnp.ndarray, iou_thres: float,
                       tile: int = 128) -> jnp.ndarray:
    """Greedy NMS keep-mask over score-sorted boxes in O(k/T) outer steps
    instead of O(k) (the tiled scheme TPU NMS implementations use). Within a
    tile, the resurrecting suppression map
        a' = base & ~any(sup_mat & a)
    is iterated to its fixpoint, which IS the greedy solution; a while_loop
    with an early exit runs it — suppression chains are short in practice so
    this converges in a few rounds (worst case T). Across tiles, the tile's
    survivors suppress all later boxes in one vectorized pass."""
    k = boxes.shape[0]
    tile = min(tile, k)
    nt = (k + tile - 1) // tile
    pad = nt * tile - k
    if pad:
        boxes = jnp.pad(boxes, ((0, pad), (0, 0)), constant_values=-1e6)
        valid = jnp.pad(valid, (0, pad))
    kp = nt * tile
    row_lt_col = (
        jnp.arange(tile)[:, None] < jnp.arange(tile)[None, :]
    )

    def tile_body(keep, j):
        start = j * tile
        tb = lax.dynamic_slice(boxes, (start, 0), (tile, 4))
        base = lax.dynamic_slice(keep, (start,), (tile,))
        self_iou = box_iou(tb, tb)
        sup_mat = (self_iou > iou_thres) & row_lt_col

        def cond(state):
            i, a, changed = state
            return changed & (i < tile)

        def body(state):
            i, a, _ = state
            new = base & ~jnp.any(sup_mat & a[:, None], axis=0)
            return i + 1, new, jnp.any(new != a)

        _, alive, _ = lax.while_loop(cond, body, (0, base, jnp.bool_(True)))
        keep = lax.dynamic_update_slice(keep, alive, (start,))
        # survivors of this tile suppress every later box
        cross = box_iou(tb, boxes) > iou_thres          # (tile, kp)
        later = jnp.arange(kp) >= (start + tile)
        sup_later = jnp.any(cross & alive[:, None], axis=0) & later
        return keep & ~sup_later, None

    keep, _ = lax.scan(tile_body, valid, jnp.arange(nt))
    return keep[:k]


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


def suppress_and_select(
    top_boxes: jnp.ndarray,   # (k, 4) xyxy, descending-confidence order
    top_conf: jnp.ndarray,    # (k,)
    top_cls: jnp.ndarray,     # (k,) int32
    top_idx: jnp.ndarray,     # (k,) flat anchor indices
    conf_thres,
    iou_thres: float,
    max_det: int,
    class_agnostic: bool,
) -> Tuple[Detections, jnp.ndarray]:
    """Greedy suppression over pre-selected candidates + final top-max_det.

    Shared by the full-decode path (`_nms_single`) and the lazy top-k decode
    path (`ops/fused_detect.py`). Returns the Detections plus `sel` — the
    per-detection index into the k candidates, so callers can gather any
    per-candidate extras (e.g. pre-sigmoid logits) without a second pass.
    """
    k = top_boxes.shape[0]
    top_valid = top_conf > conf_thres
    offset = jnp.where(class_agnostic, 0.0, top_cls.astype(jnp.float32) * MAX_WH)
    shifted = top_boxes + offset[:, None]
    if jax.default_backend() == "tpu" and 512 < k <= 1024:
        # in-VMEM Pallas fixpoint (ops/pallas/nms.py): same greedy semantics,
        # no HBM round trips for the IoU tiles
        from .pallas.nms import greedy_keep_pallas

        keep = greedy_keep_pallas(shifted, top_valid, iou_thres)
    else:
        keep = _greedy_keep_tiled(shifted, top_valid, iou_thres)

    final_conf = jnp.where(keep, top_conf, -1.0)
    md = min(max_det, k)
    sel_conf, sel = lax.top_k(final_conf, md)
    valid = sel_conf > conf_thres
    z = jnp.where(valid, 1.0, 0.0)
    pad = max_det - md

    def p(x):
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths)

    # candidate lookup as one-hot masked sums: three fancy-index gathers here
    # cost ~tens of ns per row on TPU (PERF.md); the (md, k) compare+sum
    # passes are cheap VPU work and exact for the int fields
    sel_oh = sel[:, None] == jnp.arange(k, dtype=sel.dtype)       # (md, k)
    boxes_sel = jnp.sum(
        jnp.where(sel_oh[..., None], top_boxes[None, :, :], 0.0), axis=1)
    cls_sel = jnp.sum(jnp.where(sel_oh, top_cls[None, :], 0), axis=1)
    idx_sel = jnp.sum(jnp.where(sel_oh, top_idx[None, :], 0), axis=1)

    det = Detections(
        boxes=p(boxes_sel * z[:, None]),
        conf=p(jnp.where(valid, sel_conf, 0.0)),
        cls=p(jnp.where(valid, cls_sel, 0)),
        anchor_idx=p(jnp.where(valid, idx_sel, 0)),
        valid=p(valid),
    )
    return det, p(jnp.where(valid, sel, 0))


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

    det, _ = suppress_and_select(top_boxes, top_conf, top_cls, top_idx,
                                 conf_thres, iou_thres, max_det, class_agnostic)
    return det


def batched_nms(
    boxes_xywh: jnp.ndarray,
    cls_logits: jnp.ndarray,
    conf_thres: float = 0.25,
    iou_thres: float = 0.7,  # ultralytics predict default (cfg/default.yaml:57)
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
    # conf_thres may be a traced scalar (benchmark sweeps vary it without
    # recompiling); iou/max_det/pre_nms_k stay static (they shape the graph)
    fn = lambda b, l, c: _nms_single(
        b, l, c, iou_thres, max_det, pre_nms_k, class_agnostic, boxes_already_xyxy
    )
    return jax.vmap(fn, in_axes=(0, 0, None))(
        boxes_xywh, cls_logits, jnp.asarray(conf_thres, jnp.float32))

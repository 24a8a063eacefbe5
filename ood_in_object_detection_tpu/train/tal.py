"""Task-Aligned Assigner in pure JAX (fixed shapes, padded GT).

Semantics parity with the reference TaskAlignedAssigner
(ultralytics/utils/tal.py:14-230): align metric = score^alpha * CIoU^beta
(CIoU clamped at 0, tal.py iou_calculation),
candidates restricted to anchors inside the GT box, top-k (10) candidates per
GT, multi-GT conflicts resolved by highest IoU, target scores normalized by
(max IoU / max metric) per GT.

The reference masks ragged GT lists via mask_gt; here GT are padded to a
static ``max_gt`` with a validity mask, so the whole assignment is one fused
batched computation under jit.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


def ciou(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Complete IoU between box pairs (..., 4) xyxy, broadcasting
    (reference utils/metrics.py bbox_iou CIoU=True; a=box1, b=box2)."""
    ax1, ay1, ax2, ay2 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx1, by1, bx2, by2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    aw, ah = ax2 - ax1, ay2 - ay1
    bw, bh = bx2 - bx1, by2 - by1
    inter = jnp.clip(jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1), 0) * jnp.clip(
        jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1), 0
    )
    union = aw * ah + bw * bh - inter + eps
    iou = inter / union
    cw = jnp.maximum(ax2, bx2) - jnp.minimum(ax1, bx1)
    ch = jnp.maximum(ay2, by2) - jnp.minimum(ay1, by1)
    c2 = cw**2 + ch**2 + eps
    rho2 = ((bx1 + bx2 - ax1 - ax2) ** 2 + (by1 + by2 - ay1 - ay2) ** 2) / 4
    v = (4 / math.pi**2) * (jnp.arctan(bw / (bh + eps)) - jnp.arctan(aw / (ah + eps))) ** 2
    alpha = v / (v - iou + (1 + eps))
    alpha = jax.lax.stop_gradient(alpha)
    return iou - (rho2 / c2 + v * alpha)


class AssignResult(NamedTuple):
    target_bboxes: jnp.ndarray  # (B, A, 4) xyxy (grid units)
    target_scores: jnp.ndarray  # (B, A, nc) soft targets
    fg_mask: jnp.ndarray        # (B, A) bool
    target_gt_idx: jnp.ndarray  # (B, A) int32


def iou_xyxy(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Pairwise IoU between (..., N, 4) and (..., M, 4) -> (..., N, M)."""
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[..., 2] - a[..., 0], 0) * jnp.clip(a[..., 3] - a[..., 1], 0)
    area_b = jnp.clip(b[..., 2] - b[..., 0], 0) * jnp.clip(b[..., 3] - b[..., 1], 0)
    union = area_a[..., :, None] + area_b[..., None, :] - inter
    return inter / (union + eps)


def assign(
    pd_scores: jnp.ndarray,  # (B, A, nc) post-sigmoid
    pd_bboxes: jnp.ndarray,  # (B, A, 4) xyxy in grid units
    anc_points: jnp.ndarray, # (A, 2)
    gt_labels: jnp.ndarray,  # (B, M) int32
    gt_bboxes: jnp.ndarray,  # (B, M, 4) xyxy in grid units
    gt_mask: jnp.ndarray,    # (B, M) bool
    topk: int = 10,
    alpha: float = 0.5,
    beta: float = 6.0,
    eps: float = 1e-9,
) -> AssignResult:
    B, A, nc = pd_scores.shape
    M = gt_labels.shape[1]
    topk = min(topk, A)

    # candidates: anchor centre strictly inside the gt box (tal.py select_candidates_in_gts)
    lt_ok = anc_points[None, None, :, :] - gt_bboxes[:, :, None, :2]   # (B, M, A, 2)
    rb_ok = gt_bboxes[:, :, None, 2:] - anc_points[None, None, :, :]
    in_gts = jnp.concatenate([lt_ok, rb_ok], -1).min(-1) > eps          # (B, M, A)

    # alignment metric
    gt_lab = jnp.clip(gt_labels, 0, nc - 1)
    scores_for_gt = jnp.take_along_axis(
        pd_scores.transpose(0, 2, 1), gt_lab[:, :, None], axis=1
    )                                                                   # (B, M, A)
    # overlap metric is CIoU clamped at 0, not plain IoU (reference
    # tal.py iou_calculation: bbox_iou(..., CIoU=True).clamp_(0)); it feeds
    # both the align metric and the pos_iou_max soft-target normalization
    ious = jnp.clip(ciou(gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :]), 0.0)
    align = (scores_for_gt**alpha) * (ious**beta)                       # (B, M, A)

    valid = in_gts & gt_mask[:, :, None]
    align_masked = jnp.where(valid, align, 0.0)

    # top-k per gt among candidates (tal.py select_topk_candidates: with the
    # mask_gt topk_mask the reference applies NO value floor — zero-metric
    # picks are later removed by the in_gts/valid intersection).
    # Selection runs as k unrolled argmax+mask-out rounds instead of
    # lax.top_k + scatter: identical picks (both are first-index-stable over
    # ties), and the sort-based top_k plus the (B*M) scatters measured ~4x
    # the cost of these k cheap VPU passes on v5e (PERF.md).
    arange_a = jnp.arange(A, dtype=jnp.int32)
    x = align_masked
    mask_topk = jnp.zeros((B, M, A), bool)
    for _ in range(topk):
        am = jnp.argmax(x, axis=-1)                                     # (B, M)
        oh = am[..., None] == arange_a                                  # (B, M, A)
        mask_topk = mask_topk | (oh & gt_mask[:, :, None])
        x = jnp.where(oh, -1.0, x)
    mask_pos = mask_topk & valid                                        # (B, M, A)

    # conflicts: anchor claimed by >1 gt -> keep gt with max IoU
    claimed = mask_pos.sum(axis=1)                                      # (B, A)
    iou_for_claims = jnp.where(mask_pos, ious, -1.0)
    best_gt = jnp.argmax(iou_for_claims, axis=1)                        # (B, A)
    multi = claimed > 1
    onehot_best = jax.nn.one_hot(best_gt, M, dtype=bool).transpose(0, 2, 1)  # (B, M, A)
    mask_pos = jnp.where(multi[:, None, :], mask_pos & onehot_best, mask_pos)

    fg_mask = mask_pos.any(axis=1)                                      # (B, A)
    target_gt_idx = jnp.argmax(mask_pos, axis=1).astype(jnp.int32)      # (B, A)

    # per-anchor GT lookup as a one-hot masked sum (a take_along_axis here
    # is B*A row gathers at ~15 ns each — several ms/step; see PERF.md).
    # NOT an einsum: TPU matmuls at default precision truncate f32 operands
    # to bf16, which would quantize pixel-space target boxes (~2 px at 640)
    # and round class ids > 256.
    sel = target_gt_idx[:, :, None] == jnp.arange(M, dtype=jnp.int32)   # (B, A, M)
    tb = jnp.sum(jnp.where(sel[..., None], gt_bboxes[:, None, :, :], 0.0),
                 axis=2)                                                # (B, A, 4)
    tl = jnp.sum(jnp.where(sel, gt_lab[:, None, :], 0), axis=2)         # (B, A)

    # normalized soft targets (tal.py:150-176)
    align_pos = jnp.where(mask_pos, align, 0.0)
    iou_pos = jnp.where(mask_pos, ious, 0.0)
    pos_align_max = align_pos.max(axis=-1, keepdims=True)               # (B, M, 1)
    pos_iou_max = iou_pos.max(axis=-1, keepdims=True)
    norm_align = align_pos * pos_iou_max / (pos_align_max + eps)        # (B, M, A)
    anchor_score = norm_align.max(axis=1)                               # (B, A)

    t_scores = jax.nn.one_hot(tl, nc) * anchor_score[..., None]
    t_scores = jnp.where(fg_mask[..., None], t_scores, 0.0)
    return AssignResult(tb, t_scores, fg_mask, target_gt_idx)

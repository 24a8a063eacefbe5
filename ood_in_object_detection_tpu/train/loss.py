"""YOLOv8-family detection loss in pure JAX.

Semantics parity with reference v8DetectionLoss (ultralytics/utils/loss.py):
BCE classification on TAL soft targets, CIoU box loss and Distribution Focal
Loss on assigned anchors, gains box=7.5 / cls=0.5 / dfl=1.5
(cfg/default.yaml). Operates on fixed-shape padded GT batches.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..models.head import REG_MAX, make_anchors
from .tal import assign, ciou  # noqa: F401 — ciou re-exported (lives in tal
                               # so the assigner's CIoU metric shares one impl)


class LossBreakdown(NamedTuple):
    total: jnp.ndarray
    box: jnp.ndarray
    cls: jnp.ndarray
    dfl: jnp.ndarray


def df_loss(pred_dist: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Distribution Focal Loss (reference utils/loss.py BboxLoss._df_loss):
    cross-entropy against the two integer bins bracketing the target,
    linearly weighted. pred_dist (..., 4, reg_max) logits, target (..., 4)."""
    tl = jnp.floor(target).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(jnp.float32) - target
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(pred_dist, axis=-1)
    # bin selection as a one-hot reduction, NOT take_along_axis: a per-element
    # lane gather costs ~15 ns/row on TPU — 2x (B*A*4) of them measured ~30 ms
    # per batch-32 step (PERF.md); the one-hot compare is pure VPU work.
    bins = jnp.arange(REG_MAX, dtype=jnp.int32)
    sel_l = jnp.clip(tl, 0, REG_MAX - 1)[..., None] == bins
    sel_r = jnp.clip(tr, 0, REG_MAX - 1)[..., None] == bins
    ce_l = -jnp.sum(jnp.where(sel_l, logp, 0.0), axis=-1)
    ce_r = -jnp.sum(jnp.where(sel_r, logp, 0.0), axis=-1)
    return (ce_l * wl + ce_r * wr).mean(axis=-1)


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def detection_loss(
    raw_levels: Sequence[jnp.ndarray],  # 3 x (B, H, W, 4*reg_max+nc)
    gt_labels: jnp.ndarray,             # (B, M) int32 (-1 or masked = pad)
    gt_bboxes_xyxy: jnp.ndarray,        # (B, M, 4) in input-image pixels
    gt_mask: jnp.ndarray,               # (B, M) bool
    nc: int,
    box_gain: float = 7.5,
    cls_gain: float = 0.5,
    dfl_gain: float = 1.5,
    assign_topk: int = 10,
) -> LossBreakdown:
    """Total loss * batch_size, as in the reference trainer
    (utils/loss.py v8DetectionLoss.__call__ returns loss.sum() * batch_size)."""
    B = raw_levels[0].shape[0]
    hw = [(f.shape[1], f.shape[2]) for f in raw_levels]
    anchors, strides = make_anchors(hw)                   # grid units / (A,)
    flat = [f.reshape(B, -1, f.shape[-1]) for f in raw_levels]
    x = jnp.concatenate(flat, axis=1).astype(jnp.float32)  # (B, A, 64+nc)
    pred_dist = x[..., : 4 * REG_MAX].reshape(B, -1, 4, REG_MAX)
    pred_logits = x[..., 4 * REG_MAX:]

    # decode boxes in grid units for assignment (loss.py bbox_decode)
    probs = jax.nn.softmax(pred_dist, axis=-1)
    dist = jnp.einsum("bakr,r->bak", probs, jnp.arange(REG_MAX, dtype=jnp.float32))
    x1y1 = anchors[None] - dist[..., :2]
    x2y2 = anchors[None] + dist[..., 2:]
    pd_bboxes = jnp.concatenate([x1y1, x2y2], -1)         # (B, A, 4) grid units

    # assignment happens in image pixels (loss.py: pred_bboxes * stride_tensor)
    pd_img = pd_bboxes * strides[None, :, None]
    anc_img = anchors * strides[:, None]

    res = assign(
        jax.nn.sigmoid(pred_logits),
        pd_img,
        anc_img,
        jnp.clip(gt_labels, 0, nc - 1).astype(jnp.int32),
        gt_bboxes_xyxy,
        gt_mask,
        topk=assign_topk,
    )
    # the reference assigner runs under @torch.no_grad() (utils/tal.py:40):
    # targets are constants wrt the prediction — without this the backward
    # pass carries large extra terms through the alignment metric and every
    # parameter's gradient deviates from the reference (loss VALUES match,
    # gradients do not)
    res = jax.lax.stop_gradient(res)

    target_scores_sum = jnp.maximum(res.target_scores.sum(), 1.0)

    # cls
    cls_loss = bce_with_logits(pred_logits, res.target_scores).sum() / target_scores_sum

    # box + dfl on foreground anchors
    fg = res.fg_mask
    weight = res.target_scores.sum(-1)                    # (B, A)
    tboxes_grid = res.target_bboxes / strides[None, :, None]
    pboxes_grid = pd_bboxes
    iou_term = 1.0 - ciou(pboxes_grid, tboxes_grid)
    box_loss = jnp.where(fg, iou_term * weight, 0.0).sum() / target_scores_sum

    tdist = jnp.concatenate(
        [anchors[None] - tboxes_grid[..., :2], tboxes_grid[..., 2:] - anchors[None]], -1
    )
    tdist = jnp.clip(tdist, 0, REG_MAX - 1 - 0.01)
    dfl_term = df_loss(pred_dist, tdist)
    dfl_loss = jnp.where(fg, dfl_term * weight, 0.0).sum() / target_scores_sum

    total = (box_gain * box_loss + cls_gain * cls_loss + dfl_gain * dfl_loss) * B
    return LossBreakdown(total, box_loss, cls_loss, dfl_loss)


def v10_detection_loss(
    raw_one2many: Sequence[jnp.ndarray],
    raw_one2one: Sequence[jnp.ndarray],
    gt_labels: jnp.ndarray,
    gt_bboxes_xyxy: jnp.ndarray,
    gt_mask: jnp.ndarray,
    nc: int,
    **gains,
) -> LossBreakdown:
    """v10 end2end dual loss (reference utils/loss.py E2EDetectLoss): standard
    one2many TAL loss (topk=10) + one2one loss with one-to-one assignment
    (topk=1). The one2one branch already runs on detached features
    (models/head.py DetectHead dual=True)."""
    lm = detection_loss(raw_one2many, gt_labels, gt_bboxes_xyxy, gt_mask, nc,
                        assign_topk=10, **gains)
    lo = detection_loss(raw_one2one, gt_labels, gt_bboxes_xyxy, gt_mask, nc,
                        assign_topk=1, **gains)
    return LossBreakdown(lm.total + lo.total, lm.box + lo.box,
                         lm.cls + lo.cls, lm.dfl + lo.dfl)

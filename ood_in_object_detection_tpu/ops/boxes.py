"""Box coordinate utilities (pure JAX, shape-stable).

Capability parity with reference ultralytics/utils/ops.py converters and
torchvision box_iou as used by the matching step (ood_utils.py:233-292).
"""

from __future__ import annotations

import jax.numpy as jnp


def xywh2xyxy(b: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) cxcywh -> xyxy (reference utils/ops.py xywh2xyxy)."""
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy2xywh(b: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def box_area(b: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(b[..., 2] - b[..., 0], 0) * jnp.clip(b[..., 3] - b[..., 1], 0)


def box_iou(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Pairwise IoU. a: (N, 4) xyxy, b: (M, 4) xyxy -> (N, M).

    Matches torchvision.ops.box_iou semantics (no +1 pixel convention —
    the eval protocol's +1 convention lives in eval/owod_protocol.py).
    """
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return inter / (union + eps)


def pairwise_intersection_over_area(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """intersection(a_i, b_j) / area(a_i): the 'intersection with preds'
    criterion of the unknown-proposal filter (reference ood_utils.py:1003-1028)."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (box_area(a)[:, None] + eps)

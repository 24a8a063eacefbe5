"""Decoupled YOLO Detect head + jit-friendly DFL decode.

Capability parity with the reference head (ultralytics/nn/modules/head.py:23-192):
decoupled box (4*reg_max DFL bins) / class branches over 3 strides,
``make_anchors`` with 0.5 cell offset, ``dist2bbox`` xywh decode scaled by
stride (head.py:109-151, utils/tal.py:364-394).

TPU-first deviations from the reference:

- The head always emits **pre-sigmoid class logits**; the reference's
  ``output_values_before_sigmoid`` toggle (head.py:63,148-151) is unnecessary
  because downstream consumers apply sigmoid where needed. Pre-sigmoid logits
  are the canonical OoD tap.
- Decode is a pure function of the raw per-level maps so the same forward
  serves training (raw maps for the loss) and inference (decoded boxes), with
  no `self.anchors` caching — anchors are consts folded by XLA.
"""

from __future__ import annotations

import math
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv, Conv2dRaw

REG_MAX = 16
STRIDES = (8, 16, 32)


class DetectHead(nn.Module):
    """Decoupled detect head producing raw per-level maps (B, H, W, 4*reg_max+nc).

    ``style`` selects the class-branch topology:
      - "v8": Conv3-Conv3-Conv1 (reference head.py legacy branch, used by v3/5/8/9)
      - "v11": (DWConv3+Conv1)x2 + Conv1 (reference head.py non-legacy branch)
      - "v10": light class head with grouped convs (reference head.py:870-885)
    """

    nc: int = 80
    ch: Tuple[int, ...] = (256, 512, 512)
    style: str = "v8"
    dual: bool = False  # v10 end2end: extra one2one branches on detached feats
                        # (reference head.py:88-107 forward_end2end, 868-885)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], train: bool = False):
        outs = self._branches(feats, train, prefix="")
        if not self.dual:
            return outs
        detached = [jax.lax.stop_gradient(f) for f in feats]
        outs_o2o = self._branches(detached, train, prefix="one2one_")
        return outs, outs_o2o

    def _branches(self, feats: Sequence[jax.Array], train: bool, prefix: str) -> List[jax.Array]:
        assert len(feats) == len(self.ch)
        c2 = max(16, self.ch[0] // 4, REG_MAX * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        outs = []
        for i, x in enumerate(feats):
            stride = STRIDES[i]
            # box branch (cv2)
            b = Conv(c2, 3, dtype=self.dtype, name=f"{prefix}cv2_{i}_0")(x, train)
            b = Conv(c2, 3, dtype=self.dtype, name=f"{prefix}cv2_{i}_1")(b, train)
            b = Conv2dRaw(4 * REG_MAX, 1, bias_init_value=1.0, dtype=self.dtype, name=f"{prefix}cv2_{i}_2")(b)
            # cls branch (cv3); bias init log(5/nc/(640/s)^2) per reference bias_init
            cls_bias = math.log(5 / self.nc / (640 / stride) ** 2)
            if self.style == "v8":
                c = Conv(c3, 3, dtype=self.dtype, name=f"{prefix}cv3_{i}_0")(x, train)
                c = Conv(c3, 3, dtype=self.dtype, name=f"{prefix}cv3_{i}_1")(c, train)
            elif self.style == "v11":
                cin = x.shape[-1]
                c = Conv(cin, 3, g=math.gcd(cin, cin), dtype=self.dtype, name=f"{prefix}cv3_{i}_0a")(x, train)
                c = Conv(c3, 1, dtype=self.dtype, name=f"{prefix}cv3_{i}_0b")(c, train)
                c = Conv(c3, 3, g=c3, dtype=self.dtype, name=f"{prefix}cv3_{i}_1a")(c, train)
                c = Conv(c3, 1, dtype=self.dtype, name=f"{prefix}cv3_{i}_1b")(c, train)
            elif self.style == "v10":
                cin = x.shape[-1]
                c = Conv(cin, 3, g=cin, dtype=self.dtype, name=f"{prefix}cv3_{i}_0a")(x, train)
                c = Conv(c3, 1, dtype=self.dtype, name=f"{prefix}cv3_{i}_0b")(c, train)
                c = Conv(c3, 3, g=c3, dtype=self.dtype, name=f"{prefix}cv3_{i}_1a")(c, train)
                c = Conv(c3, 1, dtype=self.dtype, name=f"{prefix}cv3_{i}_1b")(c, train)
            else:
                raise ValueError(f"unknown head style {self.style}")
            c = Conv2dRaw(self.nc, 1, bias_init_value=cls_bias, dtype=self.dtype, name=f"{prefix}cv3_{i}_2")(c)
            outs.append(jnp.concatenate([b, c], axis=-1))
        return outs


def make_anchors(
    hw_per_level: Sequence[Tuple[int, int]], strides: Sequence[int] = STRIDES, offset: float = 0.5
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Anchor centres (A, 2) in grid units and per-anchor stride (A,).

    Mirrors reference utils/tal.py:364-376 (grid_cell_offset=0.5, x-fastest).
    """
    pts, sts = [], []
    for (h, w), s in zip(hw_per_level, strides):
        sx = jnp.arange(w, dtype=jnp.float32) + offset
        sy = jnp.arange(h, dtype=jnp.float32) + offset
        gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
        pts.append(jnp.stack([gx, gy], axis=-1).reshape(-1, 2))
        sts.append(jnp.full((h * w,), s, dtype=jnp.float32))
    return jnp.concatenate(pts, axis=0), jnp.concatenate(sts, axis=0)


def dfl_expectation(box_dist: jnp.ndarray) -> jnp.ndarray:
    """DFL decode: (..., 4, reg_max) logits -> (..., 4) expected distances.

    The reference does this with a frozen 1x1 conv over a softmax
    (nn/modules/block.py:56-75); here it is an einsum XLA fuses into the head.
    """
    probs = jax.nn.softmax(box_dist.astype(jnp.float32), axis=-1)
    bins = jnp.arange(REG_MAX, dtype=jnp.float32)
    return jnp.einsum("...kb,b->...k", probs, bins)


def decode_detections(
    raw_levels: Sequence[jax.Array], nc: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decode raw head maps into per-anchor boxes and logits.

    Args:
        raw_levels: per-level (B, H, W, 4*reg_max+nc) raw maps (NHWC).
        nc: number of classes.

    Returns:
        boxes_xywh: (B, A, 4) decoded boxes in input-image pixels (cxcywh),
            matching reference head.py:146 ``dist2bbox(...) * strides``.
        cls_logits: (B, A, nc) pre-sigmoid class logits.
        anchor_strides: (A,) per-anchor stride (8/16/32), the index base that
            replaces the reference's carried ``strides`` tensor
            (models/yolo/detect/predict.py:163-172).
    """
    hw = [(f.shape[1], f.shape[2]) for f in raw_levels]
    anchors, anchor_strides = make_anchors(hw)
    flat = [f.reshape(f.shape[0], -1, f.shape[-1]) for f in raw_levels]
    x = jnp.concatenate(flat, axis=1)  # (B, A, 64+nc)
    box_dist = x[..., : 4 * REG_MAX].reshape(x.shape[0], x.shape[1], 4, REG_MAX)
    cls_logits = x[..., 4 * REG_MAX :]
    dist = dfl_expectation(box_dist)  # (B, A, 4) ltrb in grid units
    lt, rb = dist[..., :2], dist[..., 2:]
    x1y1 = anchors[None] - lt
    x2y2 = anchors[None] + rb
    cxy = (x1y1 + x2y2) / 2
    wh = x2y2 - x1y1
    boxes_xywh = jnp.concatenate([cxy, wh], axis=-1) * anchor_strides[None, :, None]
    return boxes_xywh, cls_logits, anchor_strides


def anchor_level_index(num_anchors_per_level: Sequence[int]) -> jnp.ndarray:
    """(A,) int32 level index (0/1/2) for each flat anchor position."""
    idx = []
    for lvl, n in enumerate(num_anchors_per_level):
        idx.append(jnp.full((n,), lvl, dtype=jnp.int32))
    return jnp.concatenate(idx)

"""1x1 RoIAlign as a pure-JAX bilinear gather (TPU/jit-native).

Capability parity with the reference's use of torchvision.ops.roi_align with
``output_size=(1,1), aligned=False, spatial_scale=ftmap_w/img_w``
(ultralytics/models/yolo/detect/predict.py:64-70, ood_utils.py:911-917).

For a 1x1 output torchvision averages an adaptive grid of bilinear samples
over the box; adaptive sample counts are data-dependent and jit-hostile, so
this implementation averages a *static* ``samples x samples`` uniform grid of
bilinear taps over the box — same spatial semantics, fixed shapes. The per-box
stride routing (boxes go to the feature level they were predicted at,
predict.py:52-70) is handled by computing the value at every level and
selecting with the per-box level index — 300 boxes x 3 levels is trivial work
that stays on device instead of the reference's host-side bucketing.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def _bilinear_at(fmap: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sample fmap (H, W, C) at continuous coords x, y (...,) -> (..., C).

    torchvision convention (aligned=False): pixel i covers [i, i+1), sample
    coordinate maps to pixel space as coord - 0.5; out-of-range clamped after
    the -1 low-bound zero rule (torchvision zeroes y < -1; we clamp, which is
    equivalent for boxes inside the image).
    """
    h, w, _ = fmap.shape
    xs = x - 0.5
    ys = y - 0.5
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    dx = xs - x0
    dy = ys - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    v00 = fmap[y0i, x0i]
    v01 = fmap[y0i, x1i]
    v10 = fmap[y1i, x0i]
    v11 = fmap[y1i, x1i]
    wx = dx[..., None]
    wy = dy[..., None]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def roi_align_1x1_single_level(
    fmap: jnp.ndarray,        # (H, W, C)
    boxes_xyxy: jnp.ndarray,  # (N, 4) in *image* pixels
    spatial_scale: float,
    samples: int = 4,
) -> jnp.ndarray:
    """Average of samples x samples bilinear taps over each box -> (N, C)."""
    b = boxes_xyxy * spatial_scale
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    # torchvision: roi width/height floored at 1 (aligned=False)
    bw = jnp.maximum(x2 - x1, 1.0)
    bh = jnp.maximum(y2 - y1, 1.0)
    # sample centres of an SxS uniform grid over the roi
    t = (jnp.arange(samples, dtype=jnp.float32) + 0.5) / samples
    gx = x1[:, None] + t[None, :] * bw[:, None]  # (N, S)
    gy = y1[:, None] + t[None, :] * bh[:, None]  # (N, S)
    xx = jnp.broadcast_to(gx[:, None, :], (b.shape[0], samples, samples))
    yy = jnp.broadcast_to(gy[:, :, None], (b.shape[0], samples, samples))
    vals = _bilinear_at(fmap, xx, yy)  # (N, S, S, C)
    return vals.mean(axis=(1, 2))


def roi_align_1x1_multi_level(
    fmaps: Sequence[jnp.ndarray],      # per level (H_l, W_l, C_l)
    boxes_xyxy: jnp.ndarray,           # (N, 4) image pixels
    level_idx: jnp.ndarray,            # (N,) int32 in [0, L)
    img_w: int,
    samples: int = 4,
) -> jnp.ndarray:
    """RoI features routed per box to its prediction level -> (N, Cmax).

    Channel dims may differ per level (they do for non-'l' model sizes);
    outputs are zero-padded to the max channel count and callers slice with
    the per-level channel table.
    """
    cmax = max(f.shape[-1] for f in fmaps)
    feats = []
    for f in fmaps:
        scale = f.shape[1] / img_w  # width ratio, predict.py:69
        v = roi_align_1x1_single_level(f, boxes_xyxy, scale, samples)
        if v.shape[-1] < cmax:
            v = jnp.pad(v, ((0, 0), (0, cmax - v.shape[-1])))
        feats.append(v)
    stacked = jnp.stack(feats, axis=0)  # (L, N, Cmax)
    return jnp.take_along_axis(stacked, level_idx[None, :, None], axis=0)[0]


def batched_roi_align_1x1(
    fmaps: Sequence[jnp.ndarray],  # per level (B, H_l, W_l, C_l)
    boxes_xyxy: jnp.ndarray,       # (B, N, 4)
    level_idx: jnp.ndarray,        # (B, N)
    img_w: int,
    samples: int = 4,
) -> jnp.ndarray:
    fn = lambda fs, b, l: roi_align_1x1_multi_level(fs, b, l, img_w, samples)
    return jax.vmap(fn)(list(fmaps), boxes_xyxy, level_idx)

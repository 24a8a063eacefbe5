"""1x1 RoIAlign as a pure-JAX bilinear gather (TPU/jit-native).

Capability parity with the reference's use of torchvision.ops.roi_align with
``output_size=(1,1), aligned=False, spatial_scale=ftmap_w/img_w``
(ultralytics/models/yolo/detect/predict.py:64-70, ood_utils.py:911-917).

For a 1x1 output torchvision averages an adaptive ceil(roi_span)-per-axis
grid of bilinear samples over the box (sampling_ratio<=0). The TPU
formulation exploits that a uniform grid of bilinear taps is *separable*: the
pooled value equals outer(axis_weights_y, axis_weights_x) contracted with the
feature map, one dense batched MXU matmul per level — no gathers, and the
data-dependent adaptive sample count collapses into a CLOSED-FORM weight
vector with fully static shapes (arithmetic-series sums of the bilinear
hats — see _axis_weights_adaptive), exact for every span with no sample
dimension at all.
The per-box stride routing (boxes go to the feature level they were predicted
at, predict.py:52-70) is handled by computing the value at every level and
selecting with the per-box level index — 300 boxes x 3 levels is trivial work
that stays on device instead of the reference's host-side bucketing.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def _bilinear_at(fmap: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sample fmap (H, W, C) at continuous coords x, y (...,) -> (..., C).

    torchvision convention (aligned=False): the sample coordinate is used
    DIRECTLY as a fractional pixel index (pixel centers at integer coords —
    the well-known half-pixel bias that aligned=True compensates; the
    reference calls roi_align with aligned=False, predict.py:64-70), clamped
    into [0, size-1] (torchvision bilinear_interpolate sets ``y = 0`` for
    y <= 0 and y_high = y_low for y >= size-1; coords below -1/above size
    are zeroed there, which cannot happen for boxes inside the image).
    Cross-executed against the reference's own extractor in
    tests/test_reference_pipeline_parity.py.
    """
    h, w, _ = fmap.shape
    xs = jnp.clip(x, 0.0, w - 1.0)
    ys = jnp.clip(y, 0.0, h - 1.0)
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
    smax: int = None,
) -> jnp.ndarray:
    """Average of bilinear taps over each box -> (N, C).

    samples > 0: fixed samples x samples grid (torchvision sampling_ratio=S).
    samples == 0: torchvision's adaptive default, S = ceil(roi_span) per axis
    per box (capped at ADAPTIVE_SMAX) — host-side loop, used as the
    independent reference for the batched matmul path's parity tests."""
    b = boxes_xyxy * spatial_scale
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    # torchvision: roi width/height floored at 1 (aligned=False)
    bw = jnp.maximum(x2 - x1, 1.0)
    bh = jnp.maximum(y2 - y1, 1.0)
    if samples == 0:
        import numpy as np

        cap = ADAPTIVE_SMAX if smax is None else smax
        outs = []
        for i in range(b.shape[0]):
            sx = int(min(cap, max(np.ceil(float(bw[i])), 1)))
            sy = int(min(cap, max(np.ceil(float(bh[i])), 1)))
            tx = (jnp.arange(sx, dtype=jnp.float32) + 0.5) / sx
            ty = (jnp.arange(sy, dtype=jnp.float32) + 0.5) / sy
            gx = x1[i] + tx * bw[i]
            gy = y1[i] + ty * bh[i]
            xx = jnp.broadcast_to(gx[None, :], (sy, sx))
            yy = jnp.broadcast_to(gy[:, None], (sy, sx))
            outs.append(_bilinear_at(fmap, xx, yy).mean(axis=(0, 1)))
        return jnp.stack(outs, axis=0)
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
    smax: int = None,
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
        v = roi_align_1x1_single_level(f, boxes_xyxy, scale, samples, smax)
        if v.shape[-1] < cmax:
            v = jnp.pad(v, ((0, 0), (0, cmax - v.shape[-1])))
        feats.append(v)
    stacked = jnp.stack(feats, axis=0)  # (L, N, Cmax)
    return jnp.take_along_axis(stacked, level_idx[None, :, None], axis=0)[0]


# adaptive-mode sample cap of the HOST-LOOP ORACLE above (the batched path
# needs no cap — its closed-form weights are exact for every span); parity
# tests lift it via smax= to match the exact device path
ADAPTIVE_SMAX = 16


def _axis_weights(lo, span, size: int, samples: int) -> jnp.ndarray:
    """Accumulated, mean-normalized bilinear weights of a uniform axis sample
    grid onto the integer pixel grid -> (..., size).

    A bilinear tap at continuous coordinate u spreads hat weights
    max(0, 1-|u - p|) over pixels p; sample coordinates index the pixel grid
    directly (torchvision aligned=False — see _bilinear_at), and border
    clamping (both corner indices clipped into range) is equivalent to
    clamping u into [0, size-1] first. Summing the hats of all S samples
    (already divided by S) gives the axis weight vector; the 2D sample grid
    is the outer product of the two axis grids, so the 1x1 RoIAlign average
    is (wy ⊗ wx) contracted with the map.

    samples > 0: fixed S (torchvision sampling_ratio=S).
    samples == 0: torchvision's adaptive default (sampling_ratio<=0),
    S = ceil(span) per box, computed in CLOSED FORM (see
    _axis_weights_adaptive) — exact for EVERY span, no sample dimension,
    no cap (the closed form made the static sample-grid cap, and with it
    the fit-time vs eval-time sampling split, obsolete)."""
    if samples == 0:
        return _axis_weights_adaptive(lo, span, size)
    t = (jnp.arange(samples, dtype=jnp.float32) + 0.5) / samples
    u = lo[..., None] + t * span[..., None]            # (..., S)
    u = jnp.clip(u, 0.0, size - 1.0)
    p = jnp.arange(size, dtype=jnp.float32)
    hat = jnp.maximum(0.0, 1.0 - jnp.abs(u[..., None] - p))  # (..., S, size)
    return hat.sum(axis=-2) * (1.0 / samples)


def _axis_weights_adaptive(lo, span, size: int) -> jnp.ndarray:
    """Exact adaptive axis weights in closed form -> (..., size).

    The S = ceil(span) sample coordinates u_s = lo + (s+0.5)·h (h = span/S)
    form an arithmetic sequence, so the summed hat weight a cell p receives,
    Σ_s max(0, 1 - |clip(u_s) - p|), decomposes into window counts and
    arithmetic-series sums — O(size) per box with NO sample dimension,
    exact for any span (the sampled formulation needed a (..., Smax, size)
    tensor and was only exact up to the Smax cap):

    - idx(x) = #{s : u_s <= x} = floor((x - lo)/h - 0.5) + 1, clipped
    - samples with u_s < 0 clamp to cell 0 with weight 1 (torchvision
      border clamp); symmetrically u_s > size-1 -> cell size-1
    - interior samples in (p-1, p] contribute (1-p) + u_s and those in
      (p, p+1) contribute (1+p) - u_s, with Σ u_s over an index window
      [a, b) equal to (b-a)·lo + h·(b²-a²)/2.

    Numerics: windows shift by one sample only where the sample's hat
    weight crosses a continuous boundary (0 at the window edge, the split
    value at u_s = p), so float rounding of the floor() is harmless. f32
    holds b² exactly for the spans a 640-px image can produce (<= 80)."""
    n = jnp.maximum(jnp.ceil(span), 1.0)               # (...,)
    h = (span / n)[..., None]
    lo_ = lo[..., None]
    n_ = n[..., None]
    p = jnp.arange(size, dtype=jnp.float32)

    def idx(x):  # number of samples with u_s <= x, in [0, n]
        return jnp.clip(jnp.floor((x - lo_) / h - 0.5) + 1.0, 0.0, n_)

    n_left = idx(0.0)          # samples clamped to the left border
    n_in = idx(size - 1.0)     # samples at or left of the right border
    a1 = jnp.clip(idx(p - 1.0), n_left, n_in)
    a2 = jnp.clip(idx(p), n_left, n_in)
    a3 = jnp.clip(idx(p + 1.0), n_left, n_in)

    def series(a, b):  # Σ u_s for s in [a, b)
        return (b - a) * lo_ + h * (b * b - a * a) * 0.5

    left = (a2 - a1) * (1.0 - p) + series(a1, a2)
    right = (a3 - a2) * (1.0 + p) - series(a2, a3)
    w = left + right
    w = w + jnp.where(p == 0.0, n_left, 0.0)
    w = w + jnp.where(p == size - 1.0, n_ - n_in, 0.0)
    return w / n_


def roi_align_1x1_batched_level(
    fmap: jnp.ndarray,        # (B, H, W, C)
    boxes_xyxy: jnp.ndarray,  # (B, N, 4) image pixels
    spatial_scale: float,
    samples: int = 4,
) -> jnp.ndarray:
    """Batched single-level 1x1 RoIAlign as one MXU matmul -> (B, N, C).

    Same taps as roi_align_1x1_single_level (exactly, for fixed samples;
    for samples=0 the host oracle stays capped at its smax while this path
    is closed-form exact for every span), restructured for TPU: the
    S x S bilinear sample grid is separable (uniform grid ⊗ bilinear hats), so
    each box's pooled value is exactly ``Q @ flat`` with
    ``Q[n] = outer(wy[n], wx[n]) / S²`` — a dense batched matmul instead of
    per-sample row gathers (TPU gathers cost ~15 ns/row: the gather
    formulation measured 108 ms for B=128, N=300 on v5e; this runs in ~2 ms)."""
    b, h, w, c = fmap.shape
    n = boxes_xyxy.shape[1]
    bx = boxes_xyxy * spatial_scale
    x1, y1, x2, y2 = bx[..., 0], bx[..., 1], bx[..., 2], bx[..., 3]
    # torchvision: roi width/height floored at 1 (aligned=False)
    bw = jnp.maximum(x2 - x1, 1.0)
    bh = jnp.maximum(y2 - y1, 1.0)
    wx = _axis_weights(x1, bw, w, samples)                 # (B, N, W)
    wy = _axis_weights(y1, bh, h, samples)                 # (B, N, H)
    q = (wy[..., :, None] * wx[..., None, :]).reshape(b, n, h * w)
    q = q.astype(fmap.dtype)
    flat = fmap.reshape(b, h * w, c)
    out = jnp.einsum("bnk,bkc->bnc", q, flat,
                     preferred_element_type=jnp.float32)
    return out.astype(fmap.dtype)


# use the Pallas VMEM-Q kernel for levels at least this many cells (P3/P4 at
# 640 px); smaller maps (P5) stay on the XLA einsum whose Q is already tiny
PALLAS_MIN_HW = 1024


def roi_and_exact_batched(
    fmaps: Sequence[jnp.ndarray],  # per level (B, H_l, W_l, C_l)
    boxes_xyxy: jnp.ndarray,       # (B, N, 4) image pixels
    anchor_idx: jnp.ndarray,       # (B, N) flat anchor index over all levels
    level_idx: jnp.ndarray,        # (B, N) int32 in [0, L)
    img_w: int,
    samples: int = 4,
    use_pallas: bool = True,
) -> tuple:
    """Level-routed 1x1 RoIAlign *and* exact-position tap -> two (B, N, Cmax).

    The exact-position tap (the box's own anchor cell, reference
    predict.py:288-325) is RoIAlign with one-hot separable axis weights, so
    both ride one contraction per level: the one-hot (wy=e_h, wx=e_w) rows
    are appended to the bilinear hat rows and the (B, 2N, HW) weight matrix
    is contracted with the flat map — on TPU via the Pallas VMEM-Q kernel
    (ops/pallas/roi.py) for the large levels, which never materialises Q in
    HBM; elsewhere via the same einsum as roi_align_1x1_batched_level.

    Values match (batched_roi_align_1x1, engine._exact_pos_features) exactly
    on the XLA path and to dot-reduction-order tolerance on the kernel path.
    """
    cmax = max(f.shape[-1] for f in fmaps)
    n = boxes_xyxy.shape[1]
    on_tpu = jax.default_backend() == "tpu"
    roi_out = exact_out = None
    off = 0
    for li, f in enumerate(fmaps):
        b, h, w, c = f.shape
        scale = w / img_w  # width ratio, predict.py:69
        bx = boxes_xyxy * scale
        x1, y1 = bx[..., 0], bx[..., 1]
        bw = jnp.maximum(bx[..., 2] - x1, 1.0)
        bh = jnp.maximum(bx[..., 3] - y1, 1.0)
        wx = _axis_weights(x1, bw, w, samples)              # (B, N, W)
        wy = _axis_weights(y1, bh, h, samples)              # (B, N, H)
        # exact tap as one-hot separable weights at the box's own anchor cell
        # (same clipped local index as engine._exact_pos_features)
        local = jnp.clip(anchor_idx - off, 0, h * w - 1)
        hn, wn = local // w, local % w
        ex_wx = (jnp.arange(w)[None, None, :] == wn[..., None]).astype(jnp.float32)
        ex_wy = (jnp.arange(h)[None, None, :] == hn[..., None]).astype(jnp.float32)
        wx_all = jnp.concatenate([wx, ex_wx], axis=1)       # (B, 2N, W)
        wy_all = jnp.concatenate([wy, ex_wy], axis=1)       # (B, 2N, H)
        if use_pallas and on_tpu and w <= 128 and h * w >= PALLAS_MIN_HW:
            from .pallas.roi import roi_matmul_level_pallas

            v = roi_matmul_level_pallas(f, wx_all, wy_all, variant="twostage")
        else:
            q = (wy_all[..., :, None] * wx_all[..., None, :]
                 ).reshape(b, 2 * n, h * w).astype(f.dtype)
            v = jnp.einsum("bnk,bkc->bnc", q, f.reshape(b, h * w, c),
                           preferred_element_type=jnp.float32)
        v = v.astype(f.dtype)
        if c < cmax:
            v = jnp.pad(v, ((0, 0), (0, 0), (0, cmax - c)))
        v_roi, v_ex = v[:, :n], v[:, n:]
        in_level = (anchor_idx >= off) & (anchor_idx < off + h * w)
        roi_out = v_roi if roi_out is None else jnp.where(
            (level_idx == li)[..., None], v_roi, roi_out)
        exact_out = v_ex if exact_out is None else jnp.where(
            in_level[..., None], v_ex, exact_out)
        off += h * w
    return roi_out, exact_out


def batched_roi_align_1x1(
    fmaps: Sequence[jnp.ndarray],  # per level (B, H_l, W_l, C_l)
    boxes_xyxy: jnp.ndarray,       # (B, N, 4)
    level_idx: jnp.ndarray,        # (B, N)
    img_w: int,
    samples: int = 4,
) -> jnp.ndarray:
    """Per-box level-routed 1x1 RoIAlign -> (B, N, Cmax), zero-padded to the
    widest level. Values match roi_align_1x1_multi_level (same taps for
    fixed samples; at samples=0 this path is closed-form exact for every
    span while the host oracle caps at its smax); each level is computed
    batched and the per-box level select happens on the (B, N, C) results."""
    cmax = max(f.shape[-1] for f in fmaps)
    out = None
    for li, f in enumerate(fmaps):
        scale = f.shape[2] / img_w  # width ratio, predict.py:69
        v = roi_align_1x1_batched_level(f, boxes_xyxy, scale, samples)
        if v.shape[-1] < cmax:
            v = jnp.pad(v, ((0, 0), (0, 0), (0, cmax - v.shape[-1])))
        out = v if out is None else jnp.where(
            (level_idx == li)[..., None], v, out)
    return out


def roi_align_1x1_single_level_np(fmap, boxes_xyxy, spatial_scale: float,
                                  samples: int = 4):
    """Pure-NumPy mirror of ``roi_align_1x1_single_level`` (fixed-grid
    branch): (H, W, C) fmap + (N, 4) boxes -> (N, C).

    Exists for HOST-side tails over a handful of boxes when the feature map
    already lives on the host (offline extraction, slim-cache batches,
    transform_fn methods): a few 1x1 bilinear taps on an (80, 80, C) map are
    microseconds in NumPy. When the map is device-resident the eval loop
    uses the fixed-shape jnp path instead (ood/pipeline.py
    _rank_matrix_device) so the map never crosses the wire. Equality vs the
    jnp version is pinned in tests/test_roi_align.py."""
    import numpy as np

    fmap = np.asarray(fmap, np.float32)
    b = np.asarray(boxes_xyxy, np.float32) * np.float32(spatial_scale)
    if len(b) == 0:
        return np.zeros((0, fmap.shape[-1]), np.float32)
    h, w, _ = fmap.shape
    x1, y1 = b[:, 0], b[:, 1]
    bw = np.maximum(b[:, 2] - x1, 1.0)
    bh = np.maximum(b[:, 3] - y1, 1.0)
    t = ((np.arange(samples, dtype=np.float32) + 0.5) / samples)
    gx = x1[:, None] + t[None, :] * bw[:, None]          # (N, S)
    gy = y1[:, None] + t[None, :] * bh[:, None]          # (N, S)
    xs = np.clip(gx[:, None, :], 0.0, w - 1.0)           # (N, 1, S) -> bcast
    ys = np.clip(gy[:, :, None], 0.0, h - 1.0)           # (N, S, 1)
    xs, ys = np.broadcast_arrays(xs, ys)
    x0 = np.floor(xs); y0 = np.floor(ys)
    dx = (xs - x0).astype(np.float32)[..., None]
    dy = (ys - y0).astype(np.float32)[..., None]
    x0i = np.clip(x0.astype(np.int32), 0, w - 1)
    x1i = np.clip(x0i + 1, 0, w - 1)
    y0i = np.clip(y0.astype(np.int32), 0, h - 1)
    y1i = np.clip(y0i + 1, 0, h - 1)
    v00 = fmap[y0i, x0i]; v01 = fmap[y0i, x1i]
    v10 = fmap[y1i, x0i]; v11 = fmap[y1i, x1i]
    vals = (v00 * (1 - dx) * (1 - dy) + v01 * dx * (1 - dy)
            + v10 * (1 - dx) * dy + v11 * dx * dy)       # (N, S, S, C)
    return vals.mean(axis=(1, 2))

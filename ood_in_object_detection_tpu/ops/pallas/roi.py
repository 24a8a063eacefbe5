"""Pallas TPU kernel: 1x1 RoIAlign (+ exact-position tap) without the HBM
Q-weight tensor.

The XLA separable-matmul RoIAlign (ops/roi_align.py) is exact and fast, but
materialises the per-box weight matrix ``Q = outer(wy, wx)`` in HBM —
(B, N, H*W) is ~0.5 GB per level at serving batch, and its write+read is the
dominant cost of the distance-method eval step (measured ~4.4 ms of a 24.5 ms
step at batch 128; scripts/bench_distance_ladder.py). The exact-position tap
(reference predict.py:288-325) was a further ~1.8 ms of per-row dynamic
gathers (TPU gathers cost ~15 ns/row, PERF.md).

This kernel removes both:

- the exact-position tap is *folded into the RoI matmul*: a one-hot row pair
  (wy=e_h, wx=e_w at the box's own anchor cell) is appended to the bilinear
  hat weights, so ``exact = Q_onehot @ flat`` rides the same contraction —
  RoIAlign and the exact tap differ only in their separable axis weights,
- Q is built *in VMEM* per (batch, box-tile) program and dotted with the
  level's feature map in place; HBM sees only the (already materialised)
  feature map, the small axis-weight tensors and the (B, N2, C) outputs.

Feature-map layout: the map arrives flattened to (B, H*128, C) with each
image row zero-padded from W to 128 lanes — this makes the in-kernel Q rows
assemble with 128-lane-aligned static stores (q[:, h*128:(h+1)*128]), which
Mosaic lowers to plain vreg moves. The zero lanes contribute nothing to the
dot. The XLA-side pad+reshape is one fused copy of the map (~0.3 ms at
batch 128 for P3).

Numerics match ops/roi_align.py's batched path: hats are computed in f32 by
XLA, the outer product is formed in f32 and cast to the map dtype (exactly
the ``q.astype(fmap.dtype)`` of the XLA path), and the dot accumulates in
f32.

Reference semantics: torchvision roi_align output_size=(1,1), aligned=False
(ultralytics/models/yolo/detect/predict.py:64-70); exact tap predict.py:
288-325. Parity is asserted against the XLA path (tests/test_pallas_roi.py)
which itself is cross-executed against the reference's own extractor
(tests/test_reference_pipeline_parity.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_tile(n2: int, cap: int = 256) -> int:
    """Smallest 8-multiple tile covering n2 in ceil(n2/cap) steps."""
    steps = max(1, -(-n2 // cap))
    return _round_up(-(-n2 // steps), 8)


def _q_dot_kernel(wx_ref, wy_ref, f_ref, out_ref, q_ref, *, H: int):
    """Per-(b, tile) program: build Q rows in VMEM, one MXU dot.

    wx: (1, TN, 128) f32 lane-padded axis weights (zeros beyond W)
    wy: (1, TN, H)   f32
    f:  (1, H*128, C) map dtype, W lane-padded flat map
    q scratch: (TN, H*128) map dtype
    """
    wx = wx_ref[0]
    wy = wy_ref[0]
    dt = q_ref.dtype
    for h in range(H):
        q_ref[:, h * LANE:(h + 1) * LANE] = (wy[:, h:h + 1] * wx).astype(dt)
    out_ref[0] = jnp.dot(q_ref[:], f_ref[0],
                         preferred_element_type=jnp.float32)


def _q_dot_kernel_expand(wx_ref, wy_ref, f_ref, e_ref, out_ref, *, H: int):
    """Variant: expand wy via one MXU matmul with a constant replication
    matrix E[h, h*128+j] = 1 instead of H per-lane broadcasts."""
    wx = wx_ref[0]                       # (TN, 128)
    wy = wy_ref[0]                       # (TN, H)
    f = f_ref[0]                         # (H*128, C)
    wy_exp = jnp.dot(wy.astype(f.dtype), e_ref[:],
                     preferred_element_type=jnp.float32)  # (TN, H*128)
    wx_tiled = jnp.concatenate([wx] * H, axis=1)          # (TN, H*128)
    q = (wy_exp * wx_tiled).astype(f.dtype)
    out_ref[0] = jnp.dot(q, f, preferred_element_type=jnp.float32)


def _two_stage_kernel(wx_ref, wy_ref, f2_ref, e_ref, s_ref, out_ref):
    """Q-free separable contraction: three plain MXU dots, no lane shuffles.

    out[n,c] = sum_h wy[n,h] * (sum_w wx[n,w] * f[h,w,c]) computed as
      r   = wx @ f2      f2[w, h*C+c] = f[h,w,c]   (transposed flat map)
      wye = wy @ E       E[h, h*C+j] = 1           (block replication)
      out = (r*wye) @ S  S[h*C+j, c] = (j==c)      (stacked identities)
    r/wye/p never leave VMEM; no Q tensor exists in any memory space.
    """
    dt = f2_ref.dtype
    f2 = f2_ref[0]                                   # (128, H*C)
    r = jnp.dot(wx_ref[0].astype(dt), f2,
                preferred_element_type=jnp.float32)  # (TN, H*C)
    wye = jnp.dot(wy_ref[0].astype(dt), e_ref[:],
                  preferred_element_type=jnp.float32)
    p = (r * wye).astype(dt)
    out_ref[0] = jnp.dot(p, s_ref[:], preferred_element_type=jnp.float32)


def roi_matmul_level_two_stage(
    fmap: jnp.ndarray,     # (B, H, W, C)
    wx: jnp.ndarray,       # (B, N2, W) f32
    wy: jnp.ndarray,       # (B, N2, H) f32
) -> jnp.ndarray:
    """-> (B, N2, C) f32; same contract as roi_matmul_level_pallas."""
    b, h, w, c = fmap.shape
    n2 = wx.shape[1]
    if w > LANE:
        raise ValueError(f"roi kernel requires W <= {LANE}, got {w}")
    tn = _pick_tile(n2, cap=128)
    npad = _round_up(n2, tn)
    f2 = jnp.pad(fmap.transpose(0, 2, 1, 3).reshape(b, w, h * c),
                 ((0, 0), (0, LANE - w), (0, 0)))
    e = np.zeros((h, h * c), np.float32)
    e[np.arange(h)[:, None],
      np.arange(h)[:, None] * c + np.arange(c)[None, :]] = 1.0
    s = np.tile(np.eye(c, dtype=np.float32), (h, 1))   # (H*C, C)
    wxp = jnp.pad(wx.astype(jnp.float32),
                  ((0, 0), (0, npad - n2), (0, LANE - w)))
    wyp = jnp.pad(wy.astype(jnp.float32), ((0, 0), (0, npad - n2), (0, 0)))
    out = pl.pallas_call(
        _two_stage_kernel,
        grid=(b, npad // tn),
        in_specs=[
            pl.BlockSpec((1, tn, LANE), lambda i, t: (i, t, 0)),
            pl.BlockSpec((1, tn, h), lambda i, t: (i, t, 0)),
            pl.BlockSpec((1, LANE, h * c), lambda i, t: (i, 0, 0)),
            pl.BlockSpec((h, h * c), lambda i, t: (0, 0)),
            pl.BlockSpec((h * c, c), lambda i, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tn, c), lambda i, t: (i, t, 0)),
        out_shape=jax.ShapeDtypeStruct((b, npad, c), jnp.float32),
    )(wxp, wyp, f2, jnp.asarray(e, fmap.dtype), jnp.asarray(s, fmap.dtype))
    return out[:, :n2]


def roi_matmul_level_pallas(
    fmap: jnp.ndarray,     # (B, H, W, C) feature map (any float dtype)
    wx: jnp.ndarray,       # (B, N2, W) f32 separable axis weights
    wy: jnp.ndarray,       # (B, N2, H) f32
    variant: str = "store",
) -> jnp.ndarray:
    """-> (B, N2, C) f32: per-row ``outer(wy, wx) . fmap`` contraction.

    Rows may be bilinear hats (RoI), one-hots (exact tap), or any other
    separable weighting. Requires W <= 128 (always true for 640-1024 px
    inputs at strides 8/16/32).
    """
    if variant == "twostage":
        return roi_matmul_level_two_stage(fmap, wx, wy)
    b, h, w, c = fmap.shape
    n2 = wx.shape[1]
    if w > LANE:
        raise ValueError(f"roi kernel requires W <= {LANE}, got {w}")
    tn = _pick_tile(n2)
    npad = _round_up(n2, tn)
    flat = jnp.pad(fmap, ((0, 0), (0, 0), (0, LANE - w), (0, 0))
                   ).reshape(b, h * LANE, c)
    wxp = jnp.pad(wx.astype(jnp.float32),
                  ((0, 0), (0, npad - n2), (0, LANE - w)))
    wyp = jnp.pad(wy.astype(jnp.float32), ((0, 0), (0, npad - n2), (0, 0)))
    grid = (b, npad // tn)
    in_specs = [
        pl.BlockSpec((1, tn, LANE), lambda i, t: (i, t, 0)),
        pl.BlockSpec((1, tn, h), lambda i, t: (i, t, 0)),
        pl.BlockSpec((1, h * LANE, c), lambda i, t: (i, 0, 0)),
    ]
    args = [wxp, wyp, flat]
    if variant == "expand":
        e = np.zeros((h, h * LANE), np.float32)
        e[np.arange(h)[:, None],
          np.arange(h)[:, None] * LANE + np.arange(LANE)[None, :]] = 1.0
        args.append(jnp.asarray(e, fmap.dtype))
        in_specs.append(pl.BlockSpec((h, h * LANE), lambda i, t: (0, 0)))
        kern = functools.partial(_q_dot_kernel_expand, H=h)
        scratch = []
    else:
        kern = functools.partial(_q_dot_kernel, H=h)
        scratch = [pltpu.VMEM((tn, h * LANE), fmap.dtype)]
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tn, c), lambda i, t: (i, t, 0)),
        out_shape=jax.ShapeDtypeStruct((b, npad, c), jnp.float32),
        scratch_shapes=scratch,
    )(*args)
    return out[:, :n2]

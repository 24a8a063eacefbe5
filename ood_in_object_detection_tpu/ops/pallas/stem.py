"""Fused Pallas stem megakernel: s2d image -> conv1 -> BN -> SiLU -> conv2 ->
BN -> SiLU in one kernel with VMEM-resident intermediates.

Semantics: the first two k3/s2 Conv blocks of every YOLO backbone
(reference: first two entries of ultralytics/cfg/models/v8/yolov8.yaml +
nn/modules/conv.py Conv = conv/BN/SiLU), identical to
models/folded_stem.py::phase_folded_stem, which is the proof of the
phase-folding math and the non-TPU fallback.

Why a kernel (measured on v5e, v8n 640px batch 128): XLA runs the folded stem
in ~4.5 ms, of which nearly all is HBM traffic — the 320/160-px low-channel
intermediates are lane-padded and every BN/SiLU epilogue is a separate
read+write pass. Fused, the stem reads the s2d image once and writes the
160-px output once.

Kernel design:
- input is the space-to-depth image (B, H, W, 48), passed twice: a blocked
  (1, th, W, 48) main window plus a blocked (1, 2, W, 48) halo window holding
  the previous tile's last two rows (clamped + masked to zeros for tile 0 —
  exactly the convs' top zero padding). All DMAs are standard blocked
  transfers; Element-indexed overlapping windows measured ~2.7x slower IO.
- conv1 uses a *union-tap* layout: the folded k2/s1 kernel over s2d channels
  has K=192 dense taps (2 MXU K-chunks), but the taps that are actually
  nonzero live in 120 rows — [z(y,x) 48 | z(y,x-1) 48 | z(y-1,x)[36:48] |
  z(y-1,x-1)[36:48]] — one 128-wide K-chunk, halving conv1's MXU time.
  (Only qy=3 s2d phases of the previous row are reachable by a k3/s2 window.)
- conv2 consumes conv1's phase channels (py,px,o) directly: V = [h1(y,x) 64 |
  h1(y,x-1) 64 | h1(y-1,x)[py=1] 32 | h1(y-1,x-1)[py=1] 32], K=192.
- x-shifts are lane-preserving sublane rolls over row-major pixels with a
  zero mask at x=0 (exactly the convs' left zero-padding); y-shifts are row
  slices of the halo window.
- BN (inference stats, eps=1e-3) is pre-folded into the matmul weights and a
  bias; SiLU runs on the f32 accumulator before the bf16 cast — everything
  between the two matmuls stays in VMEM.
- the fake conv1 row above the image (computed from the zero padding rows as
  silu(b1) != 0) is re-zeroed for tile 0, matching conv2's zero padding.

Numerics: matmuls accumulate f32 from bf16 operands; this is at least as
precise as the XLA folded path (tests/test_pallas_stem.py asserts agreement
with phase_folded_stem and with the unfolded Conv layers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN_EPS = 1e-3


def _bn_fold(bn: dict):
    inv = bn["scale"] * lax.rsqrt(bn["var"] + BN_EPS)
    shift = bn["bias"] - bn["mean"] * inv
    return inv, shift


def fold_stem_union(w1: jnp.ndarray, bn1: dict, w2: jnp.ndarray, bn2: dict,
                    dtype=jnp.bfloat16):
    """Build the union-tap matmul weights from the original conv params.

    Args:
        w1: (3, 3, 3, C1) HWIO k3/s2 stem conv kernel (C1 = first Conv width).
        bn1: dict(scale/bias/mean/var) of shape (C1,).
        w2: (3, 3, C1, C2) second k3/s2 conv. bn2 likewise (C2,).
    Returns:
        w1u (128, 4*C1) bf16, b1 (1, 4*C1) f32, w2u (4*C1*3, C2) bf16,
        b2 (1, C2) f32.  w1u rows: [cur/cur 48 | cur/prev-col 48 |
        prev-row/cur 12 | prev-row/prev-col 12 | zero pad 8].
        w1u cols are conv1 phases (py, px, o).
    """
    _, _, cin, c1 = w1.shape
    assert cin == 3 and w1.shape[:2] == (3, 3)
    c2 = w2.shape[-1]
    inv1, shift1 = _bn_fold(bn1)
    inv2, shift2 = _bn_fold(bn2)
    w1 = (w1 * inv1[None, None, None, :]).astype(jnp.float32)
    w2 = (w2 * inv2[None, None, None, :]).astype(jnp.float32)

    w1u = jnp.zeros((128, 4 * c1), jnp.float32)
    for py in range(2):
        for px in range(2):
            colb = (py * 2 + px) * c1
            for dy in range(3):
                t = 2 * py + dy - 1  # image-row phase (or prev s2d row if <0)
                for dx in range(3):
                    s = 2 * px + dx - 1
                    if t >= 0 and s >= 0:
                        row = t * 12 + s * 3
                    elif t >= 0:           # prev col, qx=3
                        row = 48 + t * 12 + 9
                    elif s >= 0:           # prev row, qy=3 (block holds 36:48)
                        row = 96 + s * 3
                    else:                  # prev row+col, (qy,qx)=(3,3)
                        row = 108 + 9
                    w1u = lax.dynamic_update_slice(
                        w1u, w1[dy, dx, :, :],
                        (row, colb))
    b1 = jnp.tile(shift1, 4)[None, :].astype(jnp.float32)

    # (dy -> (is_prev_row, py)), same for dx/px: dy=0 -> prev row, py=1
    sel = {0: (True, 1), 1: (False, 0), 2: (False, 1)}
    w2u = jnp.zeros((4 * c1 * 3, c2), jnp.float32)
    for dy in range(3):
        prev_y, py = sel[dy]
        for dx in range(3):
            prev_x, px = sel[dx]
            ch1 = (py * 2 + px) * c1
            if not prev_y and not prev_x:
                row = ch1
            elif not prev_y:
                row = 4 * c1 + ch1
            elif not prev_x:
                row = 8 * c1 + (ch1 - 2 * c1)
            else:
                row = 10 * c1 + (ch1 - 2 * c1)
            w2u = lax.dynamic_update_slice(w2u, w2[dy, dx, :, :], (row, 0))
    b2 = shift2[None, :].astype(jnp.float32)
    return (w1u.astype(dtype), b1, w2u.astype(dtype), b2)


def _shift1(a: jnp.ndarray) -> jnp.ndarray:
    """Rows shifted down by one (a[i] <- a[i-1]); zeros in row 0. Static
    sublane concat — pltpu.roll lowers to a dynamic rotate that Mosaic only
    implements for 32-bit data."""
    return jnp.concatenate([jnp.zeros((1, a.shape[1]), a.dtype), a[:-1]], axis=0)


def _stem_kernel(halo_ref, z_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *,
                 th: int, w: int, c1: int):
    r = th + 2
    # window = 2 halo rows (previous tile's last two; zeros for tile 0, where
    # the halo block is clamped to rows 0-1 and masked here) + th main rows.
    halo = halo_ref[0].astype(z_ref.dtype)
    halo = jnp.where(pl.program_id(1) == 0, jnp.zeros_like(halo), halo)
    z = jnp.concatenate([halo, z_ref[0]], axis=0).reshape(r * w, 48)
    col = lax.broadcasted_iota(jnp.int32, (r * w, 1), 0) % w
    zx = jnp.where(col == 0, jnp.zeros_like(z), _shift1(z))
    u = jnp.concatenate(
        [z[w:], zx[w:], z[: (r - 1) * w, 36:48], zx[: (r - 1) * w, 36:48],
         jnp.zeros(((r - 1) * w, 8), z.dtype)], axis=-1)   # ((r-1)w, 128)
    h1 = jnp.dot(u, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[0]
    h1 = jax.nn.silu(h1)
    # tile 0's first h1 row is global row -1: conv2 must see zeros there
    row = lax.broadcasted_iota(jnp.int32, ((r - 1) * w, 1), 0)
    fake = (pl.program_id(1) == 0) & (row < w)
    h1 = jnp.where(fake, 0.0, h1).astype(z.dtype)
    h1x = jnp.where(col[: (r - 1) * w] == 0, jnp.zeros_like(h1), _shift1(h1))
    v = jnp.concatenate(
        [h1[w:], h1x[w:], h1[: th * w, 2 * c1: 4 * c1],
         h1x[: th * w, 2 * c1: 4 * c1]], axis=-1)          # (th*w, 12*c1)
    h2 = jnp.dot(v, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[0]
    h2 = jax.nn.silu(h2)
    out_ref[0] = h2.reshape(th, w, -1).astype(out_ref.dtype)


def _pick_tile(h: int, w: int) -> int:
    """Largest EVEN divisor of h with about 3200 pixels per tile row-block
    (even: the halo BlockSpec indexes in 2-row units), falling back to h."""
    target = max(8, 3200 // max(w, 1))
    best = h
    for th in range(2, h + 1, 2):
        if h % th == 0 and th <= target:
            best = th
    return best


def pallas_stem(z: jnp.ndarray, w1: jnp.ndarray, bn1: dict, w2: jnp.ndarray,
                bn2: dict, dtype=jnp.bfloat16, interpret: bool = False):
    """(B, H, W, 48) s2d image -> (B, H, W, C2) second-Conv output.

    `z` is the space-to-depth image (models/folded_stem.py::space_to_depth4),
    unpadded; top zero padding is synthesised by masking tile 0's halo.
    """
    b, h, w, cz = z.shape
    assert cz == 48
    c1 = w1.shape[-1]
    c2 = w2.shape[-1]
    assert 4 * c1 <= 128, "union-tap conv1 needs 4*C1 lanes <= 128"
    w1u, b1, w2u, b2 = fold_stem_union(w1, bn1, w2, bn2, dtype=dtype)
    z = z.astype(dtype)
    th = _pick_tile(h, w)
    assert th % 2 == 0 or th == h, "halo block indexing needs even tile rows"
    kern = functools.partial(_stem_kernel, th=th, w=w, c1=c1)
    grid = (b, h // th)
    flops = 2 * b * h * w * 128 * 4 * c1 + 2 * b * h * w * 12 * c1 * c2
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            # 2-row halo: the previous tile's last two rows, as a Blocked
            # (1,2,W,48) window (index in 2-row units; clamped to 0 for tile
            # 0 and masked in-kernel) — keeps every DMA a standard blocked
            # transfer; Element-indexed overlapping windows measured ~7 ms
            # IO-only vs ~2.6 ms for blocked specs on v5e (scripts/
            # bench_stem_parts*.py).
            pl.BlockSpec((1, 2, w, 48),
                         lambda bi, t: (bi, jnp.maximum(t * th - 2, 0) // 2,
                                        0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w, 48), lambda bi, t: (bi, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 4 * c1), lambda bi, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * c1), lambda bi, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12 * c1, c2), lambda bi, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2), lambda bi, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, c2), lambda bi, t: (bi, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c2), dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=z.size * 2 + b * h * w * c2 * 2,
            transcendentals=b * h * w * 5 * c1),
        interpret=interpret,
    )(z, z, w1u, b1, w2u, b2)


def stem_supported(x_shape, c1: int) -> bool:
    """TPU fast path requires lane/sublane-friendly shapes: W%16==0 (bf16
    sublane tiling for the row-major reshape) and 4*C1 <= 128."""
    bsz, hh, ww, cc = x_shape
    return (cc == 3 and hh % 4 == 0 and ww % 4 == 0 and (ww // 4) % 16 == 0
            and (hh // 4) % 8 == 0 and 4 * c1 <= 128)

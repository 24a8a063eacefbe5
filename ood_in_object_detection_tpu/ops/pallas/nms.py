"""Pallas TPU kernel: greedy-NMS keep mask over score-sorted boxes.

The XLA path (ops/nms.py _greedy_keep_tiled) materializes pairwise-IoU tiles
through HBM on every fixpoint round; this kernel keeps the whole (k, k) IoU
matrix and the alive mask in VMEM (k<=1024 -> 4 MB) and iterates the
resurrecting suppression map to its fixpoint on the VPU:

    alive' = valid & ~any(iou > thr & row<col & alive[:, None])

whose fixpoint is exactly the greedy NMS solution (suppression is a DAG in
score order). Mosaic notes: no in-kernel transposes or lane<->sublane
reshapes — the caller passes the boxes twice ((k,4) and pre-transposed
(4,k)), the alive vector stays (1,k) and the row-indexed reduction is done
as a (1,k)x(k,k) matvec on the MXU; the fixpoint runs in a while_loop with
early exit on no change.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl


def _keep_kernel(b_ref, bt_ref, valid_ref, out_ref, *, iou_thres: float,
                 max_iters: int):
    b = b_ref[:]            # (k, 4) f32 class-offset boxes, score-sorted
    bt = bt_ref[:]          # (4, k)
    k = b.shape[0]
    x1, y1, x2, y2 = b[:, 0:1], b[:, 1:2], b[:, 2:3], b[:, 3:4]      # (k,1)
    x1c, y1c, x2c, y2c = bt[0:1, :], bt[1:2, :], bt[2:3, :], bt[3:4, :]  # (1,k)
    iw = jnp.maximum(jnp.minimum(x2, x2c) - jnp.maximum(x1, x1c), 0.0)
    ih = jnp.maximum(jnp.minimum(y2, y2c) - jnp.maximum(y1, y1c), 0.0)
    inter = iw * ih
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)      # (k,1)
    areac = jnp.maximum(x2c - x1c, 0.0) * jnp.maximum(y2c - y1c, 0.0)  # (1,k)
    iou = inter / (area + areac - inter + 1e-7)
    row = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    sup_mat = (iou > iou_thres) & (row < col)                          # (k,k)

    base = valid_ref[:] > 0                                           # (1,k)
    supf = jnp.where(sup_mat, 1.0, 0.0)                               # (k,k)

    def cond(state):
        i, _, changed = state
        return changed & (i < max_iters)

    def body(state):
        i, alive, _ = state
        # suppressed[j] = sum_i alive[i] * sup[i, j] — a (1,k)x(k,k) matvec on
        # the MXU; avoids any transpose/reshape of the alive vector
        s = jnp.dot(alive, supf, preferred_element_type=jnp.float32)  # (1,k)
        new = jnp.where(base & (s == 0.0), 1.0, 0.0)
        return i + 1, new, jnp.any(new != alive)

    _, alive, _ = lax.while_loop(
        cond, body, (0, jnp.where(base, 1.0, 0.0), jnp.bool_(True)))
    out_ref[:] = alive


def greedy_keep_pallas(boxes: jnp.ndarray, valid: jnp.ndarray,
                       iou_thres: float, max_iters: int = 0) -> jnp.ndarray:
    """(k, 4) score-sorted boxes + (k,) validity -> (k,) greedy keep mask.

    The while_loop exits as soon as the mask stops changing; ``max_iters``
    (default k = the exact bound) only caps the worst case.
    vmap-compatible (the batch dim becomes a grid dim).
    """
    k = boxes.shape[0]
    max_iters = max_iters or k
    kern = functools.partial(_keep_kernel, iou_thres=float(iou_thres),
                             max_iters=max_iters)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, k), jnp.float32),
    )(boxes.astype(jnp.float32),
      boxes.T.astype(jnp.float32),
      jnp.where(valid, 1.0, 0.0).reshape(1, k))
    return out[0] > 0

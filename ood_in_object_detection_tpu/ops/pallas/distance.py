"""Pallas TPU kernel: fused features x centroid-bank min-distance.

Computes ``out[n, g] = min_k dist(x[n], centroids[g, k])`` for every
(class, stride) group g in one pass — the hot op of the feature-map OoD
methods (reference computes this per box on CPU with sklearn
pairwise_distances, ood_utils.py:2147-2180, 2413-2430).

Kernel design (see /opt/skills/guides/pallas_guide.md):
- grid over N in 128-row tiles (MXU-sized); the whole centroid bank
  (G*K, D) stays resident in VMEM across the grid (it is <= a few MB),
- cosine / l2 go through one ``jnp.dot`` per tile on the MXU
  (dist^2 = |x|^2 + |c|^2 - 2 x.c; cosine on pre-normalized rows),
- the (128, G*K) tile is masked (padded centroids -> +inf), reshaped to
  (128, G, K) and min-reduced over K on the VPU before it ever leaves VMEM —
  the (N, G*K) matrix is never materialized in HBM,
- l1 has no matmul form (VPU-bound) and uses the JAX fallback.

A pure-JAX fallback with identical semantics backs the CPU path and the
correctness tests (interpret mode covers the kernel itself).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

TILE_N = 128
_BIG = 3.0e38  # sentinel instead of inf: inf arithmetic on padded rows -> nan


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _cosl2_kernel(x_ref, c_ref, cnorm_ref, mask_ref, out_ref, *, K: int,
                  GP: int, squared: bool):
    """Centroids arrive k-major: row k*GP+g. The min over K is a static
    unrolled loop over lane-aligned (TILE_N, GP) segments — Mosaic does not
    support splitting the lane dimension in a reshape."""
    x = x_ref[:]                       # (TILE_N, D)
    c = c_ref[:]                       # (K*GP, D), padded rows are zero
    dots = jnp.dot(x, c.T, preferred_element_type=jnp.float32)  # (TILE_N, K*GP)
    if squared:                        # l2: |x|^2 - 2xc + |c|^2
        xnorm = jnp.sum(x * x, axis=-1, keepdims=True)
        d = jnp.sqrt(jnp.clip(xnorm + cnorm_ref[:][None, :] - 2.0 * dots, 0.0))
    else:                              # cosine on normalized rows
        d = 1.0 - dots
    d = jnp.where(mask_ref[:][None, :] > 0, d, _BIG)
    out = d[:, 0:GP]
    for k in range(1, K):
        out = jnp.minimum(out, d[:, k * GP : (k + 1) * GP])
    out_ref[:] = out


def min_group_distances_pallas(
    feats: jnp.ndarray,      # (N, D) f32; pre-normalized rows for cosine
    centroids: jnp.ndarray,  # (G, K, D) f32, zero rows padded
    kmask: jnp.ndarray,      # (G, K) bool — real centroids
    metric: str,
) -> jnp.ndarray:
    """-> (N, G) min distance to each group's centroids (inf where group empty)."""
    n, d = feats.shape
    g, k, _ = centroids.shape
    gp = _round_up(g, 128)  # lane-aligned group axis
    cents = jnp.where(kmask[..., None], centroids, 0.0).astype(jnp.float32)
    cents = jnp.pad(cents, ((0, gp - g), (0, 0), (0, 0)))
    flat_c = cents.transpose(1, 0, 2).reshape(k * gp, d)  # k-major rows
    maskp = jnp.pad(kmask, ((0, gp - g), (0, 0)))
    mask = maskp.T.reshape(k * gp).astype(jnp.float32)
    npad = _round_up(max(n, 1), TILE_N)
    x = jnp.pad(feats.astype(jnp.float32), ((0, npad - n), (0, 0)))
    cnorm = jnp.sum(flat_c * flat_c, axis=-1)

    kern = functools.partial(_cosl2_kernel, K=k, GP=gp,
                             squared=(metric in ("l2", "euclidean")))
    out = pl.pallas_call(
        kern,
        grid=(npad // TILE_N,),
        in_specs=[
            pl.BlockSpec((TILE_N, d), lambda i: (i, 0)),
            pl.BlockSpec((k * gp, d), lambda i: (0, 0)),
            pl.BlockSpec((k * gp,), lambda i: (0,)),
            pl.BlockSpec((k * gp,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((TILE_N, gp), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((npad, gp), jnp.float32),
    )(x, flat_c, cnorm, mask)
    out = out[:n, :g]
    return jnp.where(out >= _BIG / 2, jnp.inf, out)


def min_group_distances_ref(feats, centroids, kmask, metric):
    """Pure-JAX reference with identical semantics (also the CPU/l1 path)."""
    from ...ood.distance import pairwise_distance

    g, k, d = centroids.shape
    dmat = pairwise_distance(feats, centroids.reshape(g * k, d), metric)
    dmat = dmat.reshape(feats.shape[0], g, k)
    dmat = jnp.where(kmask[None], dmat, jnp.inf)
    return jnp.min(dmat, axis=-1)


def min_group_distances(feats, centroids, kmask, metric, use_pallas: bool = True):
    """Dispatch: Pallas MXU kernel for cosine/l2 on TPU, JAX elsewhere."""
    on_tpu = jax.default_backend() == "tpu"
    if use_pallas and on_tpu and metric in ("cosine", "l2", "euclidean"):
        try:
            return min_group_distances_pallas(feats, centroids, kmask, metric)
        except Exception:  # pragma: no cover - compile fallback
            pass
    return min_group_distances_ref(feats, centroids, kmask, metric)

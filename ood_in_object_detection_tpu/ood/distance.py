"""Centroid-distance OoD scoring over padded tensors (device-side).

Capability parity with the reference DistanceMethod family
(ood_utils.py:1447-2596):

- activations_transformation: flatten + L2-normalize rows
  (ood_utils.py:2404-2410, sklearn.preprocessing.normalize)
- compute_distance: min over centroids of pairwise distance, metrics
  l1 / l2 / cosine (ood_utils.py:2413-2430, sklearn pairwise_distances)
- clusters stored per (class, stride); ragged cluster counts are padded to
  ``Kmax`` with an invalid mask.

The reference computes these per box in Python loops on CPU
(ood_utils.py:2147-2180); here a whole batch of max_det boxes is scored in one
fused gather + reduction.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

PAIRWISE_METRICS = ("l1", "l2", "cosine", "manhattan", "euclidean")
NO_CLUSTER_DISTANCE = 1000.0  # reference sentinel (ood_utils.py:2164)


def l2_normalize_rows(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """sklearn normalize(axis=1) semantics: rows with zero norm stay zero."""
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(n, eps)


def pairwise_distance(a: jnp.ndarray, b: jnp.ndarray, metric: str) -> jnp.ndarray:
    """(N, D), (M, D) -> (N, M) with sklearn metric semantics."""
    if metric in ("l1", "manhattan"):
        return jnp.abs(a[:, None, :] - b[None, :, :]).sum(-1)
    if metric in ("l2", "euclidean"):
        d2 = (
            (a * a).sum(-1)[:, None]
            + (b * b).sum(-1)[None, :]
            - 2.0 * a @ b.T
        )
        return jnp.sqrt(jnp.clip(d2, 0.0))
    if metric == "cosine":
        an = l2_normalize_rows(a)
        bn = l2_normalize_rows(b)
        return 1.0 - an @ bn.T
    raise ValueError(f"unknown metric {metric}")


class CentroidBank(NamedTuple):
    """Padded per-(class, stride) centroid bank for device-side scoring.

    centroids: (nc, S, Kmax, D) f32 — L2-normalized flattened centroids
    count:     (nc, S) int32 — number of real centroids (0 => no cluster)
    """

    centroids: jnp.ndarray
    count: jnp.ndarray

    @property
    def num_classes(self):
        return self.centroids.shape[0]


def build_centroid_bank(
    clusters: Sequence[Sequence[np.ndarray]], feat_dim: int, num_strides: int = 3
) -> CentroidBank:
    """Pack the ragged [class][stride] -> (K, D) cluster lists produced by the
    fitting stage (reference structure: ood_utils.py:2263-2330) into a padded
    device tensor."""
    nc = len(clusters)
    kmax = 1
    for per_cls in clusters:
        for c in per_cls:
            if isinstance(c, np.ndarray) and c.ndim == 2:
                kmax = max(kmax, c.shape[0])
    cents = np.zeros((nc, num_strides, kmax, feat_dim), np.float32)
    count = np.zeros((nc, num_strides), np.int32)
    for i, per_cls in enumerate(clusters):
        for s, c in enumerate(per_cls):
            if isinstance(c, np.ndarray) and c.ndim == 2 and c.shape[0] > 0:
                cents[i, s, : c.shape[0]] = c
                count[i, s] = c.shape[0]
    return CentroidBank(jnp.asarray(cents), jnp.asarray(count))


def min_distance_to_class_centroids(
    feats: jnp.ndarray,      # (N, D) already transformed (normalized flat)
    cls: jnp.ndarray,        # (N,) int32
    stride_idx: jnp.ndarray, # (N,) int32
    bank: CentroidBank,
    metric: str,
) -> jnp.ndarray:
    """min_k dist(feat_i, centroids[cls_i, stride_i, k]) -> (N,).

    Boxes whose (class, stride) has no cluster get the reference's sentinel
    distance 1000 (=> always OoD, ood_utils.py:2158-2164).
    """
    cents = bank.centroids[cls, stride_idx]        # (N, Kmax, D)
    cnt = bank.count[cls, stride_idx]              # (N,)
    kmax = cents.shape[1]

    def one(f, c):
        return pairwise_distance(f[None, :], c, metric)[0]  # (Kmax,)

    d = jax.vmap(one)(feats, cents)                # (N, Kmax)
    kmask = jnp.arange(kmax)[None, :] < cnt[:, None]
    d = jnp.where(kmask, d, jnp.inf)
    dmin = jnp.min(d, axis=-1)
    return jnp.where(cnt > 0, dmin, NO_CLUSTER_DISTANCE)


def distances_to_all_class_centroids_stride0(
    feats: jnp.ndarray,  # (N, D)
    bank: CentroidBank,
    metric: str,
) -> jnp.ndarray:
    """(N, nc) min-distance of each feature to every class's stride-0 clusters,
    inf where a class has no stride-0 cluster. Used to rank unknown proposals
    (reference ood_utils.py:1917-1998, 2038-2180 unk scoring path)."""
    nc = bank.num_classes
    cents = bank.centroids[:, 0]  # (nc, Kmax, D)
    cnt = bank.count[:, 0]        # (nc,)

    def per_class(c, n):
        d = pairwise_distance(feats, c, metric)  # (N, Kmax)
        kmask = jnp.arange(c.shape[0])[None, :] < n
        d = jnp.where(kmask, d, jnp.inf)
        return jnp.min(d, axis=-1)

    d_all = jax.vmap(per_class)(cents, cnt)  # (nc, N)
    d_all = jnp.where((cnt > 0)[:, None], d_all, jnp.inf)
    return d_all.T


def l2_normalize_rows_np(a):
    """NumPy mirror of l2_normalize_rows for host-side tails."""
    a = np.asarray(a, np.float32)
    n = np.sqrt((a * a).sum(-1, keepdims=True))
    return a / np.maximum(n, 1e-12)


def pairwise_distance_np(a, b, metric: str):
    """NumPy mirror of pairwise_distance — used by per-image host tails
    (EUL proposal ranking) where a device dispatch through the tunnel costs
    more than the whole computation."""
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    if metric in ("l1", "manhattan"):
        return np.abs(a[:, None, :] - b[None, :, :]).sum(-1)
    if metric in ("l2", "euclidean"):
        d2 = ((a * a).sum(-1)[:, None] + (b * b).sum(-1)[None, :]
              - 2.0 * a @ b.T)
        return np.sqrt(np.clip(d2, 0.0, None))
    if metric == "cosine":
        return 1.0 - l2_normalize_rows_np(a) @ l2_normalize_rows_np(b).T
    raise ValueError(f"unknown metric {metric}")

"""Supervised dimensionality reduction (SDR) for distance methods, in JAX.

The reference's SDR variants wrap umap-learn and ivis keras models — one
embedder per stride, trained on the InD activations, then applied before
clustering and scoring (ood_utils.py:2433-2571; params from
custom_hyperparams.py:22-27: EMBEDDING_DIMS=32, K=15). Neither package exists
in this environment and both are host-bound; capability parity is provided by
a small JAX MLP embedder trained with a triplet objective:

- ``ivis`` mode (the paper's SDR): supervised triplets — anchor/positive from
  the same class, negative from a different class, softmax-ratio triplet loss
  (the ivis formulation) on L2-normalized inputs,
- ``umap`` mode: unsupervised triplets — positives are cosine
  nearest-neighbours (k=15), negatives random, giving a parametric
  neighbour-embedding in the UMAP spirit.

This is capability parity, not bit parity (SURVEY.md §7.7 explicitly scopes
SDR this way: "replace with a small JAX siamese embedder with the same
triplet objective").
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.config import CUSTOM_HYP
from .distance import l2_normalize_rows


def _mlp_init(key, dims):
    params = []
    for i in range(len(dims) - 1):
        key, k1 = jax.random.split(key)
        w = jax.random.normal(k1, (dims[i], dims[i + 1])) * jnp.sqrt(2.0 / dims[i])
        params.append({"w": w, "b": jnp.zeros(dims[i + 1])})
    return params


def _mlp_apply(params, x):
    for i, layer in enumerate(params):
        x = x @ layer["w"] + layer["b"]
        if i < len(params) - 1:
            x = jax.nn.selu(x)  # ivis 'maaten' network uses SELU layers
    return x


@dataclasses.dataclass
class TripletEmbedder:
    """One per-stride embedder."""

    params: list
    in_dim: int
    out_dim: int

    def transform(self, x: np.ndarray) -> np.ndarray:
        flat = np.asarray(x, np.float32).reshape(len(x), -1)
        flat = np.asarray(l2_normalize_rows(jnp.asarray(flat)))
        return np.asarray(_mlp_apply(self.params, jnp.asarray(flat)))


def _triplet_loss(params, a, p, n):
    za, zp, zn = (_mlp_apply(params, x) for x in (a, p, n))
    dp = jnp.sum((za - zp) ** 2, -1)
    dn = jnp.sum((za - zn) ** 2, -1)
    # ivis softmax-ratio triplet loss
    return jnp.mean(jax.nn.softplus(dp - dn))


def fit_triplet_embedder(
    feats: np.ndarray,
    labels: Optional[np.ndarray],
    out_dim: int = 32,
    k_neighbors: int = 15,
    epochs: int = 30,
    batch: int = 256,
    lr: float = 1e-3,
    seed: int = 15,
) -> TripletEmbedder:
    """labels=None -> unsupervised (knn positives, 'umap' mode)."""
    rng = np.random.default_rng(seed)
    flat = np.asarray(feats, np.float32).reshape(len(feats), -1)
    flat = np.asarray(l2_normalize_rows(jnp.asarray(flat)))
    n, d = flat.shape
    # 'maaten' architecture: 500-500-2000 dense stack (ivis default)
    widths = [d, 500, 500, 2000, out_dim] if n > 512 else [d, 128, 128, out_dim]
    key = jax.random.PRNGKey(seed)
    params = _mlp_init(key, widths)
    tx = optax.adam(lr)
    opt = tx.init(params)

    if labels is None:
        sims = flat @ flat.T
        np.fill_diagonal(sims, -np.inf)
        kk = min(k_neighbors, n - 1)
        nbrs = np.argpartition(-sims, kk, axis=1)[:, :kk]
    else:
        labels = np.asarray(labels)

    @jax.jit
    def step(params, opt, a, p, ne):
        loss, g = jax.value_and_grad(_triplet_loss)(params, a, p, ne)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, loss

    steps_per_epoch = max(n // batch, 1)
    for _ in range(epochs):
        for _ in range(steps_per_epoch):
            ai = rng.integers(0, n, batch)
            if labels is None:
                pi = nbrs[ai, rng.integers(0, nbrs.shape[1], batch)]
                ni = rng.integers(0, n, batch)
            else:
                pi = np.empty(batch, int)
                ni = np.empty(batch, int)
                for j, idx in enumerate(ai):
                    same = np.flatnonzero(labels == labels[idx])
                    diff = np.flatnonzero(labels != labels[idx])
                    pi[j] = rng.choice(same) if same.size else idx
                    ni[j] = rng.choice(diff) if diff.size else idx
            params, opt, _ = step(params, opt,
                                  jnp.asarray(flat[ai]), jnp.asarray(flat[pi]),
                                  jnp.asarray(flat[ni]))
    return TripletEmbedder(params=params, in_dim=d, out_dim=out_dim)


def attach_sdr_transform(method, kind: str = "ivis") -> None:
    """Give a DistanceOODMethod a per-stride SDR transform. The embedders are
    fitted lazily on the first generate_clusters call (mirrors reference
    _DimensionalityReductionMethod.generate_clusters, ood_utils.py:2450-2456)."""
    state = {"embedders": None, "kind": kind}
    orig_generate = method.generate_clusters

    def transform_fn(acts, cls_idx=0, stride_idx=0):
        if state["embedders"] is None:
            raise RuntimeError("SDR transform used before fitting (call generate_clusters)")
        emb = state["embedders"][stride_idx]
        if emb is None:  # stride never seen during fitting: raw normalize
            flat = np.asarray(acts, np.float32).reshape(len(acts), -1)
            return np.asarray(l2_normalize_rows(jnp.asarray(flat)))
        return emb.transform(acts)

    def generate_clusters(acts, logger=None, min_samples=None):
        if state["embedders"] is None:
            ivis_p = CUSTOM_HYP.dr.ivis
            embedders: List[TripletEmbedder] = []
            for s in range(3):
                per_stride, per_labels = [], []
                for c, per_cls in enumerate(acts):
                    a = per_cls[s]
                    if isinstance(a, np.ndarray) and a.size:
                        per_stride.append(np.asarray(a, np.float32).reshape(len(a), -1))
                        per_labels.append(np.full(len(a), c))
                if not per_stride:
                    embedders.append(None)
                    continue
                X = np.concatenate(per_stride)
                y = np.concatenate(per_labels) if kind == "ivis" else None
                embedders.append(fit_triplet_embedder(
                    X, y, out_dim=ivis_p.EMBEDDING_DIMS, k_neighbors=ivis_p.K))
            state["embedders"] = embedders
        return orig_generate(acts, logger, min_samples)

    method.transform_fn = transform_fn
    method.generate_clusters = generate_clusters
    method.sdr_state = state

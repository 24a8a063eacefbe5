"""Embedding visualization of extracted activations (reference
create_umap_representation.py): project per-class activations to 2D with PCA
or the JAX SDR triplet embedder (umap-learn is unavailable in this
environment; modes mirror the reference's umap / pca_umap / pca options) and
scatter-plot them colored by class."""

from __future__ import annotations

import argparse
import logging
import pickle
from pathlib import Path

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser("embedding_plot")
    p.add_argument("--activations", required=True, help="pickle from extract_activations")
    p.add_argument("--mode", default="pca", choices=["pca", "sdr", "pca_sdr"])
    p.add_argument("--stride", type=int, default=0)
    p.add_argument("--out", required=True)
    p.add_argument("--max_per_class", type=int, default=500)
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    payload = pickle.loads(Path(args.activations).read_bytes())
    acts = payload.get("roi_feats") or payload.get("logits")
    feats, labels = [], []
    rng = np.random.default_rng(0)
    for c, per_cls in enumerate(acts):
        a = per_cls[args.stride] if isinstance(per_cls, list) else per_cls
        if not isinstance(a, np.ndarray) or a.size == 0:
            continue
        a = a.reshape(len(a), -1)
        if len(a) > args.max_per_class:
            a = a[rng.choice(len(a), args.max_per_class, replace=False)]
        feats.append(a)
        labels.append(np.full(len(a), c))
    if not feats:
        raise SystemExit("no activations found")
    X = np.concatenate(feats).astype(np.float32)
    y = np.concatenate(labels)

    if args.mode in ("pca", "pca_sdr"):
        from sklearn.decomposition import PCA

        X = PCA(n_components=min(32, X.shape[1])).fit_transform(X)
    if args.mode in ("sdr", "pca_sdr"):
        from ..ood.sdr import fit_triplet_embedder

        emb = fit_triplet_embedder(X, y, out_dim=2, epochs=15)
        X2 = emb.transform(X)
    else:
        from sklearn.decomposition import PCA

        X2 = PCA(n_components=2).fit_transform(X)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 8))
    sc = ax.scatter(X2[:, 0], X2[:, 1], c=y, s=4, cmap="tab20", alpha=0.7)
    ax.set_title(f"activation embedding ({args.mode}, stride {args.stride})")
    fig.colorbar(sc, ax=ax, label="class")
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(args.out, dpi=150, bbox_inches="tight")
    logging.info("wrote %s", args.out)


if __name__ == "__main__":
    main()

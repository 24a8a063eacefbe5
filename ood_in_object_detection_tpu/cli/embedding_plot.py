"""2D embedding plots of extracted activations, known vs unknown classes
(reference create_umap_representation.py:25-735).

Capability map (umap-learn is not in this environment; the JAX SDR triplet
embedder — the paper's supervised-DR component, ood/sdr.py — stands in for
supervised UMAP; PCA is exact):

- mode 'sdr'      ≙ reference 'umap'      (supervised 2D embedding fit on
                                           known classes, unknowns projected
                                           into the same space)
- mode 'pca_sdr'  ≙ reference 'pca_umap'  (PCA-50 then supervised embedding)
- mode 'pca'      ≙ reference 'pca'       (plain 2D PCA)

Like the reference: fit on KNOWN-class activations only, then *transform* the
unknown-class activations into the same space (create_and_plot_one_stride);
``--one_per_stride`` fits per stride vs all strides pooled; ``--grid_search``
sweeps embedder hyperparameters saving one figure per configuration; outputs
a known-only scatter and a known+unknown overlay (unknowns as squares).
"""

from __future__ import annotations

import argparse
import itertools
import logging
import pickle
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

log = logging.getLogger("embedding_plot")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("embedding_plot")
    p.add_argument("--activations", required=True,
                   help="pickle from cli.extract_activations")
    p.add_argument("--mode", default="sdr", choices=["sdr", "pca_sdr", "pca"])
    p.add_argument("--number_of_known_classes", type=int, required=True)
    p.add_argument("--one_per_stride", action="store_true",
                   help="one embedding per stride (reference one_umap_per_stride)")
    p.add_argument("--stride", type=int, default=-1,
                   help="restrict to one stride (-1 = all)")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--max_per_class", type=int, default=500)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--k_neighbors", type=int, default=15)
    p.add_argument("--grid_search", action="store_true",
                   help="sweep embedder params, one figure per config "
                        "(reference grid_search_umap)")
    p.add_argument("--class_names", nargs="*", default=None)
    return p


def _gather(acts, strides: List[int], max_per_class: int, rng) -> Tuple[np.ndarray, np.ndarray]:
    groups = []  # (class, (N, C_s) rows) — strides differ in channel width
    for c, per_cls in enumerate(acts):
        for s in strides:
            a = per_cls[s] if isinstance(per_cls, (list, tuple)) else per_cls
            if isinstance(a, np.ndarray) and a.size:
                groups.append((c, a.reshape(len(a), -1).astype(np.float32)))
    if not groups:
        return np.empty((0, 1), np.float32), np.empty(0, int)
    width = max(g.shape[1] for _, g in groups)
    feats, labels = [], []
    for c in sorted({c for c, _ in groups}):
        a = np.concatenate([np.pad(g, ((0, 0), (0, width - g.shape[1])))
                            for cc, g in groups if cc == c])
        if len(a) > max_per_class:
            a = a[rng.choice(len(a), max_per_class, replace=False)]
        feats.append(a)
        labels.append(np.full(len(a), c))
    return np.concatenate(feats), np.concatenate(labels)


def _fit_transform(mode: str, Xk, yk, Xu, epochs: int, k_neighbors: int):
    """Fit on known, transform both known and unknown (reference
    create_and_plot_one_stride: fit_transform(known, y) + transform(unknown))."""
    from sklearn.decomposition import PCA

    if mode == "pca":
        pca = PCA(n_components=2).fit(Xk)
        return pca.transform(Xk), (pca.transform(Xu) if len(Xu) else Xu[:, :2])
    if mode == "pca_sdr":
        pca = PCA(n_components=min(50, Xk.shape[1], len(Xk))).fit(Xk)
        Xk = pca.transform(Xk).astype(np.float32)
        Xu = pca.transform(Xu).astype(np.float32) if len(Xu) else Xu[:, : Xk.shape[1]]
    from ..ood.sdr import fit_triplet_embedder

    emb = fit_triplet_embedder(Xk, yk, out_dim=2, epochs=epochs,
                               k_neighbors=k_neighbors)
    return emb.transform(Xk), (emb.transform(Xu) if len(Xu) else np.empty((0, 2)))


def _plot(ek, yk, eu, yu, class_names, title: str, out_png: Path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cmap = plt.cm.tab20(np.arange(40) % 20)
    fig, ax = plt.subplots(figsize=(14, 10))
    color_idx = 0
    for c in np.unique(yk):
        pts = ek[yk == c]
        if len(pts):
            name = class_names[int(c)] if class_names and int(c) < len(class_names) else f"cls{int(c)}"
            ax.scatter(*pts.T, color=cmap[color_idx % 40], label=name, alpha=0.7, s=8)
            color_idx += 1
    fig.savefig(out_png.with_name(out_png.stem + "_known.png"), dpi=130,
                bbox_inches="tight")
    # overlay unknowns as squares (reference: marker='s', cap at 15 classes)
    for i, c in enumerate(np.unique(yu)):
        if i >= 15:
            break
        pts = eu[yu == c]
        if len(pts) > 50:
            name = class_names[int(c)] if class_names and int(c) < len(class_names) else f"cls{int(c)}"
            ax.scatter(*pts.T, color=cmap[color_idx % 40], label=name,
                       alpha=0.7, s=10, marker="s")
            color_idx += 1
    ax.legend(fontsize=7, ncol=2)
    ax.set_title(title)
    fig.savefig(out_png, dpi=130, bbox_inches="tight")
    plt.close(fig)


def main(argv=None):
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    rng = np.random.default_rng(0)

    payload = pickle.loads(Path(args.activations).read_bytes())
    acts = payload.get("roi_feats") or payload.get("logits")
    if acts is None:
        raise SystemExit("no activations found in payload")
    n_strides = max(len(p) for p in acts if isinstance(p, (list, tuple))) \
        if any(isinstance(p, (list, tuple)) for p in acts) else 1
    stride_sets = ([[s] for s in range(n_strides)] if args.one_per_stride
                   else [[args.stride]] if args.stride >= 0
                   else [list(range(n_strides))])

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    nk = args.number_of_known_classes

    configs = [dict(epochs=args.epochs, k_neighbors=args.k_neighbors)]
    if args.grid_search and args.mode != "pca":
        configs = [dict(epochs=e, k_neighbors=k)
                   for e, k in itertools.product([10, 20, 40], [5, 15, 30])]

    for strides in stride_sets:
        X, y = _gather(acts, strides, args.max_per_class, rng)
        if not len(X):
            log.warning("strides %s: no activations", strides)
            continue
        known = y < nk
        Xk, yk = X[known], y[known]
        Xu, yu = X[~known], y[~known]
        if not len(Xk):
            log.warning("strides %s: no known-class activations", strides)
            continue
        tag = "all" if len(strides) > 1 else f"s{strides[0]}"
        for cfg in configs:
            ek, eu = _fit_transform(args.mode, Xk, yk, Xu, **cfg)
            suffix = f"_e{cfg['epochs']}_k{cfg['k_neighbors']}" if args.grid_search else ""
            out = out_dir / f"{args.mode}_{tag}{suffix}.png"
            _plot(ek, yk, eu, yu, args.class_names,
                  f"{args.mode} strides={strides} {cfg}", out)
            log.info("wrote %s", out)


if __name__ == "__main__":
    main()

"""Per-(class, stride) cluster search (host-side sklearn, offline fit stage).

Capability parity with reference cluster_utils.py:18-366: grid-search exactly
one hyperparameter per algorithm, score candidate labelings with silhouette /
Calinski-Harabasz under the reference's validity constraints, handle orphan
(-1) labels per the configured policy.

Algorithm -> searched parameter (reference cluster_utils.py:36-160):
    DBSCAN                   eps in concat(linspace(.01,.1,100), (.1,1,100), (1,10,100))
    KMeans                   n_clusters in RANGE_OF_CLUSTERS (2..14)
    KMeans_<k>               fixed k (no search)
    HDBSCAN                  min_cluster_size in range(MIN_SAMPLES, 50)
    AgglomerativeClustering  n_clusters in RANGE_OF_CLUSTERS (linkage=complete)
    Birch                    threshold in linspace(.1, 5, 100)
    MeanShift                bandwidth=None (no search)
    GMM / BGMM               n_components in RANGE_OF_CLUSTERS
    'all'                    every sample is its own cluster
    'one'                    handled by the caller (single centroid)

Density-based scoring (HDBSCAN/DBSCAN with USE_DENSITY_BASED_METRIC or
REMOVE_ORPHANS enabled) uses the DBCV validity index (reference
cluster_utils.py:273, hdbscan.validity.validity_index) via the in-repo
NumPy implementation in ood/dbcv.py.
"""

from __future__ import annotations

import logging
import warnings
from typing import List, Optional

import numpy as np
from sklearn.cluster import (
    DBSCAN,
    HDBSCAN,
    AgglomerativeClustering,
    Birch,
    KMeans,
    MeanShift,
)
from sklearn.metrics import calinski_harabasz_score, silhouette_score
from sklearn.mixture import BayesianGaussianMixture, GaussianMixture

from ..core.config import CUSTOM_HYP, ClustersParams

log = logging.getLogger(__name__)

AVAILABLE_CLUSTERING_METHODS = (
    "one", "all", "DBSCAN", "KMeans", "KMeans_3", "KMeans_5", "KMeans_10",
    "HDBSCAN", "AgglomerativeClustering", "Birch", "MeanShift", "GMM", "BGMM",
)
AVAILABLE_CLUSTER_OPTIMIZATION_METRICS = ("silhouette", "calinski_harabasz")

_SKLEARN_METRIC = {"l1": "l1", "l2": "l2", "cosine": "cosine",
                   "manhattan": "manhattan", "euclidean": "euclidean"}


def make_each_orphan_own_cluster(labels: np.ndarray) -> np.ndarray:
    """reference cluster_utils.py:189-200."""
    labels = labels.copy()
    orphans = np.where(labels < 0)[0]
    if orphans.size == 0:
        return labels
    start = labels.max()
    for i, pos in enumerate(orphans):
        labels[pos] = start + i + 1
    return labels


def _candidate_grid(method: str, metric: str, hyp: ClustersParams):
    """(estimator factory, list of candidate param dicts, density_based)."""
    if method == "DBSCAN":
        eps = np.concatenate([
            np.linspace(0.01, 0.1, 100), np.linspace(0.1, 1, 100), np.linspace(1, 10, 100)
        ])
        return (lambda p: DBSCAN(metric=_SKLEARN_METRIC[metric], min_samples=hyp.MIN_SAMPLES, **p),
                [{"eps": float(e)} for e in eps], True)
    if method == "KMeans":
        return (lambda p: KMeans(random_state=10, n_init="auto", **p),
                [{"n_clusters": k} for k in hyp.RANGE_OF_CLUSTERS], False)
    if method == "HDBSCAN":
        return (lambda p: HDBSCAN(metric="euclidean" if metric == "l2" else
                                  ("manhattan" if metric == "l1" else metric), **p),
                [{"min_cluster_size": k} for k in range(hyp.MIN_SAMPLES, 50)], True)
    if method == "AgglomerativeClustering":
        return (lambda p: AgglomerativeClustering(metric=_SKLEARN_METRIC[metric],
                                                  linkage="complete", **p),
                [{"n_clusters": k} for k in hyp.RANGE_OF_CLUSTERS], False)
    if method == "Birch":
        return (lambda p: Birch(branching_factor=50, n_clusters=None, **p),
                [{"threshold": float(t)} for t in np.linspace(0.1, 5, 100)], False)
    if method == "MeanShift":
        return (lambda p: MeanShift(cluster_all=not hyp.REMOVE_ORPHANS, **p),
                [{"bandwidth": None}, {"bandwidth": None}], False)
    if method == "GMM":
        return (lambda p: GaussianMixture(**p),
                [{"n_components": k} for k in hyp.RANGE_OF_CLUSTERS], False)
    if method == "BGMM":
        return (lambda p: BayesianGaussianMixture(**p),
                [{"n_components": k} for k in hyp.RANGE_OF_CLUSTERS], False)
    raise ValueError(f"invalid clustering method: {method}")


def _score_labels(
    feats: np.ndarray,
    labels: np.ndarray,
    perf_metric: str,
    metric: str,
    density_based: bool,
    hyp: ClustersParams,
) -> Optional[float]:
    """Score one labeling under the reference's validity constraints
    (cluster_utils.py:232-300). None => invalid configuration."""
    n = len(feats)
    uniq = set(labels.tolist())
    if not (1 < len(uniq) < n - 1):
        return None
    f_used, l_used = feats, labels
    if -1 in uniq and hyp.REMOVE_ORPHANS:
        n_orphans = int(np.sum(labels == -1))
        if n_orphans > hyp.MAX_PERCENT_OF_ORPHANS * n:
            return None
        f_used = feats[labels != -1]
        l_used = labels[labels != -1]
    counts = np.unique(labels, return_counts=True)
    for lab, cnt in zip(*counts):
        if lab != -1 and cnt < hyp.MIN_SAMPLES:
            return None
    if not (1 < len(set(l_used.tolist())) < n - 1):
        return None
    if hyp.MAKE_EACH_ORPHAN_EACH_OWN_CLUSTER:
        l_used = make_each_orphan_own_cluster(l_used)
    if density_based and (hyp.REMOVE_ORPHANS or hyp.USE_DENSITY_BASED_METRIC):
        # DBCV validity index, reference cluster_utils.py:273
        # (hdbscan.validity.validity_index with d = feature dimension);
        # in-repo NumPy implementation since the hdbscan package is absent
        from .dbcv import validity_index

        try:
            return float(validity_index(f_used.astype(np.float64), l_used,
                                        metric=metric, d=f_used.shape[1]))
        except ValueError:
            return None
    if perf_metric == "silhouette":
        return float(silhouette_score(f_used, l_used, metric=_SKLEARN_METRIC[metric]))
    if perf_metric == "calinski_harabasz":
        return float(calinski_harabasz_score(f_used, l_used))
    raise ValueError(f"invalid perf metric {perf_metric}")


def _plot_score_curve(scores, grid, method: str, perf_metric: str, tag: str):
    """Grid-search score curve vs the searched parameter, saved under
    results/cluster_viz (reference plot_scores, cluster_utils.py:342-352,
    enabled by CUSTOM_HYP.clusters.VISUALIZE / --visualize_clusters)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from .. import constants as C

    xs = [next(iter(p.values())) for p in grid]
    param_name = next(iter(grid[0].keys())) if grid else "param"
    if any(x is None for x in xs):
        xs, param_name = list(range(len(grid))), "config"
    out = C.RESULTS_PATH / "cluster_viz"
    out.mkdir(parents=True, exist_ok=True)
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(xs, scores, marker=".", lw=1)
    ax.set_xlabel(param_name)
    ax.set_ylabel(perf_metric)
    ax.set_title(f"{tag} {method}")
    fig.tight_layout()
    fig.savefig(out / f"{tag}_{method}_{perf_metric}_scores.png", dpi=100)
    plt.close(fig)


def fit_cluster_labels(
    feats: np.ndarray,
    method: str,
    metric: str,
    perf_metric: str = "silhouette",
    hyp: Optional[ClustersParams] = None,
    tag: str = "",
) -> np.ndarray:
    """Grid-search one hyperparameter and return the best labeling
    (reference find_optimal_number_of_clusters_... cluster_utils.py:18-186)."""
    hyp = hyp or CUSTOM_HYP.clusters
    assert method in AVAILABLE_CLUSTERING_METHODS, method
    if method == "one":
        raise ValueError("'one' is handled by the centroid aggregation caller")
    if method == "all":
        return np.arange(len(feats))
    if method.startswith("KMeans_"):
        k = min(int(method.split("_")[-1]), len(feats))
        return KMeans(n_clusters=k, random_state=10, n_init="auto").fit_predict(feats)

    factory, grid, density_based = _candidate_grid(method, metric, hyp)
    default_score = -1.0 if perf_metric == "silhouette" else 0.0
    best_score, best_params = default_score, None
    scores = []
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for params in grid:
            try:
                labels = factory(params).fit_predict(feats)
                s = _score_labels(feats, labels, perf_metric, metric, density_based, hyp)
            except Exception as e:  # mirror reference's catch-all (:295-298)
                log.debug("cluster config %s failed: %s", params, e)
                s = None
            s = default_score if s is None else s
            scores.append(s)
            if s > best_score:
                best_score, best_params = s, params

    if hyp.VISUALIZE:
        _plot_score_curve(scores, grid, method, perf_metric, tag or "clusters")

    if best_params is None and default_score == -1.0:
        # all configurations degenerate -> single cluster. The reference's
        # check is literally `(scores == -1).all()` (cluster_utils.py:176),
        # which only matches the silhouette default: under calinski_harabasz
        # (defaults 0) it falls through to refitting the argmax — the FIRST
        # — config even though every config was invalid. Mirror both.
        labels = np.zeros(len(feats), dtype=int)
    elif best_params is None:
        # calinski_harabasz all-invalid: refit grid[0] like the reference,
        # but if that fit itself raises (the in-loop search swallowed it —
        # e.g. GMM n_components > n_samples for every config) fall back to
        # one cluster instead of killing the whole offline fit
        try:
            labels = factory(grid[0]).fit_predict(feats)
        except Exception:
            labels = np.zeros(len(feats), dtype=int)
    else:
        labels = factory(best_params).fit_predict(feats)
    if hyp.MAKE_EACH_ORPHAN_EACH_OWN_CLUSTER:
        labels = make_each_orphan_own_cluster(labels)
    return labels

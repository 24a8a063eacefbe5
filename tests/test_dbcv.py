"""NumPy DBCV validity index (ood/dbcv.py; reference cluster_utils.py:273
hdbscan.validity.validity_index contract)."""

import numpy as np
import pytest

from ood_in_object_detection_tpu.ood.dbcv import validity_index


def _blobs(rng, centers, n=40, spread=0.15):
    X, y = [], []
    for i, c in enumerate(centers):
        X.append(rng.normal(c, spread, (n, len(c))))
        y.append(np.full(n, i))
    return np.concatenate(X), np.concatenate(y)


def test_separated_blobs_score_high():
    rng = np.random.default_rng(0)
    X, y = _blobs(rng, [[0, 0], [6, 6]])
    s = validity_index(X, y, metric="euclidean")
    assert 0.5 < s <= 1.0


def test_random_labels_score_lower_than_true():
    rng = np.random.default_rng(1)
    X, y = _blobs(rng, [[0, 0], [6, 6]])
    s_true = validity_index(X, y)
    s_rand = validity_index(X, rng.permutation(y))
    assert s_rand < s_true
    assert -1.0 <= s_rand <= 1.0


def test_overlapping_blobs_score_lower():
    rng = np.random.default_rng(2)
    X1, y1 = _blobs(rng, [[0, 0], [8, 8]], spread=0.2)
    X2, y2 = _blobs(rng, [[0, 0], [0.5, 0.5]], spread=0.4)
    assert validity_index(X2, y2) < validity_index(X1, y1)


def test_noise_label_allowed_and_weighted():
    rng = np.random.default_rng(3)
    X, y = _blobs(rng, [[0, 0], [6, 6]])
    y2 = y.copy()
    y2[:5] = -1  # mark some points noise
    s = validity_index(X, y2)
    assert -1.0 <= s <= 1.0


def test_requires_two_clusters():
    X = np.random.default_rng(4).normal(0, 1, (20, 3))
    with pytest.raises(ValueError):
        validity_index(X, np.zeros(20))


def test_metric_variants_run():
    rng = np.random.default_rng(5)
    X, y = _blobs(rng, [[0, 0, 0], [5, 5, 5]])
    for m in ("l1", "l2", "cosine"):
        s = validity_index(X, y, metric=m, d=X.shape[1])
        assert -1.0 <= s <= 1.0, m


def test_density_scoring_reachable_from_grid_search():
    """HDBSCAN + USE_DENSITY_BASED_METRIC routes scoring through DBCV."""
    import dataclasses

    from ood_in_object_detection_tpu.core.config import CUSTOM_HYP
    from ood_in_object_detection_tpu.ood.clustering import fit_cluster_labels

    rng = np.random.default_rng(6)
    X, _ = _blobs(rng, [[0, 0], [6, 6], [-6, 6]], n=30)
    hyp = dataclasses.replace(CUSTOM_HYP.clusters, USE_DENSITY_BASED_METRIC=True)
    labels = fit_cluster_labels(X.astype(np.float32), "HDBSCAN", "l2", hyp=hyp)
    assert len(labels) == len(X)
    assert len(set(labels.tolist()) - {-1}) >= 2

"""Distance-method semantics vs sklearn (reference ood_utils.py:2404-2430)."""

import jax
import numpy as np
import jax.numpy as jnp
from sklearn.metrics import pairwise_distances
from sklearn.preprocessing import normalize

from ood_in_object_detection_tpu.ood.distance import (
    NO_CLUSTER_DISTANCE, build_centroid_bank, l2_normalize_rows,
    min_distance_to_class_centroids, pairwise_distance,
)
from ood_in_object_detection_tpu.ood.methods import DistanceOODMethod


def test_pairwise_distance_matches_sklearn(rng):
    a = rng.normal(0, 1, (4, 16)).astype(np.float32)
    b = rng.normal(0, 1, (6, 16)).astype(np.float32)
    for metric in ("l1", "l2", "cosine"):
        got = np.asarray(pairwise_distance(jnp.asarray(a), jnp.asarray(b), metric))
        ref = pairwise_distances(a, b, metric=metric)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_l2_normalize_matches_sklearn(rng):
    x = rng.normal(0, 1, (5, 8)).astype(np.float32)
    x[2] = 0.0
    got = np.asarray(l2_normalize_rows(jnp.asarray(x)))
    ref = normalize(x, axis=1)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_min_distance_routing_and_missing_cluster(rng):
    # 2 classes, 3 strides; class0/stride0 has 2 centroids, class1 none
    clusters = [[np.empty(0)] * 3 for _ in range(2)]
    clusters[0][0] = np.array([[1.0, 0.0], [0.0, 1.0]], np.float32)
    bank = build_centroid_bank(clusters, feat_dim=2)
    feats = jnp.asarray([[0.9, 0.0], [0.0, 0.5], [0.3, 0.3]], jnp.float32)
    cls = jnp.asarray([0, 0, 1], jnp.int32)
    stride = jnp.asarray([0, 0, 0], jnp.int32)
    d = np.asarray(min_distance_to_class_centroids(feats, cls, stride, bank, "l2"))
    np.testing.assert_allclose(d[0], 0.1, atol=1e-5)   # nearest = [1,0]
    np.testing.assert_allclose(d[1], 0.5, atol=1e-5)   # nearest = [0,1]
    assert d[2] == NO_CLUSTER_DISTANCE                  # class without cluster


def test_distance_method_end_to_end(rng):
    """fit one-centroid clusters -> scores -> thresholds -> decide."""
    m = DistanceOODMethod.from_name("Cosine_cl_stride")
    nc, d = 2, 8
    acts = [[np.empty(0)] * 3 for _ in range(nc)]
    base = rng.normal(0, 1, d).astype(np.float32)
    acts[0][0] = base[None] + rng.normal(0, 0.05, (40, d)).astype(np.float32)
    m.generate_clusters(acts)
    assert m.clusters[0][0].shape == (1, d)
    scores = m.compute_scores_from_activations(acts)
    assert scores[0][0].shape == (40,)
    m.generate_thresholds(scores, tpr=0.95)
    assert m.thresholds[0][0] is not None and m.thresholds[1][0] is None

    # in-distribution sample -> InD; junk sample -> OoD
    probe = np.stack([acts[0][0][0], -base + rng.normal(0, 1, d).astype(np.float32)])
    feats = jnp.asarray(m.transform(probe))
    cls = jnp.asarray([0, 0], jnp.int32)
    stride = jnp.asarray([0, 0], jnp.int32)
    dist = m.distances(feats, cls, stride)
    dec = np.asarray(m.decide_from_distances(dist, cls, stride, jnp.ones(2, bool)))
    assert dec.tolist() == [1, 0]
    ind = np.asarray(m.indness_from_distances(dist, cls, stride, jnp.ones(2, bool)))
    assert ind[0] > 0 > ind[1]

    # class with no cluster -> OoD and indness -1
    cls1 = jnp.asarray([1], jnp.int32)
    d1 = m.distances(feats[:1], cls1, stride[:1])
    assert np.asarray(m.decide_from_distances(d1, cls1, stride[:1], jnp.ones(1, bool)))[0] == 0
    assert np.asarray(m.indness_from_distances(d1, cls1, stride[:1], jnp.ones(1, bool)))[0] == -1.0


def test_multi_cluster_kmeans(rng):
    m = DistanceOODMethod.from_name("L2_cl_stride", cluster_method="KMeans_3")
    acts = [[np.empty(0)] * 3]
    # three well-separated blobs
    blobs = [rng.normal(c, 0.05, (20, 4)) for c in (0.0, 5.0, 10.0)]
    acts[0][0] = np.concatenate(blobs).astype(np.float32)
    m.generate_clusters(acts)
    assert m.clusters[0][0].shape[0] == 3


def test_bank_built_under_jit_stays_concrete(rng):
    """A bank first built inside a jit trace must not cache a tracer: a
    second, different jit using the same method would die with
    UnexpectedTracerError (found by scripts/bench_distance_ladder.py)."""
    m = DistanceOODMethod.from_name("Cosine_cl_stride", cluster_method="one")
    c = rng.normal(size=(2, 4)).astype(np.float32)
    m.clusters = [[c / np.linalg.norm(c, axis=-1, keepdims=True)] * 3]
    feats = jnp.asarray(rng.normal(size=(5, 4)).astype(np.float32))
    cls = jnp.zeros(5, jnp.int32)
    stride = jnp.zeros(5, jnp.int32)

    d1 = jax.jit(lambda f: m.distances(f, cls, stride))(feats)  # builds bank
    d2 = jax.jit(lambda f: m.distances(f, cls, stride) * 1.0)(feats)  # 2nd trace
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-6)


def test_cosine_bank_unit_norm_and_raw_feats_equivalence(rng):
    """The device path assumes unit centroids (Pallas 1 - x·c) while cluster
    centroids are MEANS of unit vectors (|c| < 1): bank() must normalize
    them for cosine, and distances() must normalize raw (e.g. SDR-embedded)
    features — so device semantics equal sklearn's normalize-both-sides
    cosine for ANY caller."""
    m = DistanceOODMethod.from_name("Cosine_cl_stride", cluster_method="all")
    # multi-vector centroids with |c| far from 1
    m.clusters = [[rng.normal(0, 1, (3, 8)).astype(np.float32) * 0.4
                   for _ in range(3)] for _ in range(2)]
    bank = m.bank()
    norms = np.linalg.norm(np.asarray(bank.centroids), axis=-1)
    counts = np.asarray(bank.count)
    real = np.arange(bank.centroids.shape[2])[None, None, :] < counts[..., None]
    np.testing.assert_allclose(norms[real], 1.0, rtol=1e-5)

    feats = rng.normal(0, 1, (6, 8)).astype(np.float32) * 3.0  # NOT unit
    cls = jnp.asarray([0, 0, 1, 1, 0, 1], jnp.int32)
    stride = jnp.asarray([0, 1, 2, 0, 2, 1], jnp.int32)
    got = np.asarray(m.distances(jnp.asarray(feats), cls, stride))
    for i in range(6):
        ref = pairwise_distances(feats[i : i + 1],
                                 m.clusters[int(cls[i])][int(stride[i])],
                                 metric="cosine").min()
        np.testing.assert_allclose(got[i], ref, rtol=1e-4, atol=1e-5)


def test_remove_orphans_skips_noise_centroid(rng, monkeypatch):
    """REMOVE_ORPHANS=True must drop -1-labelled points from centroid
    aggregation (reference ood_utils.py:2362-2366) instead of building a
    bogus noise centroid."""
    from ood_in_object_detection_tpu.core.config import CUSTOM_HYP
    from ood_in_object_detection_tpu.ood import clustering as cl

    feats = rng.normal(0, 1, (12, 4)).astype(np.float32)
    labels = np.array([0] * 5 + [1] * 4 + [-1] * 3)
    monkeypatch.setattr(cl, "fit_cluster_labels",
                        lambda *a, **k: labels.copy())
    acts = [[feats, np.empty(0), np.empty(0)]]

    m = DistanceOODMethod.from_name("L2_cl_stride", cluster_method="DBSCAN")
    monkeypatch.setattr(CUSTOM_HYP.clusters, "REMOVE_ORPHANS", True)
    m.generate_clusters(acts)
    assert m.clusters[0][0].shape[0] == 2  # clusters 0 and 1 only

    monkeypatch.setattr(CUSTOM_HYP.clusters, "REMOVE_ORPHANS", False)
    m2 = DistanceOODMethod.from_name("L2_cl_stride", cluster_method="DBSCAN")
    m2.generate_clusters(acts)
    assert m2.clusters[0][0].shape[0] == 3  # -1 aggregated like the reference


def test_min_samples_gate_reads_live_config(rng, monkeypatch):
    """clusters.MIN_SAMPLES sweeps (dotted-path overrides) must gate cluster
    creation like the reference's live-config check (ood_utils.py:2303)."""
    from ood_in_object_detection_tpu.core.config import CUSTOM_HYP

    feats = rng.normal(0, 1, (5, 4)).astype(np.float32)
    acts = [[feats, np.empty(0), np.empty(0)]]
    m = DistanceOODMethod.from_name("L2_cl_stride")
    monkeypatch.setattr(CUSTOM_HYP.clusters, "MIN_SAMPLES", 10)
    m.generate_clusters(acts)
    assert m.clusters[0][0].size == 0  # 5 samples <= 10: no cluster
    monkeypatch.setattr(CUSTOM_HYP.clusters, "MIN_SAMPLES", 3)
    m.generate_clusters(acts)
    assert m.clusters[0][0].size > 0

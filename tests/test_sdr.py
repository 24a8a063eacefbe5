"""SDR (JAX triplet embedder) replacing umap/ivis (ood/sdr.py)."""

import numpy as np
import jax.numpy as jnp

from ood_in_object_detection_tpu.cli.factory import build_ood_method
from ood_in_object_detection_tpu.ood.sdr import fit_triplet_embedder


def test_supervised_embedder_separates_classes(rng):
    # two well-separated classes in 24-D
    a = rng.normal(0, 0.3, (120, 24)) + 3
    b = rng.normal(0, 0.3, (120, 24)) - 3
    X = np.concatenate([a, b]).astype(np.float32)
    y = np.concatenate([np.zeros(120), np.ones(120)])
    emb = fit_triplet_embedder(X, y, out_dim=8, epochs=10, batch=64)
    Z = emb.transform(X)
    assert Z.shape == (240, 8)
    ca, cb = Z[:120].mean(0), Z[120:].mean(0)
    inter = np.linalg.norm(ca - cb)
    intra = (Z[:120].std(0).mean() + Z[120:].std(0).mean()) / 2
    assert inter > 2 * intra  # classes separated in embedding space


def test_sdr_method_end_to_end(rng):
    m = build_ood_method("CosineIvis")
    nc = 2
    acts = [[np.empty(0)] * 3 for _ in range(nc)]
    acts[0][0] = (rng.normal(0, 0.2, (80, 16)) + 2).astype(np.float32)
    acts[1][0] = (rng.normal(0, 0.2, (80, 16)) - 2).astype(np.float32)
    m.generate_clusters(acts)
    # clusters live in the 32-dim embedded space
    assert m.clusters[0][0].shape[-1] == 32
    scores = m.compute_scores_from_activations(acts)
    assert scores[0][0].shape == (80,)
    m.generate_thresholds(scores, tpr=0.95)
    assert m.thresholds[0][0] is not None

    # an InD sample scores below threshold, a far-away sample above
    probe = np.stack([acts[0][0][0], acts[0][0][0] * -5.0]).astype(np.float32)
    feats = jnp.asarray(m.transform(probe, 0, 0))
    d = m.distances(feats, jnp.zeros(2, jnp.int32), jnp.zeros(2, jnp.int32))
    dec = np.asarray(m.decide_from_distances(
        d, jnp.zeros(2, jnp.int32), jnp.zeros(2, jnp.int32), jnp.ones(2, bool)))
    assert dec[0] == 1

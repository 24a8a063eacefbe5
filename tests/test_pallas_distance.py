"""Pallas min-group-distance kernel vs the pure-JAX reference (interpret mode
on CPU; the same kernel compiles with Mosaic on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

from ood_in_object_detection_tpu.ops.pallas import distance as pdist
from ood_in_object_detection_tpu.ood.distance import l2_normalize_rows


@pytest.fixture
def bank(rng):
    G, K, D = 6, 4, 128
    cents = rng.normal(0, 1, (G, K, D)).astype(np.float32)
    kmask = np.zeros((G, K), bool)
    kmask[0, :1] = True
    kmask[1, :3] = True
    kmask[2] = True
    kmask[4, :2] = True  # group 3 and 5 empty
    return jnp.asarray(cents), jnp.asarray(kmask)


@pytest.mark.parametrize("metric", ["l2", "cosine"])
def test_kernel_matches_reference(rng, bank, metric, monkeypatch):
    cents, kmask = bank
    feats = rng.normal(0, 1, (37, 128)).astype(np.float32)
    if metric == "cosine":
        feats = np.asarray(l2_normalize_rows(jnp.asarray(feats)))
        cents = l2_normalize_rows(cents)
    ref = np.asarray(pdist.min_group_distances_ref(jnp.asarray(feats), cents, kmask, metric))

    # run the pallas kernel in interpreter mode on CPU
    orig_call = pl.pallas_call
    monkeypatch.setattr(pdist.pl, "pallas_call",
                        lambda *a, **k: orig_call(*a, **{**k, "interpret": True}))
    got = np.asarray(pdist.min_group_distances_pallas(jnp.asarray(feats), cents, kmask, metric))
    # empty groups -> inf both sides
    assert np.isinf(got[:, 3]).all() and np.isinf(got[:, 5]).all()
    mask = np.isfinite(ref)
    np.testing.assert_allclose(got[mask], ref[mask], rtol=1e-4, atol=1e-5)


def test_pallas_nms_keep_matches_tiled(rng, monkeypatch):
    from ood_in_object_detection_tpu.ops.pallas import nms as pnms
    from ood_in_object_detection_tpu.ops.nms import _greedy_keep_tiled

    orig_call = pl.pallas_call
    monkeypatch.setattr(pnms.pl, "pallas_call",
                        lambda *a, **k: orig_call(*a, **{**k, "interpret": True}))
    k = 96
    centers = rng.uniform(20, 200, (k, 2))
    wh = rng.uniform(10, 60, (k, 2))
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], 1).astype(np.float32)
    order = np.argsort(-rng.uniform(0, 1, k))
    boxes = boxes[order]
    valid = jnp.asarray(rng.uniform(0, 1, k) > 0.1)
    got = np.asarray(pnms.greedy_keep_pallas(jnp.asarray(boxes), valid, 0.45))
    ref = np.asarray(_greedy_keep_tiled(jnp.asarray(boxes), valid, 0.45))
    np.testing.assert_array_equal(got, ref)

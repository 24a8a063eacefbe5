"""AUROC / FPR95 / AUPR score metrics (eval/ood_metrics.py)."""

import numpy as np

from ood_in_object_detection_tpu.eval.ood_metrics import (
    auroc, aupr, fpr_at_tpr, ood_score_metrics,
)


def test_auroc_perfect_and_random(rng):
    ind = np.array([3.0, 4.0, 5.0])
    ood = np.array([0.0, 1.0, 2.0])
    assert auroc(ind, ood) == 1.0
    assert auroc(ood, ind) == 0.0
    # identical distributions -> ~0.5
    a = rng.normal(0, 1, 5000)
    b = rng.normal(0, 1, 5000)
    assert abs(auroc(a, b) - 0.5) < 0.03


def test_auroc_ties_count_half():
    ind = np.array([1.0, 1.0])
    ood = np.array([1.0, 1.0])
    assert auroc(ind, ood) == 0.5


def test_fpr_at_tpr():
    ind = np.linspace(0, 1, 101)          # threshold at 5th pct keeps 95%
    ood = np.linspace(-1, 0.2, 100)
    f = fpr_at_tpr(ind, ood, 0.95)
    # OoD scores >= ~0.05 are false positives
    expect = np.mean(ood >= np.percentile(ind, 5, method="lower"))
    assert abs(f - expect) < 1e-9


def test_aupr_perfect_separation():
    assert aupr(np.array([2.0, 3.0]), np.array([0.0, 1.0])) == 1.0


def test_metrics_dict_keys(rng):
    m = ood_score_metrics(rng.normal(1, 1, 100), rng.normal(-1, 1, 100))
    assert set(m) == {"AUROC", "FPR95", "AUPR"}
    assert m["AUROC"] > 0.75
    assert m["FPR95"] < 0.6


def test_fusion_and_or_score_collection_is_continuous():
    """AUROC collection for and/or fusion must return continuous combined
    INDness, not the binary fused decision (code-review r2 finding)."""
    import jax.numpy as jnp

    from ood_in_object_detection_tpu.engine import PredictOutput
    from ood_in_object_detection_tpu.ood.methods import (
        FusionOODMethod, LogitsOODMethod)
    from ood_in_object_detection_tpu.ood.pipeline import _decisions_for_method
    from ood_in_object_detection_tpu.ops.nms import Detections

    nc, n = 3, 8
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(1, n, nc)).astype(np.float32))
    cls = jnp.asarray(rng.integers(0, nc, (1, n)), jnp.int32)
    det = Detections(boxes=jnp.zeros((1, n, 4)), conf=jnp.full((1, n), 0.9),
                     cls=cls, anchor_idx=jnp.zeros((1, n), jnp.int32),
                     valid=jnp.ones((1, n), bool))
    out = PredictOutput(det, logits, jnp.zeros((1, n), jnp.int32),
                        det.anchor_idx, jnp.zeros((1, n, 4)),
                        jnp.zeros((1, n, 4)), ())

    members = []
    for name in ("MSP", "Energy"):
        m = LogitsOODMethod(name=name)
        m.thresholds = [0.2] * nc
        m.min_score = np.full(nc, -5.0)
        m.max_score = np.full(nc, 5.0)
        members.append(m)

    for strat in ("and", "or"):
        fm = FusionOODMethod(methods=members, strategy=strat)
        scores = np.asarray(_decisions_for_method(fm, out, (4, 4, 4),
                                                  want_scores=True))
        assert scores.shape == (1, n)
        assert np.all(scores >= -1.0) and np.all(scores <= 1.0)
        # continuous, not {0,1}
        assert len(np.unique(np.round(scores, 6))) > 2
        # matches the strategy's continuous analogue of the members
        mem = np.stack([np.asarray(_decisions_for_method(m, out, (4, 4, 4),
                                                         want_scores=True))
                        for m in members])
        expect = mem.max(0) if strat == "and" else mem.min(0)
        np.testing.assert_allclose(scores, expect, rtol=1e-6)


def test_triple_fusion_vote_collection_and_majority():
    """Triple fusion (VERDICT r2 weak #7): the 'vote' strategy's AUROC
    collection is the member-INDness mean (pipeline.py vote analogue), and
    the binary fuse is the reference's 2-of-3 majority
    (ood_utils.py:3282-3301)."""
    import jax.numpy as jnp

    from ood_in_object_detection_tpu.engine import PredictOutput
    from ood_in_object_detection_tpu.ood.methods import (
        FusionOODMethod, LogitsOODMethod, fuse_decisions)
    from ood_in_object_detection_tpu.ood.pipeline import _decisions_for_method
    from ood_in_object_detection_tpu.ops.nms import Detections

    nc, n = 3, 12
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(1, n, nc)).astype(np.float32))
    cls = jnp.asarray(rng.integers(0, nc, (1, n)), jnp.int32)
    det = Detections(boxes=jnp.zeros((1, n, 4)), conf=jnp.full((1, n), 0.9),
                     cls=cls, anchor_idx=jnp.zeros((1, n), jnp.int32),
                     valid=jnp.ones((1, n), bool))
    out = PredictOutput(det, logits, jnp.zeros((1, n), jnp.int32),
                        det.anchor_idx, jnp.zeros((1, n, 4)),
                        jnp.zeros((1, n, 4)), ())

    members = []
    for name in ("MSP", "Energy", "msp"):
        m = LogitsOODMethod(name="MSP" if name == "msp" else name)
        m.thresholds = [0.2] * nc
        m.min_score = np.full(nc, -5.0)
        m.max_score = np.full(nc, 5.0)
        members.append(m)
    members[2].thresholds = [0.8] * nc  # disagreeing third member

    mem = np.stack([np.asarray(_decisions_for_method(m, out, (4, 4, 4),
                                                     want_scores=True))
                    for m in members])
    for strat, expect in (("score", mem.sum(0)), ("vote", mem.mean(0))):
        fm = FusionOODMethod(methods=members, strategy=strat)
        scores = np.asarray(_decisions_for_method(fm, out, (4, 4, 4),
                                                  want_scores=True))
        assert len(np.unique(np.round(scores, 6))) > 2  # continuous
        np.testing.assert_allclose(scores, expect, rtol=1e-6)

    # binary majority: 2-of-3 InD votes => InD
    d1 = jnp.asarray([[1, 1, 0, 0]], jnp.int32)
    d2 = jnp.asarray([[1, 0, 1, 0]], jnp.int32)
    d3 = jnp.asarray([[0, 1, 1, 0]], jnp.int32)
    got = np.asarray(fuse_decisions("vote", d1, d2, d3))
    np.testing.assert_array_equal(got, [[1, 1, 1, 0]])
    # and the end-to-end fused decision for the triple matches majority of
    # the members' own binary decisions
    fm = FusionOODMethod(methods=members, strategy="vote")
    fused = np.asarray(_decisions_for_method(fm, out, (4, 4, 4)))
    binm = np.stack([np.asarray(_decisions_for_method(m, out, (4, 4, 4)))
                     for m in members])
    np.testing.assert_array_equal(fused, (binm.sum(0) >= 2).astype(np.int32))

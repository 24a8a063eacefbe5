"""Score-kernel golden values (formulas from reference ood_utils.py:1388-1443)."""

import numpy as np
import jax.numpy as jnp
from scipy.special import logsumexp, softmax

from ood_in_object_detection_tpu.ood.scores import (
    energy_score, msp_score, no_method_score, odin_score, sigmoid_score,
)
from ood_in_object_detection_tpu.ood.thresholds import (
    generate_thresholds_per_class, generate_thresholds_per_class_per_stride,
)
from ood_in_object_detection_tpu.ood.methods import LogitsOODMethod, fuse_decisions
from ood_in_object_detection_tpu.ood.matching import match_predictions_to_targets


def test_logit_scores_match_reference_formulas(rng):
    logits = rng.normal(0, 2, (7, 5)).astype(np.float32)
    cls = rng.integers(0, 5, 7)
    jl, jc = jnp.asarray(logits), jnp.asarray(cls)

    np.testing.assert_allclose(
        np.asarray(msp_score(jl, jc)),
        softmax(logits, axis=1)[np.arange(7), cls], rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(energy_score(jl, jc, temper=2.0)),
        2.0 * logsumexp(logits / 2.0, axis=1), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(odin_score(jl, jc, temper=1000.0)),
        softmax(logits / 1000.0, axis=1)[np.arange(7), cls], rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sigmoid_score(jl, jc)),
        (1 / (1 + np.exp(-logits)))[np.arange(7), cls], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(no_method_score(jl, jc)), np.ones(7))


def test_percentile_thresholds_lower_method(rng):
    # distance method: upper tpr percentile with method='lower'
    # (reference ood_utils.py:590-613)
    scores = [rng.normal(0, 1, 100), rng.normal(0, 1, 3)]  # 2nd: too few samples
    thr = generate_thresholds_per_class(scores, tpr=0.95, is_distance=True)
    assert thr[0] == float(np.percentile(scores[0], 95, method="lower"))
    assert thr[1] is None
    # similarity method: (1 - tpr) percentile
    thr2 = generate_thresholds_per_class(scores, tpr=0.95, is_distance=False)
    assert thr2[0] == float(np.percentile(scores[0], 5, method="lower"))


def test_per_class_per_stride_thresholds(rng):
    scores = [[rng.normal(0, 1, 50) for _ in range(3)] for _ in range(2)]
    scores[1][2] = np.empty(0)
    thr = generate_thresholds_per_class_per_stride(scores, 0.95, is_distance=True)
    assert thr[0][0] == float(np.percentile(scores[0][0], 95, method="lower"))
    assert thr[1][2] is None


def test_logits_method_decide_and_indness():
    m = LogitsOODMethod("MSP")
    # 2 classes; class0 fitted, class1 not (few samples)
    acts = [np.array([[4.0, 0.0]] * 10 + [[2.0, 0.0]] * 10, np.float32), np.empty((0, 2))]
    ind_scores = m.compute_scores_from_activations(acts)
    m.generate_thresholds(ind_scores, tpr=0.95)
    thr0 = m.thresholds[0]
    assert m.thresholds[1] is None

    # a confident class-0 box (score above thr) => InD; weak one => OoD
    strong = np.array([[6.0, 0.0]], np.float32)
    weak = np.array([[0.1, 0.0]], np.float32)
    logits = jnp.asarray(np.concatenate([strong, weak])[None])
    cls = jnp.zeros((1, 2), jnp.int32)
    valid = jnp.ones((1, 2), bool)
    dec = np.asarray(m.decide(logits, cls, valid))
    assert dec.tolist() == [[1, 0]]
    ind = np.asarray(m.indness(logits, cls, valid))
    assert ind[0, 0] > 0 and ind[0, 1] < 0
    assert -1 <= ind[0, 1] <= 1

    # invalid boxes always 0
    dec2 = np.asarray(m.decide(logits, cls, jnp.zeros((1, 2), bool)))
    assert dec2.tolist() == [[0, 0]]


def test_fusion_strategies():
    a = jnp.asarray([[1, 0, 1, 0]])
    b = jnp.asarray([[1, 1, 0, 0]])
    assert np.asarray(fuse_decisions("and", a, b)).tolist() == [[1, 1, 1, 0]]
    assert np.asarray(fuse_decisions("or", a, b)).tolist() == [[1, 0, 0, 0]]
    s1 = jnp.asarray([[0.5, -0.2, 0.9]])
    s2 = jnp.asarray([[0.1, -0.3, -0.95]])
    assert np.asarray(fuse_decisions("score", s1, s2)).tolist() == [[1, 0, 0]]
    c = jnp.asarray([[1, 1, 0, 0]])
    assert np.asarray(fuse_decisions("vote", a, b, c)).tolist() == [[1, 1, 0, 0]]


def test_hungarian_matching_semantics():
    # pred0 matches tgt0 (same class, IoU>0.5); pred1 wrong class; pred2 low IoU
    preds = np.array([[0, 0, 10, 10], [20, 20, 30, 30], [100, 100, 110, 110]], float)
    pcls = np.array([0, 1, 0], float)
    tgts = np.array([[1, 1, 10, 10], [20, 20, 30, 30], [101, 108, 111, 118]], float)
    tcls = np.array([0, 0, 0], float)
    valid = match_predictions_to_targets(preds, pcls, tgts, tcls, iou_threshold=0.5)
    assert valid == [0]

    # two preds on one target: best IoU wins, the other unmatched
    preds2 = np.array([[0, 0, 10, 10], [0, 0, 11, 11]], float)
    pcls2 = np.array([0, 0], float)
    tgts2 = np.array([[0, 0, 10, 10]], float)
    tcls2 = np.array([0], float)
    valid2 = match_predictions_to_targets(preds2, pcls2, tgts2, tcls2, 0.5)
    assert valid2 == [0]


def test_sigmoid_post_sigmoid_inputs_apply_sigmoid_once():
    """use_values_before_sigmoid=False must not sigmoid twice for the
    Sigmoid method: the reference applies it only when the flag is True
    (ood_utils.py:1436-1441); with post-sigmoid activations it uses them
    directly — on our raw-logit tap both flag values give sigmoid(logit)."""
    import jax.numpy as jnp
    import numpy as np

    from ood_in_object_detection_tpu.ood.methods import LogitsOODMethod

    logits = jnp.asarray([[2.0, -1.0], [0.5, 3.0]], jnp.float32)
    cls = jnp.asarray([0, 1], jnp.int32)
    pre = LogitsOODMethod(name="Sigmoid", use_values_before_sigmoid=True)
    post = LogitsOODMethod(name="Sigmoid", use_values_before_sigmoid=False)
    want = 1.0 / (1.0 + np.exp(-np.asarray([2.0, 3.0])))
    np.testing.assert_allclose(np.asarray(pre._score(logits, cls)), want,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(post._score(logits, cls)), want,
                               rtol=1e-6)


def test_odin_explicit_t1_honored():
    """ODIN with an explicit temper=1.0 must run at T=1 (no magic remap to
    1000); the None default resolves to the reference CLI default 1000."""
    import jax.numpy as jnp
    import numpy as np

    from ood_in_object_detection_tpu.ood.methods import LogitsOODMethod
    from ood_in_object_detection_tpu.ood.scores import odin_score

    logits = jnp.asarray([[2.0, -1.0, 0.3]], jnp.float32)
    cls = jnp.asarray([0], jnp.int32)
    t1 = LogitsOODMethod(name="ODIN", temper=1.0)
    np.testing.assert_allclose(np.asarray(t1._score(logits, cls)),
                               np.asarray(odin_score(logits, cls, 1.0)))
    default = LogitsOODMethod(name="ODIN")
    assert default.temper == 1000.0
    np.testing.assert_allclose(np.asarray(default._score(logits, cls)),
                               np.asarray(odin_score(logits, cls, 1000.0)))

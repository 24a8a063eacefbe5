"""Unknown-localization (EUL) kernels vs reference semantics
(unknown_localization_utils.py, ood_utils.py:641-1174)."""

import numpy as np
import pytest

from ood_in_object_detection_tpu.core.config import UnkEnhancementParams
from ood_in_object_detection_tpu.ood.unknown import (
    extract_boxes_from_saliency,
    greedy_nms_np,
    mean_absolute_deviation_of_ftmaps,
    postprocess_unk_proposals,
    quantile_thresholding,
    rank_distances,
    recursive_otsu,
    select_summarizer,
    threshold_otsu,
    unknown_proposals_for_image,
)


def test_summarizers_shapes(rng):
    f = rng.normal(0, 1, (10, 12, 5)).astype(np.float32)
    for name in ("ftmap_minus_mean_of_ftmaps_then_abs_sum", "sum_of_ftmaps",
                 "std_of_ftmaps", "iqr_of_ftmaps",
                 "mean_absolute_deviation_of_ftmaps",
                 "median_absolute_deviation_of_ftmaps"):
        out = select_summarizer(name)(f)
        assert out.shape == (10, 12), name


def test_mad_summarizer_formula(rng):
    f = rng.normal(0, 1, (4, 4, 3))
    got = mean_absolute_deviation_of_ftmaps(f)
    ref = np.abs(f - f.mean(axis=(0, 1))).mean(axis=-1)
    np.testing.assert_allclose(got, ref)


def test_otsu_bimodal():
    vals = np.concatenate([np.full(500, 1.0), np.full(500, 9.0)])
    vals += np.random.default_rng(0).normal(0, 0.1, 1000)
    t = threshold_otsu(vals)
    # any cut separating the two modes maximizes inter-class variance; argmax
    # takes the first such bin (same tie-break as skimage)
    assert abs((vals < t).sum() - 500) <= 5 and 1.0 < t < 9.0


def test_recursive_otsu_count():
    img = np.random.default_rng(0).uniform(0, 1, (40, 40))
    thrs = recursive_otsu(img, num_classes=4)  # depth 2 -> up to 3 thresholds
    assert 1 <= len(thrs) <= 3
    assert thrs == sorted(thrs)


def test_quantile_thresholding():
    img = np.arange(100, dtype=float).reshape(10, 10)
    thrs = quantile_thresholding(img, 4)
    np.testing.assert_allclose(thrs, np.quantile(img, [0.25, 0.5, 0.75]))


def test_connected_components_boxes():
    sal = np.zeros((20, 20))
    sal[2:5, 3:7] = 1.0    # region A
    sal[10:15, 12:18] = 2.0  # region B
    boxes = extract_boxes_from_saliency(sal, [0.5, 1.5])
    # thr 0.5: both regions; thr 1.5: only B. xyxy with exclusive max.
    assert boxes[0].shape == (2, 4)
    got = sorted(boxes[0].tolist())
    assert got == [[3, 2, 7, 5], [12, 10, 18, 15]]
    assert boxes[1].tolist() == [[12, 10, 18, 15]]


def test_greedy_nms_keeps_best():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 10, 10], [50, 50, 60, 60]], float)
    scores = np.array([0.9, 0.8, 0.5])
    keep = greedy_nms_np(boxes, scores, 0.45)
    assert keep.tolist() == [0, 2]


def test_rank_distance_ops(rng):
    d = rng.uniform(0.1, 1.0, (5, 7))
    assert rank_distances(d, "mean").shape == (7,)
    np.testing.assert_allclose(rank_distances(d, "min"), d.min(0) * 100)
    p = d / d.sum(0, keepdims=True)
    np.testing.assert_allclose(rank_distances(d, "entropy"),
                               -(p * np.log(p)).sum(0), rtol=1e-6)


def test_postprocess_filters_and_topk():
    hyp = UnkEnhancementParams()
    hyp.USE_SIMPLE_HEURISTICS = True
    hyp.MIN_BOX_SIZE = 2
    hyp.RANK_BOXES = True
    hyp.rank.NMS = 0.0
    hyp.rank.MAX_NUM_UNK_BOXES_PER_IMAGE = 2
    boxes_per_thr = [
        np.array([[0, 0, 1, 1], [2, 2, 10, 10], [20, 20, 30, 30], [40, 40, 55, 55]], np.float32),
    ]
    props, ranks = postprocess_unk_proposals(
        boxes_per_thr, padding_xy=(0, 0), unpadded_hw=(64, 64),
        pred_boxes_ftmap=np.empty((0, 4)),
        rank_score_fn=lambda p: np.arange(len(p), dtype=np.float32),
        hyp=hyp,
    )
    # tiny box (1x1) removed; lowest-rank 2 of the remaining 3 kept
    assert len(props) == 2
    assert ranks.tolist() == [0.0, 1.0]


def test_unknown_proposals_for_image_full_pass(rng):
    # padded stride-8 map with a bright blob in the unpadded interior
    H = W = 16
    feat = rng.normal(0, 0.05, (H, W, 8)).astype(np.float32)
    feat[5:9, 6:10] += 3.0
    ratio_pad = ((1.0, 1.0), (16.0, 8.0))  # dw=16px->2 cells, dh=8px->1 cell
    hyp = UnkEnhancementParams()
    hyp.RANK_BOXES = False
    props, dec, ranks = unknown_proposals_for_image(
        feat, ratio_pad, pred_boxes_xyxy=np.empty((0, 4)), hyp=hyp)
    assert (dec == 0).all()
    assert ranks is None
    assert len(props) >= 1
    # the blob box should cover roughly x=[6,10)*8, y=[5,9)*8 in image space
    areas = (props[:, 2] - props[:, 0]) * (props[:, 3] - props[:, 1])
    best = props[np.argmin(np.abs(areas - 32 * 32))]
    assert best[0] <= 6 * 8 + 8 and best[2] >= 10 * 8 - 8


def test_unk_proposal_threshold_gating():
    hyp = UnkEnhancementParams()
    hyp.RANK_BOXES = True
    hyp.rank.NMS = 0.0
    hyp.rank.USE_UNK_PROPOSALS_THR = True
    hyp.rank.MAX_NUM_UNK_BOXES_PER_IMAGE = 10
    boxes_per_thr = [np.array([[0, 0, 10, 10], [20, 20, 30, 30],
                               [40, 40, 50, 50]], np.float32)]
    props, ranks = postprocess_unk_proposals(
        boxes_per_thr, (0, 0), (64, 64), np.empty((0, 4)),
        rank_score_fn=lambda p: np.array([0.1, 0.9, 0.5], np.float32),
        hyp=hyp, unk_prop_thr=0.6)
    # ranks sorted ascending, gated at < 0.6 -> keeps 0.1 and 0.5
    np.testing.assert_allclose(ranks, [0.1, 0.5], rtol=1e-6)
    assert len(props) == 2


def test_use_ood_thr_gate_keeps_close_props():
    """USE_OOD_THR_TO_REMOVE_PROPS 'min' path (ood_utils.py:1141-1152): after
    ranking, proposals are KEPT when their min centroid distance is below the
    closest class's own threshold."""
    import dataclasses

    import numpy as np
    from ood_in_object_detection_tpu.core.config import CUSTOM_HYP
    from ood_in_object_detection_tpu.ood.unknown import postprocess_unk_proposals

    hyp = dataclasses.replace(
        CUSTOM_HYP.unk,
        USE_HEURISTICS=True, USE_SIMPLE_HEURISTICS=False,
        RANK_BOXES=True,
        rank=dataclasses.replace(CUSTOM_HYP.unk.rank,
                                 USE_OOD_THR_TO_REMOVE_PROPS=True,
                                 NMS=0.0, MAX_NUM_UNK_BOXES_PER_IMAGE=10,
                                 GET_BOXES_WITH_GREATER_RANK=False,
                                 RANK_BOXES_OPERATION="min"),
    )
    props = np.asarray([[0, 0, 4, 4], [10, 10, 14, 14], [20, 20, 24, 24]],
                       np.float32)
    # rank fn returns (min distance, closest class id) per proposal
    dists = np.asarray([0.2, 0.9, 0.4], np.float32)
    closest = np.asarray([0, 1, 1])

    def rank_fn(p):
        return dists[: len(p)], closest[: len(p)]

    class_thr = np.asarray([0.5, 0.5], np.float64)
    out, ranks = postprocess_unk_proposals(
        [props], (0, 0), (64, 64), np.empty((0, 4)),
        rank_score_fn=rank_fn, hyp=hyp, class_thresholds=class_thr)
    # sorted ascending by distance: [0.2(c0), 0.4(c1), 0.9(c1)];
    # gate keeps dist < thr[closest]: 0.2<0.5 keep, 0.4<0.5 keep, 0.9 drop
    assert len(out) == 2
    np.testing.assert_allclose(sorted(ranks.tolist()), [0.2, 0.4])

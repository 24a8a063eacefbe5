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


# ---------------------------------------------------------------------------
# Device front-end (unknown_device.py) vs host implementations
# ---------------------------------------------------------------------------


def _device_frontend(feat_batch, pads_cells, summarizer, method, nthr):
    import jax.numpy as jnp

    from ood_in_object_detection_tpu.ood.unknown_device import eul_frontend

    return eul_frontend(jnp.asarray(feat_batch), jnp.asarray(pads_cells),
                        summarizer=summarizer, method=method,
                        num_thresholds=nthr)


def test_device_summarizers_match_host(rng):
    """Every device summarizer must reproduce the host (numpy) value inside
    the unpadded crop; mean-subtracting families use the crop mean."""
    from ood_in_object_detection_tpu.ood.unknown import SUMMARIZERS
    from ood_in_object_detection_tpu.ood.unknown_device import (
        DEVICE_SUMMARIZERS)

    feat = rng.normal(0, 1, (2, 16, 20, 8)).astype(np.float32)
    pads = np.array([[2, 1], [0, 3]], np.int32)  # (px, py) per image
    assert DEVICE_SUMMARIZERS == frozenset(SUMMARIZERS)
    for name in sorted(DEVICE_SUMMARIZERS):
        sal, _ = _device_frontend(feat, pads, name, "quantile", 3)
        sal = np.asarray(sal)
        for i in range(2):
            px, py = pads[i]
            crop = feat[i, py:16 - py, px:20 - px]
            host = SUMMARIZERS[name](crop)
            dev = sal[i, py:16 - py, px:20 - px]
            np.testing.assert_allclose(dev, host, rtol=2e-4, atol=2e-4,
                                       err_msg=name)


def test_device_recursive_otsu_matches_host(rng):
    feat = rng.normal(0, 1, (3, 16, 16, 8)).astype(np.float32)
    feat[0, 4:10, 4:10] += 4.0  # bimodal image
    pads = np.zeros((3, 2), np.int32)
    sal, thr = _device_frontend(feat, pads,
                                "mean_absolute_deviation_of_ftmaps",
                                "recursive_otsu", 3)
    sal, thr = np.asarray(sal), np.asarray(thr)
    for i in range(3):
        host = recursive_otsu(sal[i].astype(np.float64), 4)
        dev = sorted({float(t) for t in thr[i] if np.isfinite(t)})
        assert len(dev) == len(host)
        span = np.ptp(sal[i])
        np.testing.assert_allclose(dev, host, atol=span / 256 * 0.5 + 1e-5)


def test_device_quantile_matches_host(rng):
    feat = rng.normal(0, 1, (2, 12, 12, 4)).astype(np.float32)
    pads = np.array([[1, 2], [0, 0]], np.int32)
    sal, thr = _device_frontend(feat, pads, "sum_of_ftmaps", "quantile", 3)
    sal, thr = np.asarray(sal), np.asarray(thr)
    for i in range(2):
        px, py = pads[i]
        crop = sal[i, py:12 - py, px:12 - px]
        host = quantile_thresholding(crop.astype(np.float64), 4)
        dev = sorted({float(t) for t in thr[i] if np.isfinite(t)})
        np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-5)


def test_device_otsu_degenerate_constant_map():
    """Constant saliency = zero ptp: host recursion stops with no thresholds,
    device must emit all-NaN (and NaN subtrees after a real root split)."""
    feat = np.ones((1, 8, 8, 4), np.float32)
    pads = np.zeros((1, 2), np.int32)
    _, thr = _device_frontend(feat, pads, "sum_of_ftmaps",
                              "recursive_otsu", 3)
    assert not np.isfinite(np.asarray(thr)).any()


def test_eul_frontend_batched_end_to_end(rng):
    """Full EUL via the batched device front-end == full host pass (same
    proposals) on a blob image, including nonzero letterbox pads."""
    from ood_in_object_detection_tpu.ood.unknown import eul_frontend_batched

    H = W = 16
    feat = rng.normal(0, 0.05, (2, H, W, 8)).astype(np.float32)
    feat[0, 5:9, 6:10] += 3.0
    feat[1, 2:6, 2:12] += 2.0
    ratio_pads = [((1.0, 1.0), (16.0, 8.0)), ((1.0, 1.0), (0.0, 0.0))]
    hyp = UnkEnhancementParams()
    hyp.RANK_BOXES = False
    fe = eul_frontend_batched(feat, ratio_pads, hyp=hyp)
    assert fe is not None and len(fe) == 2
    for i in range(2):
        props_dev, dec, _ = unknown_proposals_for_image(
            feat[i], ratio_pads[i], np.empty((0, 4)), hyp=hyp,
            precomputed=fe[i])
        props_host, _, _ = unknown_proposals_for_image(
            feat[i], ratio_pads[i], np.empty((0, 4)), hyp=hyp)
        assert (dec == 0).all()
        np.testing.assert_array_equal(props_dev, props_host)


def test_eul_frontend_batched_host_fallback():
    """Methods without a device path return None (caller falls back)."""
    from ood_in_object_detection_tpu.ood.unknown import eul_frontend_batched

    hyp = UnkEnhancementParams()
    hyp.THRESHOLDING_METHOD = "k_means"
    assert eul_frontend_batched(np.zeros((1, 8, 8, 4), np.float32),
                                [((1.0, 1.0), (0.0, 0.0))], hyp=hyp) is None


def test_multi_otsu_dp_matches_exhaustive(rng):
    """The O(k*nbins^2) dynamic program must find the same optimal cuts as
    the exhaustive C(nbins-1, k) search over the identical w*m^2 objective
    (the DP replaced the exhaustive loop, which took minutes per image at
    NUM_THRESHOLDS=4)."""
    from itertools import combinations

    from ood_in_object_detection_tpu.ood.unknown import multi_threshold_otsu

    def exhaustive(image, num_classes, nbins):
        vals = np.asarray(image, np.float64).ravel()
        counts, edges = np.histogram(vals, nbins)
        centers = (edges[:-1] + edges[1:]) / 2
        p = counts.astype(np.float64)
        csum = np.concatenate([[0.0], np.cumsum(p)])
        cmean = np.concatenate([[0.0], np.cumsum(p * centers)])

        def cv(lo, hi):
            w = csum[hi] - csum[lo]
            if w <= 0:
                return 0.0
            m = (cmean[hi] - cmean[lo]) / w
            return w * m * m

        best, best_cut = -1.0, None
        for cut in combinations(range(1, nbins), num_classes - 1):
            b = (0,) + cut + (nbins,)
            s = sum(cv(b[i], b[i + 1]) for i in range(len(b) - 1))
            if s > best:
                best, best_cut = s, cut
        return sorted(set(float(centers[c - 1]) for c in best_cut))

    img = np.concatenate([rng.normal(0, 1, 300), rng.normal(5, 0.5, 200),
                          rng.normal(9, 0.7, 150)])
    for nc, nb in [(2, 128), (3, 48), (4, 24), (5, 16)]:
        np.testing.assert_allclose(multi_threshold_otsu(img, nc, nb),
                                   exhaustive(img, nc, nb),
                                   err_msg=f"classes={nc} bins={nb}")


def test_device_rank_fn_matches_host_rank_fn(rng):
    """_make_rank_fn_device (ranks proposals against the DEVICE-resident P3
    map; ood/pipeline.py) must agree with the host-NumPy _make_rank_fn for
    every rank op, including the ('min', closest-class) tuple path — the
    eval loop switches between them based on where the map lives, so they
    must be interchangeable. (The device path exists so the EUL loop never
    fetches a neck feature map to the host: PERF.md r5 EUL post-mortem.)"""
    import dataclasses

    import jax.numpy as jnp
    from ood_in_object_detection_tpu.core.config import CUSTOM_HYP
    from ood_in_object_detection_tpu.ood.methods import DistanceOODMethod
    from ood_in_object_detection_tpu.ood.pipeline import (
        _make_rank_fn, _make_rank_fn_device, _stride0_rank_bank)

    H = W = 16
    C = 8
    NC = 3
    p3 = rng.normal(0, 1.0, (2, H, W, C)).astype(np.float32)
    dm = DistanceOODMethod.from_name("Cosine_cl_stride", cluster_method="all")
    clusters = []
    for c in range(NC):
        row = [np.empty(0)] * 3
        if c != 1:  # class 1 has no stride-0 cluster (inf row filtered)
            cl = rng.normal(size=(2 + c, C)).astype(np.float32)
            row[0] = cl / np.linalg.norm(cl, axis=-1, keepdims=True)
        clusters.append(row)
    dm.clusters = clusters

    bank_rows = _stride0_rank_bank(dm, C)
    assert bank_rows is not None
    props = np.array([[1.0, 1.0, 5.0, 7.0],
                      [3.0, 2.0, 12.0, 9.0],
                      [0.0, 0.0, 15.0, 15.0]], np.float32)

    for img in range(2):
        host_fn = _make_rank_fn(dm, p3[img])
        dev_fn = _make_rank_fn_device(dm, jnp.asarray(p3), img, bank_rows)
        for op, gate in (("mean", False), ("min", True), ("min", False),
                         ("max", False), ("entropy", False)):
            unk = dataclasses.replace(
                CUSTOM_HYP.unk,
                rank=dataclasses.replace(CUSTOM_HYP.unk.rank,
                                         RANK_BOXES_OPERATION=op,
                                         USE_OOD_THR_TO_REMOVE_PROPS=gate))
            old = CUSTOM_HYP.unk
            CUSTOM_HYP.unk = unk
            try:
                rh = host_fn(props)
                rd = dev_fn(props)
            finally:
                CUSTOM_HYP.unk = old
            if isinstance(rh, tuple):
                assert isinstance(rd, tuple)
                np.testing.assert_allclose(rd[0], rh[0], rtol=1e-5, atol=1e-6)
                np.testing.assert_array_equal(rd[1], rh[1])
            else:
                np.testing.assert_allclose(rd, rh, rtol=1e-5, atol=1e-6)
        # empty proposals: both return an empty score vector
        assert len(dev_fn(np.empty((0, 4), np.float32))) == 0


def test_rank_reduce_device_batched_matches_host(rng):
    """The BATCHED device-side rank reduction (_rank_reduce_device_batched,
    the eval loop's one-dispatch-per-batch path that never fetches the
    (B, cap, nc) distance matrix) must agree with _rank_from_matrix applied
    to the fetched matrix, for every reducible op incl. the gated-'min'
    (score, closest-class) pair. Reference semantics: ood_utils.py:1056-1092."""
    import jax.numpy as jnp
    from ood_in_object_detection_tpu.ood.methods import DistanceOODMethod
    from ood_in_object_detection_tpu.ood.pipeline import (
        _DEVICE_RANK_OPS, _rank_from_matrix, _rank_matrix_device_batched,
        _rank_reduce_device_batched, _stride0_rank_bank)
    import dataclasses
    from ood_in_object_detection_tpu.core.config import CUSTOM_HYP

    H = W = 16
    C = 8
    NC = 4
    B, cap = 3, 5
    p3 = rng.normal(0, 1.0, (B, H, W, C)).astype(np.float32)
    dm = DistanceOODMethod.from_name("Cosine_cl_stride", cluster_method="all")
    clusters = []
    for c in range(NC):
        row = [np.empty(0)] * 3
        if c != 2:  # class 2 has no stride-0 clusters -> excluded row
            cl = rng.normal(size=(2 + c, C)).astype(np.float32)
            row[0] = cl / np.linalg.norm(cl, axis=-1, keepdims=True)
        clusters.append(row)
    dm.clusters = clusters
    rank_bank = _stride0_rank_bank(dm, C)
    assert rank_bank is not None
    bank, row_cls = rank_bank

    props = rng.uniform(0, 12, (B, cap, 4)).astype(np.float32)
    props[..., 2:] += props[..., :2] + 1.0  # valid xyxy

    mats = np.asarray(_rank_matrix_device_batched(
        jnp.asarray(p3), jnp.asarray(props), bank.centroids, bank.count,
        metric=dm.metric), np.float32)

    for op in _DEVICE_RANK_OPS:
        for gated in ((False, True) if op == "min" else (False,)):
            unk = dataclasses.replace(
                CUSTOM_HYP.unk,
                rank=dataclasses.replace(CUSTOM_HYP.unk.rank,
                                         RANK_BOXES_OPERATION=op,
                                         USE_OOD_THR_TO_REMOVE_PROPS=gated))
            old = CUSTOM_HYP.unk
            CUSTOM_HYP.unk = unk
            try:
                red = _rank_reduce_device_batched(
                    jnp.asarray(p3), jnp.asarray(props), bank.centroids,
                    bank.count, jnp.asarray(row_cls), metric=dm.metric,
                    op=op, gated=gated)
                for i in range(B):
                    host = _rank_from_matrix(mats[i].T[row_cls], row_cls)
                    if gated:
                        np.testing.assert_allclose(
                            np.asarray(red[0][i]), host[0],
                            rtol=1e-5, atol=1e-6)
                        np.testing.assert_array_equal(
                            np.asarray(red[1][i]), host[1])
                    else:
                        np.testing.assert_allclose(
                            np.asarray(red[i]), host, rtol=1e-5, atol=1e-6)
            finally:
                CUSTOM_HYP.unk = old


def test_stride0_rank_bank_gates():
    """The device rank bank refuses methods it can't represent (custom
    transform_fn, dim mismatch, no stride-0 clusters) so the eval loop
    falls back to the host path instead of mis-ranking."""
    from ood_in_object_detection_tpu.ood.methods import DistanceOODMethod
    from ood_in_object_detection_tpu.ood.pipeline import _stride0_rank_bank

    dm = DistanceOODMethod.from_name("L2_cl_stride", cluster_method="one")
    dm.clusters = [[np.empty(0)] * 3]
    assert _stride0_rank_bank(dm, 8) is None  # no stride-0 clusters
    dm.clusters = [[np.ones((2, 4), np.float32), np.empty(0), np.empty(0)]]
    assert _stride0_rank_bank(dm, 8) is None  # dim != p3 channels
    assert _stride0_rank_bank(dm, 4) is not None
    dm.transform_fn = lambda a, c, s: a
    assert _stride0_rank_bank(dm, 4) is None  # custom transform

"""End-to-end pipeline smoke: dataset on disk -> batches -> extract -> fit ->
evaluate, on a tiny random-init model (plumbing, not quality)."""

import numpy as np
import pytest

from ood_in_object_detection_tpu.data import DetectionDataset, PaddedBatcher
from ood_in_object_detection_tpu.engine import Detector
from ood_in_object_detection_tpu.ood.methods import (
    DistanceOODMethod, FusionOODMethod, LogitsOODMethod,
)
from ood_in_object_detection_tpu.ood.pipeline import (
    evaluate_method, extract_ind_activations, fit_ind_pipeline,
)


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("ds")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.default_rng(0)
    files = []
    for i in range(4):
        img = (rng.uniform(0, 255, (80, 100, 3))).astype(np.uint8)
        f = root / "images" / f"img{i}.jpg"
        Image.fromarray(img).save(f)
        # one box per image, classes 0/1 alternating, one unknown-ish (class 5)
        cls = i % 2 if i < 3 else 5
        (root / "labels" / f"img{i}.txt").write_text(f"{cls} 0.5 0.5 0.4 0.5\n")
        files.append(str(f))
    return DetectionDataset.from_image_list(files, [f"c{k}" for k in range(6)],
                                            number_of_classes=2)


@pytest.fixture(scope="module")
def detector():
    return Detector.create("yolov8n", nc=2, img_size=96)


def test_batcher_shapes(tiny_dataset):
    b = next(iter(PaddedBatcher(tiny_dataset, batch_size=4, img_size=96, max_gt=8)))
    assert b["images"].shape == (4, 96, 96, 3)
    assert 0.0 <= b["images"].min() and b["images"].max() <= 1.0
    assert b["gt_bboxes"].shape == (4, 8, 4)
    assert b["gt_mask"].sum() == 4
    # boxes inside the letterboxed frame
    assert (b["gt_bboxes"][b["gt_mask"]] >= 0).all()
    assert (b["gt_bboxes"][b["gt_mask"]] <= 96).all()


def test_extract_fit_evaluate_logits(tiny_dataset, detector):
    batches = list(PaddedBatcher(tiny_dataset, batch_size=4, img_size=96, max_gt=8))
    m = LogitsOODMethod("MSP")
    acts = extract_ind_activations(detector, batches, m, conf_thr_train=1e-9)
    assert len(acts[id(m)]) == 2
    fit_ind_pipeline(m, acts, tpr=0.95)
    res = evaluate_method(
        detector, batches, m, known_classes=[0, 1],
        class_names=["c0", "c1", "unknown"], conf_thr_test=1e-9,
    )
    assert isinstance(res, dict) and len(res) >= 4


def test_extract_fit_evaluate_fusion_distance(tiny_dataset, detector):
    batches = list(PaddedBatcher(tiny_dataset, batch_size=4, img_size=96, max_gt=8))
    m = FusionOODMethod(
        [LogitsOODMethod("Energy"), DistanceOODMethod.from_name("Cosine_cl_stride")],
        strategy="or",
    )
    acts = extract_ind_activations(detector, batches, m, conf_thr_train=1e-9)
    fit_ind_pipeline(m, acts, tpr=0.95)
    res = evaluate_method(
        detector, batches, m, known_classes=[0, 1],
        class_names=["c0", "c1", "unknown"], conf_thr_test=1e-9,
    )
    assert isinstance(res, dict)


def test_exact_pos_and_target_extraction_options(tiny_dataset, detector):
    batches = list(PaddedBatcher(tiny_dataset, batch_size=4, img_size=96, max_gt=8))
    m1 = DistanceOODMethod.from_name("L2_cl_stride")
    m1.which_internal_activations = "ftmaps_and_strides_exact_pos"
    m2 = DistanceOODMethod.from_name("L1_cl_stride")
    m2.ind_info_creation_option = "all_targets_one_stride"
    m3 = DistanceOODMethod.from_name("Cosine_cl_stride")
    m3.ind_info_creation_option = "all_targets_all_strides"
    holder = FusionOODMethod([m1, m2, m3], strategy="vote")
    from ood_in_object_detection_tpu.ood.pipeline import extract_ind_activations

    acts = extract_ind_activations(detector, batches, holder, conf_thr_train=1e-9)
    # target-based options always extract (GT exists even without matches)
    total_m2 = sum(len(a) for row in acts[id(m2)] for a in row if hasattr(a, "__len__"))
    total_m3 = sum(len(a) for row in acts[id(m3)] for a in row if hasattr(a, "__len__"))
    assert total_m3 >= total_m2 > 0
    fit_ind_pipeline(holder, acts, tpr=0.95)
    res = evaluate_method(detector, batches, holder, known_classes=[0, 1],
                          class_names=["c0", "c1", "unknown"], conf_thr_test=1e-9)
    assert isinstance(res, dict)


def test_benchmark_cache_slim_and_reused(tiny_dataset, detector, tmp_path,
                                         monkeypatch):
    """BENCHMARK_MODE persists only post-NMS per-box tensors (reference
    Results-level cache, ood_utils.py:475-482): the cache must be orders of
    magnitude smaller than the full PredictOutput (no neck maps) and a second
    evaluate_method run must reproduce identical metrics from it without
    re-running the model."""
    import dataclasses

    from ood_in_object_detection_tpu import constants as C
    from ood_in_object_detection_tpu.core.config import CUSTOM_HYP
    from ood_in_object_detection_tpu.ood import pipeline as pl

    monkeypatch.setattr(C, "TEMPORAL_STORAGE_PATH", tmp_path / "bench_cache")
    monkeypatch.setattr(CUSTOM_HYP, "BENCHMARK_MODE", True)

    batches = list(PaddedBatcher(tiny_dataset, batch_size=4, img_size=96, max_gt=8))
    m = LogitsOODMethod("MSP")
    acts = extract_ind_activations(detector, batches, m, conf_thr_train=1e-9)
    fit_ind_pipeline(m, acts, tpr=0.95)
    kw = dict(known_classes=[0, 1], class_names=["c0", "c1", "unknown"],
              conf_thr_test=1e-9)
    res1 = evaluate_method(detector, batches, m, **kw)
    files = list((tmp_path / "bench_cache").glob("*.pkl"))
    assert files, "benchmark cache was not written"
    # the slim cache is per-box only (det/logits/roi/exact) — NO neck maps
    # (at 640 px those are hundreds of MB per batch)
    import pickle

    cached = pickle.loads(files[0].read_bytes())
    assert cached[-1] == (), "neck maps must not be cached without EUL"
    assert max(f.stat().st_size for f in files) < 4_000_000

    # second run must hit the cache: poison the real step to prove it
    def boom(*a, **k):
        raise AssertionError("model was re-run despite benchmark cache")

    monkeypatch.setattr(detector, "predict_fn", lambda *a, **k: boom)
    res2 = evaluate_method(detector, batches, m, **kw)
    assert res1 == res2


def test_data_parallel_eval_matches_single_device(tiny_dataset, detector):
    """--data_parallel capability: the whole extract->fit->evaluate pipeline
    over an 8-device DP mesh reproduces the single-device thresholds and
    metrics exactly (the reference's per-GPU process fan-out collapsed into
    one SPMD program; ood/pipeline.py _predict_step)."""
    from ood_in_object_detection_tpu.parallel import make_mesh

    mesh = make_mesh(data=8, model=1)
    single = list(PaddedBatcher(tiny_dataset, batch_size=4, img_size=96, max_gt=8))
    sharded = list(PaddedBatcher(tiny_dataset, batch_size=8, img_size=96, max_gt=8))
    kw = dict(known_classes=[0, 1], class_names=["c0", "c1", "unknown"],
              conf_thr_test=1e-9)

    m1 = LogitsOODMethod("MSP")
    acts1 = extract_ind_activations(detector, single, m1, conf_thr_train=1e-9)
    fit_ind_pipeline(m1, acts1, tpr=0.95)
    res1 = evaluate_method(detector, single, m1, **kw)

    m8 = LogitsOODMethod("MSP")
    acts8 = extract_ind_activations(detector, sharded, m8, conf_thr_train=1e-9,
                                    mesh=mesh)
    fit_ind_pipeline(m8, acts8, tpr=0.95)
    np.testing.assert_allclose(
        np.asarray(m8.thresholds, np.float64),
        np.asarray(m1.thresholds, np.float64), rtol=1e-5, atol=1e-7)
    res8 = evaluate_method(detector, sharded, m8, mesh=mesh, **kw)
    assert set(res1) == set(res8)
    for k in res1:
        np.testing.assert_allclose(res8[k], res1[k], rtol=1e-5, atol=1e-7,
                                   err_msg=k)


def test_data_parallel_eul_eval_matches_single_device(tiny_dataset, detector):
    """Sharded EUL eval exact-match (VERDICT r4 #8): evaluate_method with
    enhanced_unk_localization=True over the 8-device DP mesh must produce
    the SAME unknown proposals per image and the same metrics as the
    single-device run — the EUL device front-end (saliency + thresholds on
    the stride-8 neck map, ood/unknown_device.py) runs inside the sharded
    predict step, the host CC/rank tail is per-image and device-agnostic."""
    from ood_in_object_detection_tpu.ood import pipeline as pl
    from ood_in_object_detection_tpu.parallel import make_mesh

    mesh = make_mesh(data=8, model=1)
    single = list(PaddedBatcher(tiny_dataset, batch_size=4, img_size=96, max_gt=8))
    sharded = list(PaddedBatcher(tiny_dataset, batch_size=8, img_size=96, max_gt=8))
    kw = dict(known_classes=[0, 1], class_names=["c0", "c1", "unknown"],
              conf_thr_test=1e-9, enhanced_unk_localization=True)

    def run(batches, mesh=None):
        m = DistanceOODMethod.from_name("L2_cl_stride", cluster_method="one")
        m.which_internal_activations = "ftmaps_and_strides"
        acts = extract_ind_activations(detector, batches, m,
                                       conf_thr_train=1e-9, mesh=mesh)
        fit_ind_pipeline(m, acts, tpr=0.95)
        props_cap = []
        # finish_unknown_proposals is the funnel BOTH EUL rank paths share
        # (per-image host rank and the batched device rank)
        from ood_in_object_detection_tpu.ood import unknown as unk_mod
        orig = unk_mod.finish_unknown_proposals

        def spy(*a, **kw2):
            r = orig(*a, **kw2)
            p = r[0] if isinstance(r, tuple) else r
            props_cap.append(np.asarray(p, np.float64).reshape(-1, 4))
            return r

        unk_mod.finish_unknown_proposals = spy
        try:
            res = evaluate_method(detector, batches, m, mesh=mesh, **kw)
        finally:
            unk_mod.finish_unknown_proposals = orig
        return m, res, props_cap

    m1, res1, props1 = run(single)
    m8, res8, props8 = run(sharded, mesh=mesh)

    # fit state identical (same images; sharded batch is padded to 8 but the
    # batch_mask keeps padding images out of the extraction)
    np.testing.assert_allclose(
        np.asarray(
            [[t if t is not None and not (isinstance(t, list) and not t)
              else np.nan for t in row] for row in m8.thresholds], np.float64),
        np.asarray(
            [[t if t is not None and not (isinstance(t, list) and not t)
              else np.nan for t in row] for row in m1.thresholds], np.float64),
        rtol=1e-5, atol=1e-7)
    # EUL proposals per real image: identical boxes
    assert len(props1) == len(props8) == 4
    total = 0
    for i, (p1, p8) in enumerate(zip(props1, props8)):
        assert p1.shape == p8.shape, f"img {i}"
        np.testing.assert_allclose(p8, p1, rtol=1e-5, atol=1e-4,
                                   err_msg=f"img {i}: proposals")
        total += len(p1)
    assert total > 0, "EUL produced no proposals anywhere — vacuous"
    assert set(res1) == set(res8)
    for k in res1:
        np.testing.assert_allclose(res8[k], res1[k], rtol=1e-5, atol=1e-7,
                                   err_msg=k)

"""MicroBatchServer: coalesced serving matches direct batched predict."""

import threading

import jax
import numpy as np
import pytest

from ood_in_object_detection_tpu.engine import Detector
from ood_in_object_detection_tpu.serving import MicroBatchServer


@pytest.fixture(scope="module")
def det():
    return Detector.create("yolov8n", nc=4, img_size=64)


def test_serving_matches_direct_predict(det):
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (5, 64, 64, 3)).astype(np.float32)
    direct = det.predict(jax.numpy.asarray(imgs[:4]), conf_thres=1e-6,
                         pre_nms_k=64)
    with MicroBatchServer(det, batch_size=4, max_wait_ms=50.0,
                          conf_thres=1e-6, pre_nms_k=64) as srv:
        # concurrent submits so one micro-batch coalesces all four
        futs = [None] * 4

        def put(i):
            futs[i] = srv.submit(imgs[i])

        threads = [threading.Thread(target=put, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        results = [f.result(timeout=120) for f in futs]

        # a 5th lone request exercises the pad-partial-group path
        lone = srv.predict_one(imgs[4])
    assert lone["boxes"].shape[1] == 4

    d_valid = np.asarray(direct.det.valid)
    d_boxes = np.asarray(direct.det.boxes)
    d_cls = np.asarray(direct.det.cls)
    for i, res in enumerate(results):
        assert res["num_valid"] == int(d_valid[i].sum())
        np.testing.assert_allclose(res["boxes"], d_boxes[i][d_valid[i]],
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_array_equal(res["cls"], d_cls[i][d_valid[i]])


def test_serving_with_fitted_ood_method(det):
    """A fitted logits method attached to the server yields per-box is_ood
    verdicts identical to the pipeline's decision path (1=InD convention
    inverted to an OoD flag)."""
    import jax.numpy as jnp

    from ood_in_object_detection_tpu.ood.methods import LogitsOODMethod
    from ood_in_object_detection_tpu.ood.pipeline import _decisions_for_method

    method = LogitsOODMethod(name="MSP")
    rng = np.random.default_rng(2)
    ind_scores = [rng.uniform(0.2, 1.0, 50).astype(np.float32)
                  for _ in range(det.nc)]
    method.generate_thresholds(ind_scores, tpr=0.95)

    imgs = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    direct_out = det.predict(jnp.asarray(imgs), conf_thres=1e-6, pre_nms_k=64)
    direct_dec = np.asarray(_decisions_for_method(
        method, direct_out, det.neck_channels()))
    with MicroBatchServer(det, batch_size=2, max_wait_ms=1.0, conf_thres=1e-6,
                          pre_nms_k=64, ood_method=method) as srv:
        res = srv.predict_one(imgs[0])
    valid0 = np.asarray(direct_out.det.valid[0])
    np.testing.assert_array_equal(res["is_ood"], direct_dec[0][valid0] == 0)
    assert res["is_ood"].dtype == bool and len(res["is_ood"]) == res["num_valid"]


def test_serving_from_bundle_zero_model_code(det, tmp_path):
    """MicroBatchServer.from_bundle serves an export_serving_bundle dir:
    same detections as the live detector, per-box is_ood from the bundled
    fitted method, batch/conf/method all sourced from bundle.json."""
    from ood_in_object_detection_tpu.ood.methods import LogitsOODMethod
    from ood_in_object_detection_tpu.utils.export import export_serving_bundle

    rng = np.random.default_rng(3)
    method = LogitsOODMethod(name="MSP")
    method.generate_thresholds(
        [rng.uniform(0.2, 1.0, 50).astype(np.float32)
         for _ in range(det.nc)], tpr=0.95)
    p = export_serving_bundle(det, method, tmp_path / "bundle", batch=2,
                              conf_thres=1e-6)

    imgs = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    direct = det.predict(jax.numpy.asarray(imgs), conf_thres=1e-6)
    with MicroBatchServer.from_bundle(p, max_wait_ms=1.0) as srv:
        assert srv.batch_size == 2 and srv.ood_method is not None
        res = srv.predict_one(imgs[0])
        # u8 submits hit the shim's host normalization (the exported step
        # was traced at f32 [0,1])
        res_u8 = srv.predict_one((imgs[0] * 255).round().astype(np.uint8))
    valid0 = np.asarray(direct.det.valid[0])
    assert res["num_valid"] == int(valid0.sum()) > 0
    np.testing.assert_allclose(res["boxes"],
                               np.asarray(direct.det.boxes)[0][valid0],
                               rtol=1e-5, atol=1e-4)
    assert "is_ood" in res and len(res["is_ood"]) == res["num_valid"]
    assert res_u8["num_valid"] == res["num_valid"]

    with pytest.raises(ValueError, match="fixed-shape"):
        MicroBatchServer.from_bundle(p, batch_size=4)


def test_serving_error_propagates_and_keeps_serving(det):
    with MicroBatchServer(det, batch_size=2, max_wait_ms=1.0,
                          conf_thres=1e-6, pre_nms_k=64) as srv:
        bad = srv.submit(np.zeros((7, 7, 3), np.float32))  # wrong size
        with pytest.raises(Exception):
            bad.result(timeout=120)
        ok = srv.predict_one(
            np.random.default_rng(1).uniform(0, 1, (64, 64, 3))
            .astype(np.float32))
        assert ok["num_valid"] >= 0


def test_serving_executable_raises_mid_batch_fails_all_futures(det):
    """If the jitted executable itself raises while a coalesced group is in
    flight, EVERY pending future in that group must receive the exception
    (none may hang) and the server must keep serving afterwards
    (serving.py:_loop group-failure path)."""
    rng = np.random.default_rng(5)
    imgs = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    with MicroBatchServer(det, batch_size=2, max_wait_ms=200.0,
                          conf_thres=1e-6, pre_nms_k=64) as srv:
        real_predict = srv._predict

        def poisoned(images):
            raise RuntimeError("XLA executable died mid-batch")

        srv._predict = poisoned
        futs = [None, None]

        def put(i):
            futs[i] = srv.submit(imgs[i])

        threads = [threading.Thread(target=put, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for f in futs:
            with pytest.raises(RuntimeError, match="mid-batch"):
                f.result(timeout=120)

        srv._predict = real_predict  # server thread must still be alive
        ok = srv.predict_one(imgs[0])
        assert ok["num_valid"] >= 0 and ok["boxes"].shape[1] == 4


def test_serving_mixed_dtype_group(det):
    """A micro-batch mixing uint8 and float32 images must normalize the u8
    ones (np.stack would silently promote 0-255 values into the f32 batch)."""
    rng = np.random.default_rng(7)
    u8 = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    f32 = u8.astype(np.float32) / 255.0
    direct = det.predict(jax.numpy.asarray(f32[None].repeat(2, axis=0)),
                         conf_thres=1e-6, pre_nms_k=64)
    with MicroBatchServer(det, batch_size=2, max_wait_ms=200.0,
                          conf_thres=1e-6, pre_nms_k=64) as srv:
        futs = [None, None]

        def put(i, img):
            futs[i] = srv.submit(img)

        threads = [threading.Thread(target=put, args=(0, u8)),
                   threading.Thread(target=put, args=(1, f32))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        res_u8, res_f32 = [f.result(timeout=120) for f in futs]
    d_valid = np.asarray(direct.det.valid)[0]
    d_boxes = np.asarray(direct.det.boxes)[0][d_valid]
    for res in (res_u8, res_f32):
        assert res["num_valid"] == int(d_valid.sum())
        np.testing.assert_allclose(res["boxes"], d_boxes, rtol=1e-5, atol=1e-4)


def test_serving_submit_after_stop_raises(det):
    srv = MicroBatchServer(det, batch_size=2, max_wait_ms=1.0,
                           conf_thres=1e-6, pre_nms_k=64).start()
    srv.stop()
    with pytest.raises(RuntimeError, match="not running"):
        srv.submit(np.zeros((64, 64, 3), np.float32))
    srv.stop()  # idempotent


def test_serving_from_bundle_conf_mismatch_raises(det, tmp_path):
    from ood_in_object_detection_tpu.utils.export import export_serving_bundle

    p = export_serving_bundle(det, None, tmp_path / "b", batch=1,
                              conf_thres=0.25)
    with pytest.raises(ValueError, match="conf_thres"):
        MicroBatchServer.from_bundle(p, conf_thres=0.5)

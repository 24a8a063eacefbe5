"""Export + visualization smoke tests (CPU)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def small_detector():
    from ood_in_object_detection_tpu.engine import Detector

    return Detector.create("yolov8n", nc=2, img_size=64)


def test_export_stablehlo(tmp_path, small_detector):
    from ood_in_object_detection_tpu.utils.export import export_stablehlo

    p = export_stablehlo(small_detector, str(tmp_path / "model.stablehlo.txt"))
    txt = p.read_text()
    assert "stablehlo" in txt or "mhlo" in txt or "func.func" in txt
    assert p.stat().st_size > 10_000


def test_visualization_draws_and_saves(tmp_path, rng):
    from ood_in_object_detection_tpu.utils.visualization import plot_detections_with_ood

    img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    boxes = np.array([[5, 5, 30, 30], [40, 10, 60, 40]], float)
    out = plot_detections_with_ood(
        img, boxes, cls=np.array([0, 1]), conf=np.array([0.9, 0.4]),
        ood_decision=np.array([1, 0]), class_names=["cat", "dog"],
        targets_boxes=np.array([[6, 6, 29, 29]]), targets_cls=np.array([0]),
        unk_proposals=np.array([[10, 45, 25, 60]]),
        out_path=str(tmp_path / "vis.png"),
    )
    assert out.shape == (64, 64, 3)
    assert (tmp_path / "vis.png").exists()
    # drawn boxes change pixels vs the input
    base = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    assert (out != base).any()


def test_owod_tools_roundtrip(tmp_path):
    from ood_in_object_detection_tpu.data.owod_tools import (
        write_split_txt, write_task_stems_txt,
    )

    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(3):
        (d / f"im{i}.jpg").write_bytes(b"x")
    n = write_split_txt([str(d)], str(tmp_path / "train.txt"), relative_to=str(tmp_path))
    assert n == 3
    lines = (tmp_path / "train.txt").read_text().split()
    assert lines[0].startswith("./imgs/")
    assert write_task_stems_txt(["b", "a", "a"], str(tmp_path / "t1.txt")) == 2


def test_profiler_trace_smoke(tmp_path):
    import jax.numpy as jnp

    from ood_in_object_detection_tpu.utils.profiling import flops_estimate, time_fn, trace

    with trace(str(tmp_path)):
        _ = (jnp.ones((64, 64)) @ jnp.ones((64, 64))).block_until_ready()
    assert any(tmp_path.rglob("*"))  # trace artifacts written

    t = time_fn(lambda x: x @ x, jnp.ones((32, 32)), iters=2, warmup=1)
    assert t["latency_s"] > 0 and t["pipelined_s"] > 0

    f = flops_estimate(lambda x: x @ x, jnp.ones((16, 16)))
    assert f >= 2 * 16 ** 3 * 0.5  # within 2x of the analytic count


def test_export_serialized_roundtrip(tmp_path, small_detector):
    import jax
    import numpy as np
    from jax import export as jexport

    from ood_in_object_detection_tpu.utils.export import (
        _register_output_types,
        export_serialized,
    )

    p = export_serialized(small_detector, str(tmp_path / "m.jaxexport"))
    assert p.stat().st_size > 100_000
    _register_output_types()
    exported = jexport.deserialize(p.read_bytes())
    imgs = np.zeros((1, 64, 64, 3), np.float32)
    out = exported.call(imgs)
    jax.block_until_ready(out)
    assert out.det.boxes.shape[0] == 1 and out.roi_feats.ndim == 3


def test_serving_bundle_roundtrip(tmp_path, small_detector):
    """export_serving_bundle -> load_serving_bundle: the deserialized call
    (no model code/weights) + unpickled fitted fusion method reproduce the
    live detector's detections AND per-box OoD verdicts."""
    import numpy as np

    from ood_in_object_detection_tpu.ood.methods import (
        DistanceOODMethod, FusionOODMethod, LogitsOODMethod,
    )
    from ood_in_object_detection_tpu.ood.pipeline import _decisions_for_method
    from ood_in_object_detection_tpu.utils.export import (
        export_serving_bundle, load_serving_bundle,
    )

    det = small_detector
    rng = np.random.default_rng(0)
    msp = LogitsOODMethod("MSP")
    msp.generate_thresholds([rng.uniform(0.3, 1.0, 40) for _ in range(2)], 0.95)
    dist = DistanceOODMethod.from_name("L2_cl_stride")
    ch = det.neck_channels()
    dist.clusters = [[rng.normal(0, 1, (2, ch[s])).astype(np.float32)
                      for s in range(3)] for _ in range(2)]
    dist.thresholds = [[0.5, 0.5, 0.5], [0.5, 0.5, 0.5]]
    fusion = FusionOODMethod([msp, dist], strategy="or")

    p = export_serving_bundle(det, fusion, tmp_path / "bundle", batch=2,
                              conf_thres=1e-6)
    call, m2, meta = load_serving_bundle(p)
    assert meta["neck_channels"] == tuple(int(c) for c in ch)

    imgs = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    out_b = call(imgs)
    out_live = det.predict(imgs, conf_thres=1e-6)
    assert int(np.asarray(out_live.det.valid).sum()) > 0
    np.testing.assert_allclose(np.asarray(out_b.det.boxes),
                               np.asarray(out_live.det.boxes),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out_b.det.valid),
                                  np.asarray(out_live.det.valid))
    dec_b = np.asarray(_decisions_for_method(m2, out_b, meta["neck_channels"]))
    dec_live = np.asarray(_decisions_for_method(fusion, out_live, ch))
    np.testing.assert_array_equal(dec_b, dec_live)
    # the bundled distance leaf rebuilt its device bank from host clusters
    assert any(d == 0 for d in dec_live[np.asarray(out_live.det.valid)])


def test_serving_bundle_rejects_sdr_closures(tmp_path, small_detector):
    from ood_in_object_detection_tpu.ood.methods import DistanceOODMethod
    from ood_in_object_detection_tpu.utils.export import export_serving_bundle

    m = DistanceOODMethod.from_name("L2_cl_stride")
    m.transform_fn = lambda a, c, s: a  # stand-in for a fitted SDR closure
    with pytest.raises(ValueError, match="bundle"):
        export_serving_bundle(small_detector, m, tmp_path / "b2")

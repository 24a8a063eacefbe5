"""Mesh/sharding helpers on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from ood_in_object_detection_tpu.parallel import (
    batch_sharding, device_put_batch, make_mesh, shard_params,
)
from ood_in_object_detection_tpu.parallel.mesh import param_spec


def test_mesh_shapes():
    mesh = make_mesh()  # all devices on data axis
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    assert mesh.shape["dcn"] == 1
    mesh2 = make_mesh(data=4, model=2)
    assert dict(mesh2.shape) == {"dcn": 1, "data": 4, "sp": 1, "model": 2}
    mesh3 = make_mesh(data=2, sp=4)
    assert dict(mesh3.shape) == {"dcn": 1, "data": 2, "sp": 4, "model": 1}
    mesh4 = make_mesh(dcn=2)  # 2 "slices" x 4-way DP
    assert dict(mesh4.shape) == {"dcn": 2, "data": 4, "sp": 1, "model": 1}


def test_multislice_fallback_and_num_slices():
    """CPU devices expose no slice topology: num_slices == 1 and
    make_multislice_mesh degrades to a dcn=1 all-data mesh."""
    from ood_in_object_detection_tpu.parallel import (
        make_multislice_mesh, num_slices,
    )

    assert num_slices() == 1
    mesh = make_multislice_mesh()
    assert dict(mesh.shape) == {"dcn": 1, "data": 8, "sp": 1, "model": 1}


def test_param_spec_tp_sharding():
    big = jnp.zeros((3, 3, 64, 128))   # conv kernel, cout divisible
    small = jnp.zeros((3, 3, 3, 16))   # too small to shard
    bias = jnp.zeros((128,))
    assert param_spec((), big, 2) == jax.sharding.PartitionSpec(None, None, None, "model")
    assert param_spec((), small, 2) == jax.sharding.PartitionSpec()
    assert param_spec((), bias, 2) == jax.sharding.PartitionSpec()
    assert param_spec((), big, 1) == jax.sharding.PartitionSpec()


def test_device_put_batch_shards_leading_axis():
    mesh = make_mesh(data=8, model=1)
    batch = {"images": np.zeros((8, 16, 16, 3), np.float32),
             "gt_labels": np.zeros((8, 4), np.int32)}
    placed = device_put_batch(batch, mesh)
    for v in placed.values():
        assert len(v.sharding.device_set) == 8
    # global values intact
    np.testing.assert_array_equal(np.asarray(placed["images"]), batch["images"])


def test_tp_placed_kernel_is_split():
    mesh = make_mesh(data=4, model=2)
    params = {"k": jnp.arange(3 * 3 * 64 * 128, dtype=jnp.float32).reshape(3, 3, 64, 128)}
    sh = shard_params(params, mesh)
    placed = jax.device_put(params["k"], sh["k"])
    # each device holds half the output channels
    shard_shapes = {s.data.shape for s in placed.addressable_shards}
    assert shard_shapes == {(3, 3, 64, 64)}
    np.testing.assert_array_equal(np.asarray(placed), np.asarray(params["k"]))


def test_sharded_predict_matches_single_device():
    """DP serving: the engine step over an 8-device mesh produces the same
    numbers as the unsharded step, with outputs sharded on the batch axis."""
    from ood_in_object_detection_tpu.engine import Detector

    det = Detector.create("yolov8n", nc=4, img_size=64)
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (8, 64, 64, 3))
    mesh = make_mesh(data=8, model=1)
    out_s = det.predict_sharded(imgs, mesh, conf_thres=1e-6, pre_nms_k=128)
    out_1 = det.predict(imgs, conf_thres=1e-6, pre_nms_k=128)
    assert len(out_s.det.boxes.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out_s.det.boxes),
                               np.asarray(out_1.det.boxes), rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out_s.det.valid),
                                  np.asarray(out_1.det.valid))
    np.testing.assert_allclose(np.asarray(out_s.roi_feats),
                               np.asarray(out_1.roi_feats), rtol=1e-5, atol=1e-5)


def test_sp_sharded_predict_matches_single_device():
    """DPxSP serving: image height sharded over 'sp' (conv halos via XLA
    SPMD) must reproduce the unsharded predict numbers."""
    from ood_in_object_detection_tpu.engine import Detector

    det = Detector.create("yolov8n", nc=4, img_size=64)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (4, 64, 64, 3))
    mesh = make_mesh(data=4, sp=2, model=1)
    out_s = det.predict_sharded(imgs, mesh, conf_thres=1e-6, pre_nms_k=128)
    out_1 = det.predict(imgs, conf_thres=1e-6, pre_nms_k=128)
    np.testing.assert_allclose(np.asarray(out_s.det.boxes),
                               np.asarray(out_1.det.boxes), rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out_s.det.valid),
                                  np.asarray(out_1.det.valid))
    np.testing.assert_allclose(np.asarray(out_s.roi_feats),
                               np.asarray(out_1.roi_feats), rtol=1e-5, atol=1e-5)


def test_prefetch_to_device_preserves_batches_and_sharding():
    """prefetch_to_device keeps `size` sharded batches in flight but must
    yield every batch exactly once, in order, with mesh sharding applied
    (short iterators < size included)."""
    from ood_in_object_detection_tpu.parallel import prefetch_to_device

    mesh = make_mesh()
    batches = [{"images": np.full((8, 4, 4, 3), float(i), np.float32),
                "gt_labels": np.full((8, 2), i, np.int32)} for i in range(5)]
    for size in (1, 2, 7):  # size > len(batches) must also drain fully
        got = list(prefetch_to_device(iter(batches), mesh, size=size))
        assert len(got) == 5
        for i, b in enumerate(got):
            assert len(b["images"].sharding.device_set) == 8
            np.testing.assert_array_equal(np.asarray(b["images"][0, 0, 0]),
                                          np.full(3, float(i), np.float32))
    assert list(prefetch_to_device(iter([]), mesh)) == []


def test_dcn_sharded_predict_matches_single_device():
    """Hierarchical DP: batch sharded over ("dcn", "data") — the multi-slice
    layout where gradient reductions ride ICI within a slice then DCN across
    — reproduces the unsharded predict numbers exactly."""
    from ood_in_object_detection_tpu.engine import Detector

    det = Detector.create("yolov8n", nc=4, img_size=64)
    imgs = jax.random.uniform(jax.random.PRNGKey(2), (8, 64, 64, 3))
    mesh = make_mesh(dcn=2, data=4, model=1)
    out_s = det.predict_sharded(imgs, mesh, conf_thres=1e-6, pre_nms_k=128)
    out_1 = det.predict(imgs, conf_thres=1e-6, pre_nms_k=128)
    assert len(out_s.det.boxes.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out_s.det.boxes),
                               np.asarray(out_1.det.boxes), rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out_s.det.valid),
                                  np.asarray(out_1.det.valid))


def test_dcn_sharded_train_step_matches_unsharded():
    """One optimizer step over a dcn=2 x data=4 mesh == the single-device
    step: XLA's hierarchical all-reduce changes the schedule, not the math."""
    from ood_in_object_detection_tpu.models import build_model
    from ood_in_object_detection_tpu.train import (
        TrainConfig, init_state, make_sharded_train_step, shard_state,
        train_step,
    )

    model = build_model("yolov8n", nc=4)
    cfg = TrainConfig(epochs=1, steps_per_epoch=2)
    rng = jax.random.PRNGKey(0)
    batch = {
        "images": jax.random.uniform(rng, (8, 64, 64, 3)),
        "gt_labels": jnp.zeros((8, 2), jnp.int32),
        "gt_bboxes": jnp.tile(jnp.asarray([[4.0, 4.0, 28.0, 28.0]]), (8, 2, 1)),
        "gt_mask": jnp.ones((8, 2), bool),
    }
    state = init_state(model, cfg, rng, batch["images"])
    _, ref_lb = jax.jit(lambda s, b: train_step(model, cfg, s, b))(state, batch)

    mesh = make_mesh(dcn=2, data=4, model=1)
    with mesh:
        sstate = shard_state(state, mesh)
        placed = device_put_batch(batch, mesh)
        for v in placed.values():
            assert len(v.sharding.device_set) == 8
        _, lb = make_sharded_train_step(model, cfg, mesh)(sstate, placed)
    np.testing.assert_allclose(float(lb.total), float(ref_lb.total), rtol=2e-4)

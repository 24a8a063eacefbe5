"""INDness piecewise mapping golden values (reference ood_utils.py:1224-1283
logits, 1584-1650 distance) and the uint8 input path."""

import numpy as np
import jax.numpy as jnp

from ood_in_object_detection_tpu.ood.methods import DistanceOODMethod, LogitsOODMethod


def test_logits_indness_piecewise_golden():
    m = LogitsOODMethod("MSP")
    m.thresholds = [0.6]
    m.min_score = np.array([0.2], np.float32)
    m.max_score = np.array([0.9], np.float32)

    # logits chosen so softmax[cls0] hits precise scores
    def logit_for(p):
        # two classes; softmax0 = p -> l0 - l1 = log(p/(1-p)); set l1 = 0
        return [float(np.log(p / (1 - p))), 0.0]

    cls = jnp.zeros((1, 3), jnp.int32)
    valid = jnp.ones((1, 3), bool)
    logits = jnp.asarray([[logit_for(0.75), logit_for(0.4), logit_for(0.9)]])
    ind = np.asarray(m.indness(logits, cls, valid))[0]
    # above thr: (s - thr)/(max - thr); below: (s - thr)/(thr - min)
    np.testing.assert_allclose(ind[0], (0.75 - 0.6) / (0.9 - 0.6), atol=1e-4)
    np.testing.assert_allclose(ind[1], (0.4 - 0.6) / (0.6 - 0.2), atol=1e-4)
    np.testing.assert_allclose(ind[2], 1.0, atol=1e-4)  # clipped at +1


def test_distance_indness_piecewise_golden():
    m = DistanceOODMethod.from_name("L2_cl_stride")
    m.clusters = [[np.array([[0.0, 0.0]], np.float32)] * 3]
    m.thresholds = [[0.5, 0.5, 0.5]]
    m.min_dist = np.full((1, 3), 0.1, np.float32)
    m.max_dist = np.full((1, 3), 0.9, np.float32)
    cls = jnp.zeros((4,), jnp.int32)
    stride = jnp.zeros((4,), jnp.int32)
    valid = jnp.ones((4,), bool)
    dist = jnp.asarray([0.7, 0.3, 0.05, 2.0])
    ind = np.asarray(m.indness_from_distances(dist, cls, stride, valid))
    # above thr (more OoD): -(d - thr)/(max - thr); below: (thr - d)/(thr - min)
    np.testing.assert_allclose(ind[0], -(0.7 - 0.5) / (0.9 - 0.5), atol=1e-5)
    np.testing.assert_allclose(ind[1], (0.5 - 0.3) / (0.5 - 0.1), atol=1e-5)
    np.testing.assert_allclose(ind[2], 1.0, atol=1e-5)   # clipped
    np.testing.assert_allclose(ind[3], -1.0, atol=1e-5)  # clipped


def test_uint8_batch_through_detector(rng):
    from ood_in_object_detection_tpu.engine import Detector

    det = Detector.create("yolov8n", nc=2, img_size=64)
    u8 = jnp.asarray(rng.integers(0, 255, (1, 64, 64, 3)), jnp.uint8)
    f32 = u8.astype(jnp.float32) / 255.0
    o1 = det.predict(u8, conf_thres=1e-9)
    o2 = det.predict(f32, conf_thres=1e-9)
    np.testing.assert_allclose(np.asarray(o1.det.conf), np.asarray(o2.det.conf),
                               rtol=1e-4, atol=1e-5)

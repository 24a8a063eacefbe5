"""Model family construction + head decode semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ood_in_object_detection_tpu.models import build_model, model_forward
from ood_in_object_detection_tpu.models.head import (
    REG_MAX, decode_detections, dfl_expectation, make_anchors,
)


# torch counts the frozen DFL conv weight (16) that we implement param-free
EXPECTED_PARAMS = {
    # reference ultralytics/cfg/models/*/*.yaml header summaries
    "yolov8n": 3157200 - 16,
    "yolov8s": 11166560 - 16,
    "yolo11n": 2624080 - 16,
    "yolo12n": 2602288 - 16,
    "yolov9c": 25590912 - 16,
}


@pytest.mark.parametrize("name", sorted(EXPECTED_PARAMS))
def test_param_count_parity(name):
    m = build_model(name, nc=80)
    imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), imgs, train=False))
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(v["params"]))
    assert n == EXPECTED_PARAMS[name]


def test_forward_output_shapes():
    m = build_model("yolov8n", nc=20)
    imgs = jnp.zeros((2, 160, 160, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), imgs, train=False)
    out = model_forward(m, v, imgs)
    a = (160 // 8) ** 2 + (160 // 16) ** 2 + (160 // 32) ** 2
    assert out["boxes_xywh"].shape == (2, a, 4)
    assert out["cls_logits"].shape == (2, a, 20)
    assert out["anchor_strides"].shape == (a,)
    assert [f.shape[-1] for f in out["neck_feats"]] == [64, 128, 256]


def test_make_anchors_layout():
    pts, strides = make_anchors([(2, 3), (1, 1)], strides=(8, 16))
    # x-fastest within each level, +0.5 offset (reference utils/tal.py:364-376)
    np.testing.assert_allclose(np.asarray(pts[:3]), [[0.5, 0.5], [1.5, 0.5], [2.5, 0.5]])
    np.testing.assert_allclose(np.asarray(pts[3]), [0.5, 1.5])
    np.testing.assert_allclose(np.asarray(strides), [8, 8, 8, 8, 8, 8, 16])


def test_dfl_expectation_onehot_bins():
    d = np.full((1, 4, REG_MAX), -1e9, np.float32)
    for k, b in enumerate([0, 3, 7, 15]):
        d[0, k, b] = 0.0
    out = np.asarray(dfl_expectation(jnp.asarray(d)))
    np.testing.assert_allclose(out[0], [0, 3, 7, 15], atol=1e-5)


def test_decode_detections_geometry():
    """A one-hot DFL at bins (l,t,r,b) around anchor (x+.5, y+.5) must decode
    to cxcywh * stride exactly (reference head.py:109-151 semantics)."""
    h = w = 4
    nc = 2
    raw = np.zeros((1, h, w, 4 * REG_MAX + nc), np.float32)
    raw[..., : 4 * REG_MAX] = -1e9
    # anchor at grid (1, 2) -> flat 2*w+1 = 9; ltrb = (1, 2, 3, 4)
    flat = raw.reshape(1, h * w, -1)
    for k, b in enumerate([1, 2, 3, 4]):
        flat[0, 9, k * REG_MAX + b] = 0.0
    boxes, logits, strides = decode_detections([jnp.asarray(raw)], nc=nc)
    # anchor centre (1.5, 2.5); x1y1 = (0.5, 0.5), x2y2 = (4.5, 6.5)
    # cxcywh = (2.5, 3.5, 4, 6) * stride 8
    np.testing.assert_allclose(np.asarray(boxes[0, 9]), [20.0, 28.0, 32.0, 48.0], atol=1e-4)
    assert logits.shape == (1, 16, nc)
    np.testing.assert_allclose(np.asarray(strides), np.full(16, 8.0))

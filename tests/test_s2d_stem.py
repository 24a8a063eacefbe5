"""Space-to-depth stem must be numerically identical to the plain stem conv."""

import numpy as np
import jax
import jax.numpy as jnp

from ood_in_object_detection_tpu.models import build_model, layers as L


def test_stemconv_equals_conv(rng):
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 3)).astype(np.float32))
    conv = L.Conv(16, 3, 2)
    stem = L.StemConv(16)
    v = conv.init(jax.random.PRNGKey(0), x, train=False)
    y_ref = conv.apply(v, x, train=False)
    y_s2d = stem.apply(v, x, train=False)  # same params, same tree
    np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_model_outputs_identical_with_and_without_s2d(rng):
    from ood_in_object_detection_tpu.models import model_forward

    x = jnp.asarray(rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32))
    m1 = build_model("yolov8n", nc=4)
    key = jax.random.PRNGKey(0)
    v = m1.init(key, x, train=False)
    import dataclasses

    m2 = dataclasses.replace(m1, s2d_stem=False)
    o1 = model_forward(m1, v, x)
    o2 = model_forward(m2, v, x)
    np.testing.assert_allclose(np.asarray(o1["boxes_xywh"]),
                               np.asarray(o2["boxes_xywh"]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(o1["cls_logits"]),
                               np.asarray(o2["cls_logits"]), rtol=1e-4, atol=1e-4)

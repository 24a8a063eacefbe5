"""Folded stem integrated into the model: exact outputs, identical params."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ood_in_object_detection_tpu.models import build_model, model_forward


def test_folded_and_plain_outputs_match(rng):
    x = jnp.asarray(rng.normal(0.5, 0.2, (1, 64, 64, 3)).astype(np.float32))
    m_fold = build_model("yolov8n", nc=4)   # folded_stem=True default
    m_plain = dataclasses.replace(m_fold, folded_stem=False)
    v = m_plain.init(jax.random.PRNGKey(0), x, train=False)
    o1 = model_forward(m_fold, v, x)
    o2 = model_forward(m_plain, v, x)
    np.testing.assert_allclose(np.asarray(o1["cls_logits"]),
                               np.asarray(o2["cls_logits"]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(o1["boxes_xywh"]),
                               np.asarray(o2["boxes_xywh"]), rtol=1e-4, atol=2e-3)


def test_param_trees_identical_across_modes():
    m = build_model("yolov8n", nc=4)
    x = jnp.zeros((1, 64, 64, 3))
    v_inf = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), x, train=False))
    v_tr = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), x, train=True))
    s_inf = jax.tree_util.tree_structure(v_inf)
    s_tr = jax.tree_util.tree_structure(v_tr)
    assert s_inf == s_tr
    # shapes match too
    for a, b in zip(jax.tree.leaves(v_inf), jax.tree.leaves(v_tr)):
        assert a.shape == b.shape


def test_v9e_stem_not_folded():
    # yolov9e references layers 0/1 later (CBLinear taps) -> folding must
    # auto-disable and the model still run
    m = build_model("yolov9e", nc=4)
    x = jnp.zeros((1, 64, 64, 3))
    assert not m._can_fold_stem(x, train=False)

"""v10 end2end dual-head training path."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ood_in_object_detection_tpu.models import build_model
from ood_in_object_detection_tpu.train import TrainConfig, init_state, train_step


def test_v10_dual_head_trains():
    base = build_model("yolov10l", nc=4)
    # shrink for CPU test speed: n-like scaling on the v10 spec
    model = dataclasses.replace(base, depth=0.33, width=0.25, v10_dual=True)
    cfg = TrainConfig(epochs=1, steps_per_epoch=1)
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(rng, (2, 64, 64, 3))
    batch = {
        "images": imgs,
        "gt_labels": jnp.zeros((2, 3), jnp.int32),
        "gt_bboxes": jnp.tile(jnp.asarray([[8.0, 8.0, 40.0, 40.0]]), (2, 3, 1)),
        "gt_mask": jnp.ones((2, 3), bool).at[:, 1:].set(False),
    }
    state = init_state(model, cfg, rng, imgs)
    # dual head doubles the detect branches
    assert any("one2one_" in k for k in state.params["detect"])
    new_state, lb = train_step(model, cfg, state, batch)
    assert np.isfinite(float(lb.total)) and float(lb.total) > 0
    # params actually moved
    moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         state.params, new_state.params)
    assert max(jax.tree.leaves(moved)) > 0


def test_v10_inference_uses_one2one_branch():
    import dataclasses as dc

    from ood_in_object_detection_tpu.models import model_forward

    base = build_model("yolov10l", nc=4)
    model = dc.replace(base, depth=0.33, width=0.25, v10_dual=True)
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(rng, (1, 64, 64, 3))
    v = model.init(rng, imgs, train=False)
    out = model_forward(model, v, imgs)
    assert out["cls_logits"].shape[-1] == 4  # decode ran on the o2o branch

"""TAL assigner + detection loss semantics (reference utils/tal.py, utils/loss.py)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ood_in_object_detection_tpu.models.head import REG_MAX
from ood_in_object_detection_tpu.train.tal import assign, iou_xyxy
from ood_in_object_detection_tpu.train.loss import (
    bce_with_logits, ciou, detection_loss, df_loss,
)


def test_tal_assigns_inbox_anchor_to_gt():
    # 1 image, 4 anchors on a 2x2 grid (centres 0.5/1.5), 2 classes
    anc = jnp.asarray([[0.5, 0.5], [1.5, 0.5], [0.5, 1.5], [1.5, 1.5]])
    # gt box covers the left column
    gt_b = jnp.asarray([[[0.0, 0.0, 1.0, 2.0]]])
    gt_l = jnp.asarray([[1]], jnp.int32)
    gt_m = jnp.ones((1, 1), bool)
    # predictions: anchor 0 predicts the gt box well with high class-1 score
    pd_b = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0, 2.0]]), (1, 4, 1))
    pd_s = jnp.full((1, 4, 2), 0.01)
    pd_s = pd_s.at[0, 0, 1].set(0.9).at[0, 2, 1].set(0.7)
    res = assign(pd_s, pd_b, anc, gt_l, gt_b, gt_m)
    fg = np.asarray(res.fg_mask[0])
    # anchors 0 and 2 are inside the gt; 1 and 3 are not
    assert fg.tolist() == [True, False, True, False]
    # soft target peaks at class 1, best anchor gets the max score
    ts = np.asarray(res.target_scores[0])
    assert ts[:, 1].max() > 0 and ts[:, 0].max() == 0
    assert np.argmax(ts[:, 1]) == 0


def test_tal_conflict_resolved_by_iou():
    anc = jnp.asarray([[0.5, 0.5]])
    # two gts both containing the anchor; gt1 has much higher IoU with the pred
    gt_b = jnp.asarray([[[0.0, 0.0, 4.0, 4.0], [0.0, 0.0, 1.1, 1.1]]])
    gt_l = jnp.asarray([[0, 1]], jnp.int32)
    gt_m = jnp.ones((1, 2), bool)
    pd_b = jnp.asarray([[[0.0, 0.0, 1.0, 1.0]]])
    pd_s = jnp.full((1, 1, 2), 0.9)
    res = assign(pd_s, pd_b, anc, gt_l, gt_b, gt_m, topk=2)
    assert int(res.target_gt_idx[0, 0]) == 1  # higher-IoU gt wins


def test_tal_masked_gt_ignored():
    anc = jnp.asarray([[0.5, 0.5]])
    gt_b = jnp.asarray([[[0.0, 0.0, 2.0, 2.0]]])
    gt_l = jnp.asarray([[0]], jnp.int32)
    res = assign(jnp.full((1, 1, 2), 0.9), jnp.asarray([[[0., 0., 2., 2.]]]),
                 anc, gt_l, gt_b, jnp.zeros((1, 1), bool))
    assert not bool(res.fg_mask.any())


def test_ciou_perfect_match_is_one():
    b = jnp.asarray([[0.0, 0.0, 4.0, 4.0]])
    np.testing.assert_allclose(np.asarray(ciou(b, b)), [1.0], atol=1e-5)
    b2 = jnp.asarray([[10.0, 10.0, 14.0, 14.0]])
    assert float(ciou(b, b2)[0]) < 0  # disjoint + far -> negative CIoU


def test_df_loss_minimized_at_target_bin():
    # distribution peaked exactly at the integer target -> near-zero loss
    d = np.full((1, 4, REG_MAX), -20.0, np.float32)
    for k, t in enumerate([2, 5, 7, 9]):
        d[0, k, t] = 20.0
    target = jnp.asarray([[2.0, 5.0, 7.0, 9.0]])
    assert float(df_loss(jnp.asarray(d), target)[0]) < 1e-3
    # off-by-two peak -> large loss
    target2 = jnp.asarray([[4.0, 7.0, 9.0, 11.0]])
    assert float(df_loss(jnp.asarray(d), target2)[0]) > 5


def test_bce_with_logits_matches_formula(rng):
    x = jnp.asarray(rng.normal(0, 2, (10,)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0, 1, 10).astype(np.float32))
    ref = -(t * jax.nn.log_sigmoid(x) + (1 - t) * jax.nn.log_sigmoid(-x))
    np.testing.assert_allclose(np.asarray(bce_with_logits(x, t)), np.asarray(ref), rtol=1e-5)


def test_detection_loss_has_gradient_and_fg():
    """With a confident head output aligned to the GT, the assigner must find
    foreground and all three loss terms must be active with finite grads."""
    B, h, w, nc = 1, 8, 8, 2
    key = jax.random.PRNGKey(0)
    raw = [jax.random.normal(key, (B, h, w, 4 * REG_MAX + nc)) * 0.01]
    # boost class-1 logits inside the gt region so TAL finds candidates
    raw[0] = raw[0].at[:, 1:4, 1:4, 4 * REG_MAX + 1].set(4.0)
    gt_b = jnp.asarray([[[8.0, 8.0, 32.0, 32.0]]])  # pixels (stride 8 grid 1..4)
    gt_l = jnp.asarray([[1]], jnp.int32)
    gt_m = jnp.ones((1, 1), bool)

    def f(r):
        lb = detection_loss([r], gt_l, gt_b, gt_m, nc)
        return lb.total, lb

    (total, lb), g = jax.value_and_grad(f, has_aux=True)(raw[0])
    assert np.isfinite(total)
    assert float(lb.box) > 0 and float(lb.cls) > 0 and float(lb.dfl) > 0
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_training_overfits_tiny_batch():
    """End-to-end learning check: loss must drop substantially when
    overfitting one fixed batch (validates TAL + losses + optimizer + EMA
    together, not just gradient existence)."""
    from ood_in_object_detection_tpu.models import build_model
    from ood_in_object_detection_tpu.train import TrainConfig, init_state, train_step

    model = build_model("yolov8n", nc=2)
    cfg = TrainConfig(lr0=0.01, epochs=100, steps_per_epoch=1, warmup_epochs=0.1)
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(rng, (2, 96, 96, 3))
    batch = {
        "images": imgs,
        "gt_labels": jnp.asarray([[0, 1], [1, 0]], jnp.int32),
        "gt_bboxes": jnp.asarray([[[10, 10, 50, 50], [60, 20, 90, 80]],
                                  [[20, 30, 70, 90], [5, 5, 40, 40]]], jnp.float32),
        "gt_mask": jnp.ones((2, 2), bool),
    }
    state = init_state(model, cfg, rng, imgs)
    step = jax.jit(lambda s, b: train_step(model, cfg, s, b))
    first = None
    for i in range(25):
        state, lb = step(state, batch)
        if first is None:
            first = float(lb.total)
    last = float(lb.total)
    assert last < first * 0.6, f"loss did not drop: {first} -> {last}"
    # EMA tracked the params
    d = jax.tree.map(lambda e, p: float(jnp.abs(e - p).max()),
                     state.ema_params, state.params)
    assert max(jax.tree.leaves(d)) > 0


def test_remat_train_step_matches_plain():
    """TrainConfig.remat (jax.checkpoint over the per-layer boundary tags)
    must change memory, not math: one step from identical state produces the
    same loss and parameter updates as the plain step."""
    from ood_in_object_detection_tpu.models import build_model
    from ood_in_object_detection_tpu.train import TrainConfig, init_state, train_step

    model = build_model("yolov8n", nc=2)
    rng = jax.random.PRNGKey(1)
    imgs = jax.random.uniform(rng, (2, 96, 96, 3))
    batch = {
        "images": imgs,
        "gt_labels": jnp.asarray([[0, 1], [1, 0]], jnp.int32),
        "gt_bboxes": jnp.asarray([[[10, 10, 50, 50], [60, 20, 90, 80]],
                                  [[20, 30, 70, 90], [5, 5, 40, 40]]],
                                 jnp.float32),
        "gt_mask": jnp.ones((2, 2), bool),
    }
    cfg = TrainConfig(lr0=0.01, epochs=2, steps_per_epoch=1, warmup_epochs=0.1)
    cfg_r = dataclasses.replace(cfg, remat=True)
    state0 = init_state(model, cfg, rng, imgs)
    s1, lb1 = jax.jit(lambda s, b: train_step(model, cfg, s, b))(state0, batch)
    s2, lb2 = jax.jit(lambda s, b: train_step(model, cfg_r, s, b))(state0, batch)
    np.testing.assert_allclose(float(lb1.total), float(lb2.total),
                               rtol=1e-6, atol=1e-7)
    for (p1, p2) in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                                   rtol=1e-5, atol=1e-6)

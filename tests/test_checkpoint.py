"""Orbax checkpoint round trip + results writer schema."""

import numpy as np
import jax
import jax.numpy as jnp


def test_checkpoint_roundtrip(tmp_path):
    from ood_in_object_detection_tpu.core.checkpoint import (
        checkpoint_name, load_checkpoint, save_checkpoint,
    )
    from ood_in_object_detection_tpu.models import build_model
    from ood_in_object_detection_tpu.train import TrainConfig, init_state

    model = build_model("yolov8n", nc=3)
    cfg = TrainConfig(epochs=1, steps_per_epoch=1)
    state = init_state(model, cfg, jax.random.PRNGKey(0),
                       jnp.zeros((1, 64, 64, 3)))
    path = tmp_path / "ckpt"
    save_checkpoint(str(path), state, train_args={"name": "myrun", "nc": 3},
                    model_name="yolov8n", epoch=7)
    variables, meta = load_checkpoint(str(path))
    assert meta["model_name"] == "yolov8n" and meta["epoch"] == 7
    assert checkpoint_name(str(path)) == "myrun"
    # EMA params restored by default and equal to saved
    for a, b in zip(jax.tree.leaves(variables["params"]),
                    jax.tree.leaves(state.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # model accepts restored variables
    out = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
    assert len(out[0]) == 3


def test_results_writer_schema(tmp_path):
    from ood_in_object_detection_tpu.eval.results_writer import (
        append_results, fill_dataset_results, finalize_row, method_info_row,
    )
    from ood_in_object_detection_tpu.ood.methods import LogitsOODMethod

    m = LogitsOODMethod("MSP")
    row = method_info_row(m, "train", 0.15, 0.45, 0.95)
    fill_dataset_results(row, "coco_ood",
                         {"U-AP": 0.17, "U-F1": 0.2, "U-PRE": 0.85, "U-REC": 0.12})
    fill_dataset_results(row, "coco_mixed",
                         {"mAP": 0.43, "U-AP": 0.1, "U-F1": 0.1, "U-PRE": 0.1,
                          "U-REC": 0.1, "A-OSE": 98, "WI-08": 0.07})
    finalize_row(row, "yolov8l", {"x": 1})
    p = append_results([row], str(tmp_path), "schema")
    header = p.read_text().splitlines()[0].split(",")
    # reference column schema (constants.py:49-57): common first, Model/args last
    assert header[:9] == ["Method", "which_split", "conf_thr_train",
                          "conf_thr_test", "tpr_thr", "cluster_method",
                          "mean_n_clus", "std_n_clus", "fusion_strat"]
    assert header[-3:] == ["Model", "args", "custom_hyp"]
    assert "U-AP_(COOD)" in header and "A-OSE" in header and "WI-08" in header


def test_trainer_resume_bitwise(tmp_path):
    """Mid-training resume (reference engine/trainer.py resume): save after a
    step, restore the FULL TrainState (params/EMA/optimizer momentum/step),
    assert bitwise equality, then verify the next step from the restored state
    matches the next step from the live state exactly."""
    from ood_in_object_detection_tpu.core.checkpoint import (
        restore_train_state, save_checkpoint,
    )
    from ood_in_object_detection_tpu.models import build_model
    from ood_in_object_detection_tpu.train import (
        TrainConfig, init_state, train_step,
    )

    model = build_model("yolov8n", nc=2)
    cfg = TrainConfig(lr0=0.01, epochs=4, steps_per_epoch=1, warmup_epochs=0.1)
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(rng, (2, 64, 64, 3))
    batch = {
        "images": imgs,
        "gt_labels": jnp.asarray([[0], [1]], jnp.int32),
        "gt_bboxes": jnp.asarray([[[8, 8, 40, 40]], [[16, 16, 56, 56]]],
                                 jnp.float32),
        "gt_mask": jnp.ones((2, 1), bool),
    }
    step = jax.jit(lambda s, b: train_step(model, cfg, s, b))
    state = init_state(model, cfg, rng, imgs)
    state, _ = step(state, batch)

    path = tmp_path / "resume_ckpt"
    save_checkpoint(str(path), state, train_args={"name": "r", "nc": 2},
                    model_name="yolov8n", epoch=0)
    restored, meta = restore_train_state(str(path), model, cfg, imgs)
    assert meta["epoch"] == 0
    for name, a, b in [
        ("params", state.params, restored.params),
        ("ema", state.ema_params, restored.ema_params),
        ("opt", state.opt_state, restored.opt_state),
        ("stats", state.batch_stats, restored.batch_stats),
    ]:
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                          err_msg=name)
    assert int(restored.step) == int(state.step) == 1

    live_next, live_lb = step(state, batch)
    res_next, res_lb = step(restored, batch)
    np.testing.assert_array_equal(float(live_lb.total), float(res_lb.total))
    for x, y in zip(jax.tree.leaves(live_next.params),
                    jax.tree.leaves(res_next.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

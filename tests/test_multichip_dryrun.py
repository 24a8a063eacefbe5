"""Driver-facing multi-chip artifacts, exercised in-suite on the 8-device
virtual CPU mesh (conftest forces the platform before backend init).

Covers exactly the path the round-1 driver failed on: __graft_entry__'s
dryrun_multichip called directly, plus make_sharded_train_step/shard_state
on a real 8-device mesh (reference DDP semantics: engine/trainer.py:233-284)."""

import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ood_in_object_detection_tpu.models import build_model
from ood_in_object_detection_tpu.parallel import device_put_batch, make_mesh
from ood_in_object_detection_tpu.train import (
    TrainConfig, init_state, make_sharded_train_step, shard_state,
)


def _tiny_batch(B, M=4):
    rng = jax.random.PRNGKey(0)
    return {
        "images": jax.random.uniform(rng, (B, 64, 64, 3)),
        "gt_labels": jnp.zeros((B, M), jnp.int32),
        "gt_bboxes": jnp.tile(jnp.asarray([[4.0, 4.0, 28.0, 28.0]]), (B, M, 1)),
        "gt_mask": jnp.ones((B, M), bool).at[:, 2:].set(False),
    }


def test_dryrun_multichip_entrypoint():
    """The exact function the driver invokes must run in-process when the
    live backend already has >= n devices (here: the 8-CPU test mesh)."""
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_sharded_train_step_dp8():
    """make_sharded_train_step on a data=8 mesh: state placement, batch
    sharding, one step with XLA-inserted gradient all-reduce, finite loss."""
    mesh = make_mesh(data=8, model=1)
    model = build_model("yolov8n", nc=4)
    cfg = TrainConfig(epochs=1, steps_per_epoch=2)
    batch = _tiny_batch(8)

    with mesh:
        state = init_state(model, cfg, jax.random.PRNGKey(0), batch["images"])
        state = shard_state(state, mesh)
        placed = device_put_batch(batch, mesh)
        step = make_sharded_train_step(model, cfg, mesh)
        new_state, lb = step(state, placed)
        jax.block_until_ready(new_state.params)
    total = float(lb.total)
    assert np.isfinite(total) and total > 0
    # every param leaf is placed across all 8 devices (replicated or sharded)
    leaf = jax.tree.leaves(new_state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_sharded_step_matches_unsharded():
    """DP over 8 devices must compute the same step as single-device jit:
    the global batch is identical, only the placement differs."""
    from ood_in_object_detection_tpu.train import train_step

    model = build_model("yolov8n", nc=4)
    cfg = TrainConfig(epochs=1, steps_per_epoch=2)
    batch = _tiny_batch(8)
    state = init_state(model, cfg, jax.random.PRNGKey(0), batch["images"])

    ref_state, ref_lb = jax.jit(lambda s, b: train_step(model, cfg, s, b))(state, batch)

    mesh = make_mesh(data=8, model=1)
    with mesh:
        sstate = shard_state(state, mesh)
        placed = device_put_batch(batch, mesh)
        new_state, lb = make_sharded_train_step(model, cfg, mesh)(sstate, placed)
    np.testing.assert_allclose(float(lb.total), float(ref_lb.total), rtol=2e-4)
    a = jax.tree.leaves(ref_state.params)[0]
    b = jax.tree.leaves(new_state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_sharded_step_dp_sp_matches_unsharded():
    """DPxSP (batch over 'data', image height over 'sp') must compute the
    same step as single-device jit: spatial partitioning only changes where
    conv halo rows live (XLA SPMD collective-permutes), not the math."""
    from ood_in_object_detection_tpu.train import train_step

    model = build_model("yolov8n", nc=4)
    cfg = TrainConfig(epochs=1, steps_per_epoch=2)
    batch = _tiny_batch(4)
    state = init_state(model, cfg, jax.random.PRNGKey(0), batch["images"])

    ref_state, ref_lb = jax.jit(lambda s, b: train_step(model, cfg, s, b))(state, batch)

    mesh = make_mesh(data=4, sp=2, model=1)
    with mesh:
        sstate = shard_state(state, mesh)
        placed = device_put_batch(batch, mesh)
        assert placed["images"].sharding.spec == jax.sharding.PartitionSpec(
            ("dcn", "data"), "sp", None, None)
        new_state, lb = make_sharded_train_step(model, cfg, mesh)(sstate, placed)
    np.testing.assert_allclose(float(lb.total), float(ref_lb.total), rtol=2e-4)
    a = jax.tree.leaves(ref_state.params)[0]
    b = jax.tree.leaves(new_state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_freeze_prefixes_keep_params_bit_identical():
    """Regression for the round-1 freeze bug: optax.masked passed raw grads
    through for frozen leaves (unscaled gradient ASCENT). Frozen subtrees must
    be bit-identical after a step; trainable ones must move."""
    from ood_in_object_detection_tpu.train import train_step
    from ood_in_object_detection_tpu.train.trainer import backbone_freeze_prefixes

    model = build_model("yolov8n", nc=4)
    prefixes = backbone_freeze_prefixes(model.spec)
    assert prefixes and prefixes[0] == "l0_"
    cfg = TrainConfig(epochs=1, steps_per_epoch=1, freeze_prefixes=prefixes,
                      warmup_epochs=0.0)
    batch = _tiny_batch(2)
    state = init_state(model, cfg, jax.random.PRNGKey(0), batch["images"])
    new_state, _ = jax.jit(lambda s, b: train_step(model, cfg, s, b))(state, batch)

    moved_frozen, moved_train = [], []
    for (path, old), (_, new) in zip(
        jax.tree_util.tree_flatten_with_path(state.params)[0],
        jax.tree_util.tree_flatten_with_path(new_state.params)[0],
    ):
        top = str(getattr(path[0], "key", path[0]))
        delta = float(jnp.abs(new - old).max())
        if any(top.startswith(p) for p in prefixes):
            moved_frozen.append(delta)
        else:
            moved_train.append(delta)
    assert max(moved_frozen) == 0.0, "frozen params changed"
    assert max(moved_train) > 0.0, "trainable params did not move"


def test_sharded_step_with_remat_matches_unsharded():
    """TrainConfig.remat must compose with the SPMD mesh: jax.checkpoint's
    recompute region is partitioned like the forward, and the step computes
    the same loss/updates as single-device non-remat jit."""
    from ood_in_object_detection_tpu.train import train_step

    model = build_model("yolov8n", nc=4)
    cfg = TrainConfig(epochs=1, steps_per_epoch=2)
    batch = _tiny_batch(8)
    state = init_state(model, cfg, jax.random.PRNGKey(0), batch["images"])

    ref_state, ref_lb = jax.jit(
        lambda s, b: train_step(model, cfg, s, b))(state, batch)

    import dataclasses

    cfg_r = dataclasses.replace(cfg, remat=True)
    mesh = make_mesh(data=8, model=1)
    with mesh:
        sstate = shard_state(state, mesh)
        placed = device_put_batch(batch, mesh)
        new_state, lb = make_sharded_train_step(model, cfg_r, mesh)(sstate, placed)
    np.testing.assert_allclose(float(lb.total), float(ref_lb.total), rtol=2e-4)
    a = jax.tree.leaves(ref_state.params)[0]
    b = jax.tree.leaves(new_state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

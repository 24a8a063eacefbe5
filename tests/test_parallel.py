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
    mesh2 = make_mesh(data=4, model=2)
    assert mesh2.shape == {"data": 4, "model": 2}


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

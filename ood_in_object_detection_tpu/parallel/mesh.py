"""Device mesh + sharding helpers (the framework's entire "distributed backend").

The reference scales with torch DDP: subprocess relaunch, NCCL process groups
and gradient all-reduce (engine/trainer.py:194-284, utils/dist.py). TPU-native
equivalent: a named ``jax.sharding.Mesh`` over ICI with jit-sharded arrays —
XLA inserts the collectives. Axes:

- ``dcn``: slice-level data parallelism for multi-slice (multi-pod-segment)
  deployments. Batch shards over ``("dcn", "data")`` so XLA emits a
  hierarchical gradient all-reduce: reduce-scatter/all-gather over ICI
  *within* each slice, then the (much smaller) cross-slice reduction over
  DCN — the standard multi-slice recipe. Size 1 (a no-op) on single-slice
  machines; ``make_multislice_mesh`` builds the device order from the
  runtime's slice topology on real multi-slice hardware.
- ``data``: batch-dimension data parallelism within a slice (DDP equivalent)
- ``sp``: spatial parallelism over the image-height dimension of the conv
  grid (the "2D SP analogue" SURVEY.md §2.5 reserves as a design extension):
  XLA's SPMD partitioner inserts the halo collective-permutes every k>1 conv
  needs at tile edges. Scales single-image latency / huge-resolution inputs
  where DP cannot (batch 1), and — unlike conv-channel TP — its collective
  schedule also executes on XLA:CPU virtual meshes, so it is dryrun-testable.
- ``model``: output-channel tensor parallelism for the conv kernels (a design
  extension; the reference has no TP — SURVEY.md §2.5)

BatchNorm statistics are computed over the *global* batch automatically
(the jitted program is a single logical computation), which DDP only gets
with SyncBN.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXES = ("dcn", "data")


def make_mesh(
    data: Optional[int] = None, model: int = 1, sp: int = 1, dcn: int = 1,
    devices=None,
) -> Mesh:
    """Build a ("dcn", "data", "sp", "model") mesh.

    Defaults: one slice (dcn=1), all devices on data."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // (dcn * model * sp)
    assert dcn * data * sp * model == n, \
        f"mesh {dcn}x{data}x{sp}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(dcn, data, sp, model)
    return Mesh(dev_array, axis_names=("dcn", "data", "sp", "model"))


def num_slices(devices=None) -> int:
    """Number of distinct TPU slices among the devices (1 when the runtime
    exposes no slice topology — CPU meshes, single-slice TPUs)."""
    devices = devices if devices is not None else jax.devices()
    ids = {getattr(d, "slice_index", 0) for d in devices}
    return max(len(ids), 1)


def make_multislice_mesh(model: int = 1, sp: int = 1, devices=None) -> Mesh:
    """DCN-aware mesh for multi-slice deployments: groups devices by their
    slice_index so the ("data", ...) axes stay within a slice's ICI and only
    the leading "dcn" axis crosses DCN. Falls back to a dcn=1 mesh when the
    runtime has a single slice (or none — CPU).

    Requires a single-controller runtime (Pathways / proxy backends), where
    one process addresses every chip: device_put_batch places HOST arrays,
    which cannot land on non-addressable devices under stock one-process-
    per-host multislice JAX (there, feed per-host shards via
    jax.make_array_from_process_local_data instead)."""
    devices = devices if devices is not None else jax.devices()
    n_slices = num_slices(devices)
    if n_slices == 1:
        return make_mesh(model=model, sp=sp, devices=devices)
    addressable = {d.id for d in jax.local_devices()}
    if not all(d.id in addressable for d in devices):
        raise NotImplementedError(
            "make_multislice_mesh needs a single-controller runtime: "
            f"{sum(d.id not in addressable for d in devices)} of "
            f"{len(devices)} devices are not addressable from this process, "
            "so host batches cannot be device_put onto the dcn mesh. Feed "
            "per-host shards (jax.make_array_from_process_local_data) or "
            "run under Pathways.")
    ordered = sorted(devices, key=lambda d: (getattr(d, "slice_index", 0),
                                             d.id))
    per_slice = len(ordered) // n_slices
    assert per_slice * n_slices == len(ordered), "ragged slices"
    return make_mesh(data=per_slice // (model * sp), model=model, sp=sp,
                     dcn=n_slices, devices=ordered)


def batch_spec() -> P:
    return P(BATCH_AXES)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, batch_spec())


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_spec(path: tuple, leaf: jnp.ndarray, model_axis_size: int) -> P:
    """Tensor-parallel spec for a parameter leaf.

    Conv kernels are (kh, kw, cin, cout) in flax; shard cout over "model" when
    divisible and large enough to be worth the collective. Biases/BN stay
    replicated.
    """
    if model_axis_size <= 1:
        return P()
    if leaf.ndim == 4 and leaf.shape[-1] % model_axis_size == 0 and leaf.shape[-1] >= 64:
        return P(None, None, None, "model")
    return P()


def shard_params(params, mesh: Mesh):
    """NamedSharding tree for a param pytree under the given mesh."""
    msize = mesh.shape["model"]

    def to_sharding(path, leaf):
        return NamedSharding(mesh, param_spec(path, leaf, msize))

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def device_put_batch(batch, mesh: Mesh):
    """Place a host batch dict on the mesh, batch-dim sharded over the
    ("dcn", "data") axes.

    When the mesh has an ``sp`` axis of size > 1, 4-D image tensors are
    additionally sharded over their height dimension — XLA SPMD inserts the
    conv halo exchanges; every other (per-box/per-label) leaf stays
    batch-sharded only."""
    sp = "sp" in mesh.axis_names and mesh.shape["sp"] > 1

    def put(x):
        x = jnp.asarray(x)
        if sp and x.ndim == 4:
            spec = P(BATCH_AXES, "sp", None, None)
        else:
            spec = P(BATCH_AXES, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def prefetch_to_device(batches, mesh: Mesh, size: int = 2):
    """Wrap a host batch iterator so host->device transfers overlap compute:
    keeps ``size`` sharded batches in flight on the mesh ahead of the
    consumer (device_put is async, so queuing the next transfer while the
    train step runs hides the PCIe/ICI copy — the standard JAX input-feed
    pattern; the reference relies on torch DataLoader pin_memory +
    non_blocking copies for the same overlap, engine/trainer.py).

    HBM note: size+1 input batches are resident at once (yielded + buffer);
    at 640 px f32 batch 128 that is ~630 MB each. ``size=0`` disables
    buffering (place-and-yield, the pre-prefetch footprint)."""
    import collections

    buf: "collections.deque" = collections.deque()
    it = iter(batches)

    def enqueue():
        try:
            buf.append(device_put_batch(next(it), mesh))
            return True
        except StopIteration:
            return False

    if size <= 0:
        while enqueue():
            yield buf.popleft()
        return
    for _ in range(size):
        if not enqueue():
            break
    while buf:
        nxt = buf.popleft()
        enqueue()
        yield nxt

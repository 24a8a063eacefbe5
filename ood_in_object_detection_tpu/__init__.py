"""TPU-native framework for OoD detection in one-stage object detection.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
`aitor-martinez-seras/OoD_in_Object_Detection` (YOLO-family detectors with
post-hoc out-of-distribution detection, unknown-object localization and an
open-world object-detection evaluation protocol), designed TPU-first:

- the detector forward pass is a pure jitted function with multiple declared
  outputs (decoded boxes, pre-sigmoid class logits, neck feature maps) instead
  of the reference's mutate-the-model extraction hooks
  (reference: ultralytics/nn/tasks.py:117-208),
- NMS is a fixed-shape, masked top-k kernel that returns keep *indices* from
  which logits / strides / RoI features are gathered on device
  (reference threads the tensors through NMS: ultralytics/utils/ops.py:348-533),
- OoD scoring (MSP/Energy/ODIN/Sigmoid, centroid distances, fusion) runs as
  batched reductions over padded `max_det` box tensors with validity masks
  (reference loops per box in Python: ood_utils.py:1195-1208, 2147-2180),
- scaling is expressed with `jax.sharding.Mesh` + `shard_map`/`jit` shardings
  over a named device mesh (reference: torch DDP, engine/trainer.py:233-238).
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level API (avoids importing jax at package import time)
    if name == "Detector":
        from .engine import Detector

        return Detector
    if name == "build_model":
        from .models import build_model

        return build_model
    if name == "build_ood_method":
        from .cli.factory import build_ood_method

        return build_ood_method
    raise AttributeError(name)

"""Model export (reference engine/exporter.py capability + the standalone C++
ONNX inference example, examples/YOLOv8-CPP-Inference): the TPU-native
equivalents are (a) StableHLO text of the jitted forward — consumable by any
XLA/IREE/PJRT runtime — and (b) jax.export serialized artifacts."""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp


def export_stablehlo(detector, out_path: str, batch: int = 1) -> Path:
    """Lower the full predict step (forward + NMS + taps) to StableHLO text."""
    step = detector.predict_fn()
    args = (detector.variables,
            jnp.zeros((batch, detector.img_size, detector.img_size, 3), jnp.float32))
    lowered = jax.jit(step).lower(*args)
    txt = lowered.as_text()
    p = Path(out_path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(txt)
    return p


def _register_output_types():
    """jax.export needs named serializations for the NamedTuple outputs of
    the predict step (idempotent)."""
    from jax import export as jexport

    from ..engine import PredictOutput
    from ..ops.nms import Detections

    for cls, name in ((Detections, "ood_tpu.Detections"),
                      (PredictOutput, "ood_tpu.PredictOutput")):
        try:
            jexport.register_namedtuple_serialization(cls, serialized_name=name)
        except ValueError:
            pass  # already registered


def export_serialized(detector, out_path: str, batch: int = 1) -> Path:
    """jax.export round-trippable artifact (weights captured as constants)."""
    from jax import export as jexport

    _register_output_types()
    step = detector.predict_fn()
    fn = lambda images: step(detector.variables, images)
    spec = jax.ShapeDtypeStruct(
        (batch, detector.img_size, detector.img_size, 3), jnp.float32)
    exported = jexport.export(jax.jit(fn))(spec)
    data = exported.serialize()
    p = Path(out_path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_bytes(data)
    return p

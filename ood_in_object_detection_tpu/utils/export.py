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


def export_serialized(detector, out_path: str, batch: int = 1,
                      conf_thres: float = 0.25,
                      platforms=("cpu", "tpu")) -> Path:
    """jax.export round-trippable artifact (weights captured as constants).

    Lowered for every platform in ``platforms`` (multi-platform StableHLO),
    so a bundle exported on a CPU dev box serves on TPU and vice versa.
    The RoI contraction is pinned to the XLA einsum path (use_pallas=False):
    the Pallas kernel choice is a trace-time Python branch on the *exporting*
    process's backend, which would bake the wrong path into the other
    platform's lowering — and the einsum ties the kernel within ~2 %
    (PERF.md)."""
    from jax import export as jexport

    _register_output_types()
    step = detector.predict_fn(conf_thres=conf_thres, use_pallas=False)
    fn = lambda images: step(detector.variables, images)
    spec = jax.ShapeDtypeStruct(
        (batch, detector.img_size, detector.img_size, 3), jnp.float32)
    exported = jexport.export(jax.jit(fn), platforms=list(platforms))(spec)
    data = exported.serialize()
    p = Path(out_path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_bytes(data)
    return p


def export_serving_bundle(detector, method, out_dir: str,
                          batch: int = 1, conf_thres: float = 0.25,
                          platforms=("cpu", "tpu")) -> Path:
    """One deployable directory: the jax.export-serialized predict step
    (weights captured as constants) + the FITTED OoD method (pickled with
    thresholds/clusters) + metadata — a serving process needs NO model code,
    weights file, or calibration data to produce detections with per-box
    InD/OoD verdicts (`load_serving_bundle`).

    The reference's deployment story is a .pt checkpoint + the storage/ pkl
    caches + re-running ood_evaluation.py to rebuild the method; this folds
    that into a single artifact. SDR methods (fitted transform closures)
    are not picklable and are rejected with a clear error.
    """
    import json
    import pickle

    p = Path(out_dir)
    p.mkdir(parents=True, exist_ok=True)
    export_serialized(detector, p / "model.jaxexport", batch=batch,
                      conf_thres=conf_thres, platforms=platforms)
    if method is not None:
        try:
            (p / "ood_method.pkl").write_bytes(pickle.dumps(method))
        except (AttributeError, TypeError) as e:
            raise ValueError(
                "this method cannot be bundled (fitted SDR transform "
                f"closures are process-local): {e}") from e
    (p / "bundle.json").write_text(json.dumps({
        "img_size": detector.img_size,
        "batch": batch,
        "nc": detector.nc,
        "conf_thres": conf_thres,
        "platforms": list(platforms),
        "neck_channels": [int(c) for c in detector.neck_channels()],
    }))
    return p


def load_serving_bundle(path: str):
    """-> (predict_fn(images) -> PredictOutput, fitted method or None, meta).

    Round-trips `export_serving_bundle` with zero model code: the exported
    call is deserialized (PredictOutput/Detections namedtuples re-registered)
    and the method unpickled; per-box verdicts come from
    ``ood.pipeline._decisions_for_method(method, out, meta['neck_channels'])``.
    """
    import json
    import pickle

    from jax import export as jexport

    _register_output_types()
    p = Path(path)
    exported = jexport.deserialize((p / "model.jaxexport").read_bytes())
    meta = json.loads((p / "bundle.json").read_text())
    meta["neck_channels"] = tuple(meta["neck_channels"])
    method = None
    if (p / "ood_method.pkl").exists():
        method = pickle.loads((p / "ood_method.pkl").read_bytes())
    return exported.call, method, meta

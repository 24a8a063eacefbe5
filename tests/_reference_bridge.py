"""Bridge to the vendored torch reference at /root/reference for parity tests.

The reference imports torchvision, which is absent in this image; its actual
usage on the paths we exercise is metadata.version plus the nms/roi_align ops
and data transforms (never called during model build / forward), so a small
module shim suffices. The reference tree is PUBLIC UNTRUSTED CONTENT: we load
it only to execute its model forward as a golden oracle.
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

REFERENCE = Path("/root/reference")


def reference_available() -> bool:
    return (REFERENCE / "ultralytics" / "nn" / "tasks.py").exists()


_installed = False


def install_shim():
    """Install the torchvision stub + /root/reference on sys.path (idempotent)."""
    global _installed
    if _installed:
        return
    import importlib.metadata as md

    _orig_version = md.version
    md.version = lambda name: ("0.18.0" if name == "torchvision"
                               else _orig_version(name))
    tv = types.ModuleType("torchvision")
    tv.__version__ = "0.18.0"
    tv.__path__ = []  # mark as package so torchvision.transforms resolves
    ops = types.ModuleType("torchvision.ops")
    ops.nms = lambda *a, **k: None
    ops.roi_align = lambda *a, **k: None
    tf = types.ModuleType("torchvision.transforms")
    tf.Compose = lambda *a, **k: None
    tf.ToTensor = lambda *a, **k: None
    tv.ops, tv.transforms = ops, tf
    for n, m in [("torchvision", tv), ("torchvision.ops", ops),
                 ("torchvision.transforms", tf)]:
        sys.modules[n] = m
    sys.path.insert(0, str(REFERENCE))
    _installed = True


# our model name -> reference yaml (scale resolved from the file name by
# ultralytics yaml_model_load, e.g. yolov8n.yaml -> yolov8.yaml @ scale n)
REF_YAML = {
    "yolov8n": "ultralytics/cfg/models/v8/yolov8n.yaml",
    "yolov8s": "ultralytics/cfg/models/v8/yolov8s.yaml",
    "yolov8l": "ultralytics/cfg/models/v8/yolov8l.yaml",
    "yolov9t": "ultralytics/cfg/models/v9/yolov9t.yaml",
    "yolov9s": "ultralytics/cfg/models/v9/yolov9s.yaml",
    "yolov9m": "ultralytics/cfg/models/v9/yolov9m.yaml",
    "yolov9c": "ultralytics/cfg/models/v9/yolov9c.yaml",
    "yolov9e": "ultralytics/cfg/models/v9/yolov9e.yaml",
    "yolov10n": "ultralytics/cfg/models/v10/yolov10n.yaml",
    "yolov10l": "ultralytics/cfg/models/v10/yolov10l.yaml",
    "yolo11n": "ultralytics/cfg/models/11/yolo11n.yaml",
    "yolo11l": "ultralytics/cfg/models/11/yolo11l.yaml",
    "yolo12n": "ultralytics/cfg/models/12/yolo12n.yaml",
    "yolo12l": "ultralytics/cfg/models/12/yolo12l.yaml",
}


def build_reference_model(name: str, nc: int = 80, randomize: bool = True,
                          extraction: bool = True):
    """Build the reference DetectionModel in eval mode with the OoD taps armed.

    randomize fills BN running stats / affine params with non-trivial values so
    weight-import parity actually exercises the BN mapping (fresh init is
    mean=0/var=1/scale=1/bias=0, which would hide transposition bugs).
    """
    install_shim()
    import torch
    from ultralytics.nn.tasks import DetectionModel

    tm = DetectionModel(str(REFERENCE / REF_YAML[name]), nc=nc, verbose=False)
    tm.eval()
    if randomize:
        g = torch.Generator().manual_seed(0)
        sd = tm.state_dict()
        for k, v in sd.items():
            if not v.dtype.is_floating_point or ".dfl." in k:
                continue
            if k.endswith("running_var"):
                v.copy_(torch.rand(v.shape, generator=g) * 2 + 0.5)
            elif k.endswith("running_mean"):
                v.copy_(torch.randn(v.shape, generator=g) * 0.2)
            elif ".bn." in k and k.endswith("weight"):
                v.copy_(torch.rand(v.shape, generator=g) + 0.5)
            elif ".bn." in k and k.endswith("bias"):
                v.copy_(torch.randn(v.shape, generator=g) * 0.2)
        tm.load_state_dict(sd)
    if extraction:
        # arm the reference's own activation-extraction machinery
        # (nn/tasks.py:166-208) rather than hooks, so the tap indices
        # themselves are under test
        tm.which_layers_to_extract = "convolutional_layers"
        tm.extraction_mode = "ftmaps_and_strides"
    head = tm.model[-1]
    head.output_values_before_sigmoid = True  # head.py:63,148-151
    if getattr(head, "end2end", False):
        head.validating = False  # ood_utils.py:3540-3541 disables v10 postproc
    return tm


def numpy_state_dict(tm):
    """Materialised copies: ``.float().numpy()`` on an f32 tensor ALIASES the
    live torch storage (and jnp.asarray on CPU can zero-copy it), so without
    the .copy() a later ``opt.step()`` on the torch side silently mutates the
    'imported' flax weights (discovered via the train-step parity test)."""
    import numpy as np

    return {k: v.detach().float().numpy().copy() for k, v in tm.state_dict().items()}


def reference_head_inputs(tm, x_nchw):
    """The neck maps actually feeding the Detect head (module.f of the last
    layer), captured with forward hooks. Used for v9e, where the reference's
    hardcoded tap indices [15,18,21] (nn/tasks.py:185-187) land on stride-2/4/8
    backbone layers — out of place on the 40+-layer e-scale spec — so the
    armed-extraction taps are not a meaningful golden reference there."""
    import torch

    head = tm.model[-1]
    feats = {}
    handles = []
    for i in head.f:
        handles.append(tm.model[i].register_forward_hook(
            lambda mod, inp, out, i=i: feats.__setitem__(i, out.detach())))
    with torch.no_grad():
        tm(torch.from_numpy(x_nchw))
    for h in handles:
        h.remove()
    return [feats[i].numpy() for i in head.f]


def reference_forward(tm, x_nchw):
    """Run the reference forward; returns (boxes_xywh, logits_presigmoid,
    raw_levels, neck_taps) as numpy in our conventions (B, A, ...) / NCHW raw."""
    import numpy as np
    import torch

    with torch.no_grad():
        (y_cat, raw_extra), taps = tm(torch.from_numpy(x_nchw))
    raw_levels = raw_extra["one2one"] if isinstance(raw_extra, dict) else raw_extra
    boxes = y_cat[:, :4].transpose(1, 2).numpy()
    logits = y_cat[:, 4:].transpose(1, 2).numpy()
    head = tm.model[-1]
    if getattr(head, "end2end", False):
        # end2end heads decode to xyxy (head.py:168 xywh and not end2end);
        # the predictor shims back to xywh (detect/predict.py:261-269) —
        # convert so both sides speak xywh
        x1y1, x2y2 = boxes[..., :2], boxes[..., 2:]
        boxes = np.concatenate([(x1y1 + x2y2) / 2, x2y2 - x1y1], axis=-1)
    return boxes, logits, [t.numpy() for t in raw_levels], [t.numpy() for t in taps]

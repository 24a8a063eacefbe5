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
    # REAL implementations from the start: `from torchvision.ops import
    # roi_align` in the reference binds at import time, so a placeholder
    # installed first would silently survive an install_full_shim upgrade
    # (caught as test-order-dependent parity failures)
    ops.nms = tv_nms
    ops.roi_align = tv_roi_align
    ops.box_iou = tv_box_iou
    tf = types.ModuleType("torchvision.transforms")
    tf.Compose = lambda *a, **k: None
    tf.ToTensor = lambda *a, **k: None
    tv.ops, tv.transforms = ops, tf
    for n, m in [("torchvision", tv), ("torchvision.ops", ops),
                 ("torchvision.transforms", tf)]:
        sys.modules[n] = m
    sys.path.insert(0, str(REFERENCE))
    _installed = True


def tv_nms(boxes, scores, iou_threshold):
    """Real torchvision.ops.nms semantics (greedy by descending score,
    suppress IoU > threshold) so the reference's non_max_suppression_old
    (utils/ops.py:348-533) is executable as a golden oracle."""
    import torch

    b = boxes.detach().cpu()
    s = scores.detach().cpu()
    order = torch.argsort(s, descending=True, stable=True)
    keep = []
    suppressed = torch.zeros(len(b), dtype=torch.bool)
    areas = (b[:, 2] - b[:, 0]).clamp(min=0) * (b[:, 3] - b[:, 1]).clamp(min=0)
    for oi in order.tolist():
        if suppressed[oi]:
            continue
        keep.append(oi)
        x1 = torch.maximum(b[oi, 0], b[:, 0])
        y1 = torch.maximum(b[oi, 1], b[:, 1])
        x2 = torch.minimum(b[oi, 2], b[:, 2])
        y2 = torch.minimum(b[oi, 3], b[:, 3])
        inter = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
        iou = inter / (areas[oi] + areas - inter).clamp(min=1e-12)
        suppressed |= iou > iou_threshold
    return torch.tensor(keep, dtype=torch.long)


def tv_box_iou(a, b):
    import torch

    a, b = a.detach().float(), b.detach().float()
    area_a = (a[:, 2] - a[:, 0]).clamp(min=0) * (a[:, 3] - a[:, 1]).clamp(min=0)
    area_b = (b[:, 2] - b[:, 0]).clamp(min=0) * (b[:, 3] - b[:, 1]).clamp(min=0)
    x1 = torch.maximum(a[:, None, 0], b[None, :, 0])
    y1 = torch.maximum(a[:, None, 1], b[None, :, 1])
    x2 = torch.minimum(a[:, None, 2], b[None, :, 2])
    y2 = torch.minimum(a[:, None, 3], b[None, :, 3])
    inter = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
    return inter / (area_a[:, None] + area_b[None, :] - inter).clamp(min=1e-12)


def _bilinear(ft, y, x):
    """torchvision ROIAlign bilinear_interpolate (C++ ROIAlign_cpu):
    coordinates outside (-1, size) contribute 0, else clamped to borders."""
    import numpy as np

    C, H, W = ft.shape
    if y < -1.0 or y > H or x < -1.0 or x > W:
        return np.zeros(C, ft.dtype)
    y = min(max(y, 0.0), H - 1)
    x = min(max(x, 0.0), W - 1)
    y0, x0 = int(y), int(x)
    y1, x1 = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
    ly, lx = y - y0, x - x0
    hy, hx = 1 - ly, 1 - lx
    return (ft[:, y0, x0] * hy * hx + ft[:, y0, x1] * hy * lx
            + ft[:, y1, x0] * ly * hx + ft[:, y1, x1] * ly * lx)


def tv_roi_align(input, boxes, output_size, spatial_scale=1.0,
                 sampling_ratio=-1, aligned=False):
    """Pure-NumPy reimplementation of torchvision.ops.roi_align (the
    documented CPU algorithm), accepting (K,5) rois or a per-image list.
    Slow but an independent golden oracle for tests."""
    import math

    import numpy as np
    import torch

    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    if isinstance(boxes, (list, tuple)):
        rois = torch.cat([
            torch.cat([torch.full((len(b), 1), i, dtype=b.dtype), b], dim=1)
            for i, b in enumerate(boxes)], dim=0)
    else:
        rois = boxes
    x = input.detach().cpu().numpy()
    r = rois.detach().cpu().numpy()
    ph, pw = output_size
    K, C = len(r), x.shape[1]
    out = np.zeros((K, C, ph, pw), x.dtype)
    off = 0.5 if aligned else 0.0
    for k in range(K):
        bi = int(r[k, 0])
        sx = r[k, 1] * spatial_scale - off
        sy = r[k, 2] * spatial_scale - off
        ex = r[k, 3] * spatial_scale - off
        ey = r[k, 4] * spatial_scale - off
        rw, rh = ex - sx, ey - sy
        if not aligned:
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bw, bh = rw / pw, rh / ph
        gx = sampling_ratio if sampling_ratio > 0 else int(math.ceil(rw / pw))
        gy = sampling_ratio if sampling_ratio > 0 else int(math.ceil(rh / ph))
        gx, gy = max(gx, 1), max(gy, 1)
        for py in range(ph):
            for px in range(pw):
                acc = np.zeros(C, x.dtype)
                for iy in range(gy):
                    yy = sy + py * bh + (iy + 0.5) * bh / gy
                    for ix in range(gx):
                        xx = sx + px * bw + (ix + 0.5) * bw / gx
                        acc += _bilinear(x[bi], yy, xx)
                out[k, :, py, px] = acc / (gx * gy)
    return torch.from_numpy(out)


def install_full_shim():
    """install_shim + REAL torchvision op stand-ins + stub modules so the
    reference's research layer (ood_utils, cluster_utils, predict postprocess,
    OWOD protocol) is importable and executable as a golden oracle."""
    import types

    install_shim()
    tv = sys.modules["torchvision"]
    tv.ops.nms = tv_nms
    tv.ops.box_iou = tv_box_iou
    tv.ops.roi_align = tv_roi_align
    tvu = types.ModuleType("torchvision.utils")
    tvu.draw_bounding_boxes = lambda *a, **k: None
    tv.utils = tvu
    sys.modules["torchvision.utils"] = tvu

    def _stub(name, attrs=()):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        m.__path__ = []
        for a in attrs:
            setattr(m, a, lambda *args, **kw: (_ for _ in ()).throw(
                NotImplementedError(f"{name}.{a} stub called")))
        sys.modules[name] = m
        return m

    # the reference's custom_hyperparams uses `x: T = T()` mutable dataclass
    # defaults, rejected by Python >= 3.11 — load a default_factory-patched
    # copy into sys.modules before anything imports it
    if "custom_hyperparams" not in sys.modules:
        import re
        import types as _t

        src = (REFERENCE / "custom_hyperparams.py").read_text()
        src = "import dataclasses as _dc\n" + re.sub(
            r"^(\s+)(\w+): *(\w+) *= *\3\(\)",
            r"\1\2: \3 = _dc.field(default_factory=\3)", src, flags=re.M)
        mod = _t.ModuleType("custom_hyperparams")
        mod.__file__ = str(REFERENCE / "custom_hyperparams.py")
        sys.modules["custom_hyperparams"] = mod  # dataclasses resolves
        try:                                     # cls.__module__ during exec
            exec(compile(src, mod.__file__, "exec"), mod.__dict__)
        except Exception:
            del sys.modules["custom_hyperparams"]
            raise

    hdb = _stub("hdbscan", ["HDBSCAN"])
    hdb.validity = _stub("hdbscan.validity", ["validity_index"])
    sk = _stub("skimage")
    sk.filters = _stub("skimage.filters",
                       ["threshold_otsu", "threshold_multiotsu", "threshold_local"])
    sk.measure = _stub("skimage.measure", ["label", "regionprops"])
    sk.io = _stub("skimage.io", ["imread", "imsave"])
    sk.color = _stub("skimage.color", ["rgb2gray"])
    sk.transform = _stub("skimage.transform", ["resize"])
    umap = _stub("umap", ["UMAP"])

    # REAL stand-ins for the three skimage calls on the reference's EUL path
    # (unknown_localization_utils.py:31-32,183) so that path is executable as
    # a golden oracle: our threshold_otsu implements the same 256-bin
    # inter-class-variance definition skimage does, and skimage.measure.label
    # defaults to full connectivity (= 8-connected for 2D) which
    # scipy.ndimage.label reproduces with a ones((3,3)) structure;
    # regionprops is needed only for .bbox = (minr, minc, maxr, maxc).
    import numpy as np
    from scipy import ndimage as _ndi

    from ood_in_object_detection_tpu.ood.unknown import threshold_otsu as _otsu

    sk.filters.threshold_otsu = lambda image: _otsu(np.asarray(image))

    def _sk_label(mask):
        lab, _ = _ndi.label(np.asarray(mask), structure=np.ones((3, 3), int))
        return lab

    class _Region:
        __slots__ = ("bbox",)

        def __init__(self, bbox):
            self.bbox = bbox

    def _sk_regionprops(lab):
        out = []
        for sl in _ndi.find_objects(np.asarray(lab)):
            if sl is None:
                continue
            out.append(_Region((sl[0].start, sl[1].start, sl[0].stop, sl[1].stop)))
        return out

    sk.measure.label = _sk_label
    sk.measure.regionprops = _sk_regionprops
    del hdb, sk, umap


def install_cli_shim():
    """install_full_shim + what `import ood_evaluation` additionally needs:
    a `tap.Tap` stub (typed-argument-parser absent; only the class statement
    `class SimpleArgumentParser(Tap)` must resolve — it is never instantiated
    in cross-execution) and torchvision.ops.box_convert (used by
    OODMethod.create_targets_dict, ood_utils.py:226)."""
    install_full_shim()
    if "tap" not in sys.modules:
        tap = types.ModuleType("tap")

        class Tap:  # noqa: D401 - import-time base class only
            pass

        tap.Tap = Tap
        sys.modules["tap"] = tap

    def box_convert(boxes, in_fmt, out_fmt):
        import torch

        assert (in_fmt, out_fmt) == ("cxcywh", "xyxy"), (in_fmt, out_fmt)
        cx, cy, w, h = boxes.unbind(-1)
        return torch.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)

    sys.modules["torchvision.ops"].box_convert = box_convert


class ReferenceLoader:
    """Minimal stand-in for the reference's InfiniteDataLoader: yields the
    ultralytics batch dict (img uint8 NCHW, batch_idx/cls/bboxes flattened,
    resized_shape) the OODMethod iterate_* loops consume (ood_utils.py:294,
    428). Images must already be exactly (size, size) so the letterbox is the
    identity on both frameworks and pixels match bit-exactly."""

    def __init__(self, im_files, size, names, number_of_classes, yaml_name="ds"):
        import torch

        self.batch_size = None  # set by batched()
        self.size = size
        self.im_files = sorted(im_files)
        self.dataset = types.SimpleNamespace(
            data={"names": dict(enumerate(names)), "yaml_file": f"{yaml_name}.yaml"},
            number_of_classes=number_of_classes,
        )
        self._torch = torch

    def _load(self, f):
        import numpy as np
        from PIL import Image

        with Image.open(f) as im:
            arr = np.asarray(im.convert("RGB"))
        assert arr.shape == (self.size, self.size, 3), \
            f"{f}: {arr.shape} != square {self.size} (letterbox must be identity)"
        lp = Path(f).with_suffix(".txt")
        lp = Path(str(lp).replace("/images/", "/labels/"))
        rows = np.loadtxt(lp, ndmin=2) if lp.exists() and lp.read_text().strip() \
            else np.empty((0, 5))
        return arr, rows

    def batched(self, batch_size):
        self.batch_size = batch_size
        return self

    def __len__(self):
        return (len(self.im_files) + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        import numpy as np
        torch = self._torch

        bs = self.batch_size
        for s in range(0, len(self.im_files), bs):
            files = self.im_files[s:s + bs]
            imgs, bidx, cls, bb = [], [], [], []
            for j, f in enumerate(files):
                arr, rows = self._load(f)
                imgs.append(torch.from_numpy(arr.transpose(2, 0, 1).copy()))
                bidx.extend([j] * len(rows))
                cls.extend(rows[:, 0].tolist())
                bb.extend(rows[:, 1:5].tolist())
            yield {
                "img": torch.stack(imgs),
                "im_file": list(files),
                "batch_idx": torch.tensor(bidx, dtype=torch.float32),
                "cls": torch.tensor(np.asarray(cls, np.float32)).view(-1, 1),
                "bboxes": torch.tensor(
                    np.asarray(bb, np.float32).reshape(-1, 4)),
                "resized_shape": [(self.size, self.size)] * len(files),
                "ori_shape": [(self.size, self.size)] * len(files),
                # identity letterbox: ratio 1, pad 0 (the EUL driver reads
                # data['ratio_pad'][i][1] for pad-restore, ood_utils.py:695)
                "ratio_pad": [((1.0, 1.0), (0.0, 0.0))] * len(files),
            }


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


def build_reference_yolo(name: str, tm, tmp_dir, nc: int):
    """Wrap a bridge-built DetectionModel in the reference's YOLO front-end so
    its own `model.predict` (modified DetectionPredictor postprocess,
    models/yolo/detect/predict.py:118-300) is executable end-to-end. The yaml
    is copied to a tmp file with the right `nc` (scale still resolves from the
    file name); ckpt/ckpt_path are filled with what the research layer reads
    (define_paths_of_activations..., ood_evaluation.py:296; configure_extra_
    output_of_the_model's "yolov10" check, ood_utils.py:3540)."""
    install_cli_shim()
    from ultralytics import YOLO

    ref_yaml = REFERENCE / REF_YAML[name]
    if not ref_yaml.exists():
        # scale-suffixed names (yolov8n.yaml) resolve to the base file with
        # the scale re-derived from the file name (ultralytics yaml_model_load)
        base = ref_yaml.name.replace(".yaml", "")[:-1] + ".yaml"
        ref_yaml = ref_yaml.with_name(base)
    src = ref_yaml.read_text()
    yaml_path = Path(tmp_dir) / Path(REF_YAML[name]).name
    import re

    yaml_path.write_text(re.sub(r"^nc:\s*\d+", f"nc: {nc}", src, flags=re.M))
    ym = YOLO(str(yaml_path), task="detect")
    ym.model.load_state_dict(tm.state_dict())
    ym.model.eval()
    ym.ckpt = {"train_args": {"name": f"{name}_cliparity"}}
    ym.ckpt_path = f"{name}_cliparity"
    return ym


def tweak_head_for_realistic_outputs(tm, seed: int = 3):
    """Reshape a randomized fresh-init model's head so its outputs look like a
    trained detector's: cls sigmoid scores spread over (0.01, 0.9) instead of
    saturating, and DFL bin logits decaying with distance so decoded boxes are
    small and spatially varied rather than all-anchors-whole-image. Keeps
    composition-parity scenarios (matching, percentiles, NMS) off pathological
    all-ties inputs. Must be applied identically before exporting weights to
    either framework."""
    import torch

    g = torch.Generator().manual_seed(seed)
    head = tm.model[-1]
    with torch.no_grad():
        for seq in head.cv3:  # cls branch
            seq[-1].weight.mul_(0.12)
            seq[-1].bias.copy_(
                torch.randn(seq[-1].bias.shape, generator=g) * 1.2 - 1.8)
        for seq in head.cv2:  # box branch (4 * reg_max DFL logits)
            seq[-1].weight.mul_(0.6)
            b = (-torch.arange(16, dtype=torch.float32) * 0.7).repeat(4)
            b += torch.randn(b.shape, generator=g) * 0.4
            seq[-1].bias.copy_(b)
    return tm


def train_reference_briefly(tm, loader, steps=150, lr=2e-3, seed=0):
    """Train the torch reference model on a ReferenceLoader just enough that
    its outputs look like a real detector's (spread confidences, boxes on
    objects): composition-parity scenarios need non-degenerate, tie-free
    scores, not a good model. Uses the vendored reference loss
    (ultralytics v8DetectionLoss); the optimizer is plain Adam because the
    optimizer is NOT under test here — reference-exact 3-group SGD parity
    lives in test_reference_parity.py::test_train_step_parity."""
    import torch
    from types import SimpleNamespace

    from ultralytics.utils.loss import v8DetectionLoss

    torch.manual_seed(seed)
    tm.train()
    tm.args = SimpleNamespace(box=7.5, cls=0.5, dfl=1.5)
    crit = v8DetectionLoss(tm)
    opt = torch.optim.Adam(tm.parameters(), lr=lr)
    done = 0
    while done < steps:
        for batch in loader:
            if done >= steps:
                break
            loss, _ = crit(tm(batch["img"].float() / 255), batch)
            opt.zero_grad()
            loss.sum().backward()
            opt.step()
            done += 1
    tm.eval()
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

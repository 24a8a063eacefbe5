"""YOLO detector family (v8/v9/v10/v11/v12, sizes n..x) as static Flax graphs.

The reference drives a dynamic graph executor from YAML specs
(ultralytics/nn/tasks.py:96-229 ``parse_model`` + save-list routing). Here the
same layer specs are *data* interpreted once at trace time into a single
static Flax module, so XLA sees one fused graph — no per-layer Python dispatch
at run time (reference hot loop: tasks.py:170-175).

The forward pass declares every OoD tap as an output:
``(raw_head_levels, neck_feats)`` where ``neck_feats`` are the three PAN
outputs feeding the head — exactly the feature maps the reference deep-copies
out of the layer loop at version-specific indices (tasks.py:179-194;
yolo12:[14,17,20], v8/v9:[15,18,21], v10/yolo11:[16,19,22]).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import layers as L
from .head import DetectHead, decode_detections


def make_divisible(x: float, divisor: int = 8) -> int:
    return int(math.ceil(x / divisor) * divisor)


# (from, repeats, module, args) — args follow the reference YAML conventions
# (ultralytics/cfg/models/*). "Detect" terminates the spec; its `from` lists
# the neck taps that are also returned as OoD feature maps.
SPEC_V8 = [
    (-1, 1, "Conv", [64, 3, 2]),
    (-1, 1, "Conv", [128, 3, 2]),
    (-1, 3, "C2f", [128, True]),
    (-1, 1, "Conv", [256, 3, 2]),
    (-1, 6, "C2f", [256, True]),
    (-1, 1, "Conv", [512, 3, 2]),
    (-1, 6, "C2f", [512, True]),
    (-1, 1, "Conv", [1024, 3, 2]),
    (-1, 3, "C2f", [1024, True]),
    (-1, 1, "SPPF", [1024, 5]),
    (-1, 1, "Upsample", []),
    ([-1, 6], 1, "Concat", []),
    (-1, 3, "C2f", [512]),
    (-1, 1, "Upsample", []),
    ([-1, 4], 1, "Concat", []),
    (-1, 3, "C2f", [256]),  # 15 P3
    (-1, 1, "Conv", [256, 3, 2]),
    ([-1, 12], 1, "Concat", []),
    (-1, 3, "C2f", [512]),  # 18 P4
    (-1, 1, "Conv", [512, 3, 2]),
    ([-1, 9], 1, "Concat", []),
    (-1, 3, "C2f", [1024]),  # 21 P5
    ([15, 18, 21], 1, "Detect", []),
]

SPEC_V9C = [
    (-1, 1, "Conv", [64, 3, 2]),
    (-1, 1, "Conv", [128, 3, 2]),
    (-1, 1, "RepNCSPELAN4", [256, 128, 64, 1]),
    (-1, 1, "ADown", [256]),
    (-1, 1, "RepNCSPELAN4", [512, 256, 128, 1]),
    (-1, 1, "ADown", [512]),
    (-1, 1, "RepNCSPELAN4", [512, 512, 256, 1]),
    (-1, 1, "ADown", [512]),
    (-1, 1, "RepNCSPELAN4", [512, 512, 256, 1]),
    (-1, 1, "SPPELAN", [512, 256]),
    (-1, 1, "Upsample", []),
    ([-1, 6], 1, "Concat", []),
    (-1, 1, "RepNCSPELAN4", [512, 512, 256, 1]),
    (-1, 1, "Upsample", []),
    ([-1, 4], 1, "Concat", []),
    (-1, 1, "RepNCSPELAN4", [256, 256, 128, 1]),  # 15 P3
    (-1, 1, "ADown", [256]),
    ([-1, 12], 1, "Concat", []),
    (-1, 1, "RepNCSPELAN4", [512, 512, 256, 1]),  # 18 P4
    (-1, 1, "ADown", [512]),
    ([-1, 9], 1, "Concat", []),
    (-1, 1, "RepNCSPELAN4", [512, 512, 256, 1]),  # 21 P5
    ([15, 18, 21], 1, "Detect", []),
]

SPEC_V10L = [
    (-1, 1, "Conv", [64, 3, 2]),
    (-1, 1, "Conv", [128, 3, 2]),
    (-1, 3, "C2f", [128, True]),
    (-1, 1, "Conv", [256, 3, 2]),
    (-1, 6, "C2f", [256, True]),
    (-1, 1, "SCDown", [512, 3, 2]),
    (-1, 6, "C2f", [512, True]),
    (-1, 1, "SCDown", [1024, 3, 2]),
    (-1, 3, "C2fCIB", [1024, True]),
    (-1, 1, "SPPF", [1024, 5]),
    (-1, 1, "PSA", [1024]),
    (-1, 1, "Upsample", []),
    ([-1, 6], 1, "Concat", []),
    (-1, 3, "C2fCIB", [512, True]),
    (-1, 1, "Upsample", []),
    ([-1, 4], 1, "Concat", []),
    (-1, 3, "C2f", [256]),  # 16 P3
    (-1, 1, "Conv", [256, 3, 2]),
    ([-1, 13], 1, "Concat", []),
    (-1, 3, "C2fCIB", [512, True]),  # 19 P4
    (-1, 1, "SCDown", [512, 3, 2]),
    ([-1, 10], 1, "Concat", []),
    (-1, 3, "C2fCIB", [1024, True]),  # 22 P5
    ([16, 19, 22], 1, "Detect", []),
]

SPEC_V11 = [
    (-1, 1, "Conv", [64, 3, 2]),
    (-1, 1, "Conv", [128, 3, 2]),
    (-1, 2, "C3k2", [256, False, 0.25]),
    (-1, 1, "Conv", [256, 3, 2]),
    (-1, 2, "C3k2", [512, False, 0.25]),
    (-1, 1, "Conv", [512, 3, 2]),
    (-1, 2, "C3k2", [512, True]),
    (-1, 1, "Conv", [1024, 3, 2]),
    (-1, 2, "C3k2", [1024, True]),
    (-1, 1, "SPPF", [1024, 5]),
    (-1, 2, "C2PSA", [1024]),
    (-1, 1, "Upsample", []),
    ([-1, 6], 1, "Concat", []),
    (-1, 2, "C3k2", [512, False]),
    (-1, 1, "Upsample", []),
    ([-1, 4], 1, "Concat", []),
    (-1, 2, "C3k2", [256, False]),  # 16 P3
    (-1, 1, "Conv", [256, 3, 2]),
    ([-1, 13], 1, "Concat", []),
    (-1, 2, "C3k2", [512, False]),  # 19 P4
    (-1, 1, "Conv", [512, 3, 2]),
    ([-1, 10], 1, "Concat", []),
    (-1, 2, "C3k2", [1024, True]),  # 22 P5
    ([16, 19, 22], 1, "Detect", []),
]

SPEC_V12 = [
    (-1, 1, "Conv", [64, 3, 2]),
    (-1, 1, "Conv", [128, 3, 2]),
    (-1, 2, "C3k2", [256, False, 0.25]),
    (-1, 1, "Conv", [256, 3, 2]),
    (-1, 2, "C3k2", [512, False, 0.25]),
    (-1, 1, "Conv", [512, 3, 2]),
    (-1, 4, "A2C2f", [512, True, 4]),
    (-1, 1, "Conv", [1024, 3, 2]),
    (-1, 4, "A2C2f", [1024, True, 1]),
    (-1, 1, "Upsample", []),
    ([-1, 6], 1, "Concat", []),
    (-1, 2, "A2C2f", [512, False, -1]),
    (-1, 1, "Upsample", []),
    ([-1, 4], 1, "Concat", []),
    (-1, 2, "A2C2f", [256, False, -1]),  # 14 P3
    (-1, 1, "Conv", [256, 3, 2]),
    ([-1, 11], 1, "Concat", []),
    (-1, 2, "A2C2f", [512, False, -1]),  # 17 P4
    (-1, 1, "Conv", [512, 3, 2]),
    ([-1, 8], 1, "Concat", []),
    (-1, 2, "C3k2", [1024, True]),  # 20 P5
    ([14, 17, 20], 1, "Detect", []),
]

def _spec_v9_gelan(widths, elan1_first: bool, rep_n: int):
    """GELAN spec template for yolov9 t/s/m (reference cfg/models/v9/*.yaml).
    widths = per-slot channel table (stem0, stem1, b2(c2,c3,c4), p3, b4, p4,
    b6, p5, b8, sppelan, head blocks ...)."""
    w = widths
    first = ("ELAN1", [w["b2"][0], w["b2"][1], w["b2"][2]]) if elan1_first else \
        ("RepNCSPELAN4", [w["b2"][0], w["b2"][1], w["b2"][2], rep_n])
    return [
        (-1, 1, "Conv", [w["s0"], 3, 2]),
        (-1, 1, "Conv", [w["s1"], 3, 2]),
        (-1, 1, first[0], first[1]),
        (-1, 1, "AConv", [w["p3"]]),
        (-1, 1, "RepNCSPELAN4", [w["b4"][0], w["b4"][1], w["b4"][2], rep_n]),
        (-1, 1, "AConv", [w["p4"]]),
        (-1, 1, "RepNCSPELAN4", [w["b6"][0], w["b6"][1], w["b6"][2], rep_n]),
        (-1, 1, "AConv", [w["p5"]]),
        (-1, 1, "RepNCSPELAN4", [w["b8"][0], w["b8"][1], w["b8"][2], rep_n]),
        (-1, 1, "SPPELAN", [w["spp"][0], w["spp"][1]]),
        (-1, 1, "Upsample", []),
        ([-1, 6], 1, "Concat", []),
        (-1, 1, "RepNCSPELAN4", [w["b6"][0], w["b6"][1], w["b6"][2], rep_n]),
        (-1, 1, "Upsample", []),
        ([-1, 4], 1, "Concat", []),
        (-1, 1, "RepNCSPELAN4", [w["b4"][0], w["b4"][1], w["b4"][2], rep_n]),
        (-1, 1, "AConv", [w["b6"][2]]),
        ([-1, 12], 1, "Concat", []),
        (-1, 1, "RepNCSPELAN4", [w["b6"][0], w["b6"][1], w["b6"][2], rep_n]),
        (-1, 1, "AConv", [w["b8"][2]]),
        ([-1, 9], 1, "Concat", []),
        (-1, 1, "RepNCSPELAN4", [w["b8"][0], w["b8"][1], w["b8"][2], rep_n]),
        ([15, 18, 21], 1, "Detect", []),
    ]


SPEC_V9T = _spec_v9_gelan(
    dict(s0=16, s1=32, b2=(32, 32, 16), p3=64, b4=(64, 64, 32), p4=96,
         b6=(96, 96, 48), p5=128, b8=(128, 128, 64), spp=(128, 64)),
    elan1_first=True, rep_n=3)
SPEC_V9S = _spec_v9_gelan(
    dict(s0=32, s1=64, b2=(64, 64, 32), p3=128, b4=(128, 128, 64), p4=192,
         b6=(192, 192, 96), p5=256, b8=(256, 256, 128), spp=(256, 128)),
    elan1_first=True, rep_n=3)
SPEC_V9M = _spec_v9_gelan(
    dict(s0=32, s1=64, b2=(128, 128, 64), p3=240, b4=(240, 240, 120), p4=360,
         b6=(360, 360, 180), p5=480, b8=(480, 480, 240), spp=(480, 240)),
    elan1_first=False, rep_n=1)


SPEC_V9E = [
    (-1, 1, "Identity", []),
    (-1, 1, "Conv", [64, 3, 2]),
    (-1, 1, "Conv", [128, 3, 2]),
    (-1, 1, "RepNCSPELAN4", [256, 128, 64, 2]),
    (-1, 1, "ADown", [256]),
    (-1, 1, "RepNCSPELAN4", [512, 256, 128, 2]),
    (-1, 1, "ADown", [512]),
    (-1, 1, "RepNCSPELAN4", [1024, 512, 256, 2]),
    (-1, 1, "ADown", [1024]),
    (-1, 1, "RepNCSPELAN4", [1024, 512, 256, 2]),
    (1, 1, "CBLinear", [[64]]),
    (3, 1, "CBLinear", [[64, 128]]),
    (5, 1, "CBLinear", [[64, 128, 256]]),
    (7, 1, "CBLinear", [[64, 128, 256, 512]]),
    (9, 1, "CBLinear", [[64, 128, 256, 512, 1024]]),
    (0, 1, "Conv", [64, 3, 2]),
    ([10, 11, 12, 13, 14, -1], 1, "CBFuse", [[0, 0, 0, 0, 0]]),
    (-1, 1, "Conv", [128, 3, 2]),
    ([11, 12, 13, 14, -1], 1, "CBFuse", [[1, 1, 1, 1]]),
    (-1, 1, "RepNCSPELAN4", [256, 128, 64, 2]),
    (-1, 1, "ADown", [256]),
    ([12, 13, 14, -1], 1, "CBFuse", [[2, 2, 2]]),
    (-1, 1, "RepNCSPELAN4", [512, 256, 128, 2]),
    (-1, 1, "ADown", [512]),
    ([13, 14, -1], 1, "CBFuse", [[3, 3]]),
    (-1, 1, "RepNCSPELAN4", [1024, 512, 256, 2]),
    (-1, 1, "ADown", [1024]),
    ([14, -1], 1, "CBFuse", [[4]]),
    (-1, 1, "RepNCSPELAN4", [1024, 512, 256, 2]),
    (-1, 1, "SPPELAN", [512, 256]),
    (-1, 1, "Upsample", []),
    ([-1, 25], 1, "Concat", []),
    (-1, 1, "RepNCSPELAN4", [512, 512, 256, 2]),
    (-1, 1, "Upsample", []),
    ([-1, 22], 1, "Concat", []),
    (-1, 1, "RepNCSPELAN4", [256, 256, 128, 2]),  # 35 P3
    (-1, 1, "ADown", [256]),
    ([-1, 32], 1, "Concat", []),
    (-1, 1, "RepNCSPELAN4", [512, 512, 256, 2]),  # 38 P4
    (-1, 1, "ADown", [512]),
    ([-1, 29], 1, "Concat", []),
    (-1, 1, "RepNCSPELAN4", [512, 1024, 512, 2]),  # 41 P5
    ([35, 38, 41], 1, "Detect", []),
]


def _spec_v10(scale: str):
    """v10 spec per scale: scales differ only in which blocks are C2fCIB and
    the long-kernel flag (reference cfg/models/v10/yolov10{n,s,m,b,l,x}.yaml)."""
    cib = {
        "n": {8: (False, False), 13: (False, False), 19: (False, False), 22: (True, True)},
        "s": {8: (True, True), 13: (False, False), 19: (False, False), 22: (True, True)},
        "m": {8: (True, False), 13: (False, False), 19: (True, False), 22: (True, False)},
        "b": {8: (True, False), 13: (True, False), 19: (True, False), 22: (True, False)},
        "l": {8: (True, False), 13: (True, False), 19: (True, False), 22: (True, False)},
        "x": {6: (True, False), 8: (True, False), 13: (True, False), 19: (True, False), 22: (True, False)},
    }[scale]

    def blk(idx, c, shortcut=True):
        use_cib, lk = cib.get(idx, (False, False))
        if use_cib:
            return ("C2fCIB", [c, True, lk])
        return ("C2f", [c] + ([True] if shortcut else []))

    b6 = blk(6, 512)
    b8 = blk(8, 1024)
    b13 = blk(13, 512, shortcut=cib.get(13, (False,))[0])
    b19 = blk(19, 512, shortcut=cib.get(19, (False,))[0])
    b22 = blk(22, 1024)
    return [
        (-1, 1, "Conv", [64, 3, 2]),
        (-1, 1, "Conv", [128, 3, 2]),
        (-1, 3, "C2f", [128, True]),
        (-1, 1, "Conv", [256, 3, 2]),
        (-1, 6, "C2f", [256, True]),
        (-1, 1, "SCDown", [512, 3, 2]),
        (-1, 6, b6[0], b6[1]),
        (-1, 1, "SCDown", [1024, 3, 2]),
        (-1, 3, b8[0], b8[1]),
        (-1, 1, "SPPF", [1024, 5]),
        (-1, 1, "PSA", [1024]),
        (-1, 1, "Upsample", []),
        ([-1, 6], 1, "Concat", []),
        (-1, 3, b13[0], b13[1]),
        (-1, 1, "Upsample", []),
        ([-1, 4], 1, "Concat", []),
        (-1, 3, "C2f", [256]),
        (-1, 1, "Conv", [256, 3, 2]),
        ([-1, 13], 1, "Concat", []),
        (-1, 3, b19[0], b19[1]),
        (-1, 1, "SCDown", [512, 3, 2]),
        ([-1, 10], 1, "Concat", []),
        (-1, 3, b22[0], b22[1]),
        ([16, 19, 22], 1, "Detect", []),
    ]


# scale -> (depth, width, max_channels); reference cfg/models/*/*.yaml
SCALES = {
    "yolov8": {"n": (0.33, 0.25, 1024), "s": (0.33, 0.50, 1024), "m": (0.67, 0.75, 768),
               "l": (1.00, 1.00, 512), "x": (1.00, 1.25, 512)},
    "yolo11": {"n": (0.50, 0.25, 1024), "s": (0.50, 0.50, 1024), "m": (0.50, 1.00, 512),
               "l": (1.00, 1.00, 512), "x": (1.00, 1.50, 512)},
    "yolo12": {"n": (0.50, 0.25, 1024), "s": (0.50, 0.50, 1024), "m": (0.50, 1.00, 512),
               "l": (1.00, 1.00, 512), "x": (1.00, 1.50, 512)},
    "yolov9": {"c": (1.00, 1.00, 512)},
    "yolov10": {"l": (1.00, 1.00, 512)},
}
# per-file v9 variants (no compound scaling) and per-scale v10 specs register
# as their own spec keys with an empty size suffix
_V10_SCALES = {"n": (0.33, 0.25, 1024), "s": (0.33, 0.50, 1024),
               "m": (0.67, 0.75, 768), "b": (0.67, 1.00, 512),
               "l": (1.00, 1.00, 512), "x": (1.00, 1.25, 512)}

SPECS = {
    "yolov8": SPEC_V8,
    "yolov9t": SPEC_V9T,
    "yolov9s": SPEC_V9S,
    "yolov9m": SPEC_V9M,
    "yolov9e": SPEC_V9E,
    "yolov9": SPEC_V9C,
    "yolov10": SPEC_V10L,
    "yolo11": SPEC_V11,
    "yolo12": SPEC_V12,
}
for _s, _sc in _V10_SCALES.items():
    SPECS[f"yolov10{_s}"] = _spec_v10(_s)
for _k in ("yolov9t", "yolov9s", "yolov9m", "yolov9e"):
    SCALES[_k] = {"": (1.00, 1.00, 10 ** 9)}
for _s, _sc in _V10_SCALES.items():
    SCALES[f"yolov10{_s}"] = {"": _sc}

HEAD_STYLE = {"yolov8": "v8", "yolov9": "v8", "yolov10": "v10", "yolo11": "v11", "yolo12": "v12"}
for _k in ("yolov9t", "yolov9s", "yolov9m", "yolov9e"):
    HEAD_STYLE[_k] = "v8"
for _s in _V10_SCALES:
    HEAD_STYLE[f"yolov10{_s}"] = "v10"

# modules whose repeats column becomes the inner block count n
_REPEAT_AS_N = {"C2f", "C3k2", "C2fCIB", "C2PSA", "A2C2f"}


class YOLODetector(nn.Module):
    """A YOLO detection model assembled from a static spec.

    __call__ returns ``(raw_levels, neck_feats)``:
      raw_levels: 3x (B, H, W, 4*reg_max+nc) raw head maps
      neck_feats: 3x (B, H, W, C) PAN neck feature maps (the OoD taps)
    """

    spec: Tuple = tuple(tuple(s) for s in SPEC_V8)
    nc: int = 80
    depth: float = 1.0
    width: float = 1.0
    max_channels: int = 512
    head_style: str = "v8"
    attn_residual: bool = False  # yolo12 l/x: A2C2f residual=True, mlp_ratio=1.2
    # yolo11/12 m/l/x: every C3k2 runs with c3k=True regardless of its spec
    # arg (reference nn/tasks.py:1495-1497 flips args[3] for scale in "mlx")
    c3k_force: bool = False
    # Space-to-depth stem rewrite (exact; layers.StemConv). Off by default:
    # measured on v5e, the 640x3 f32 input relayout costs more than the
    # better-shaped conv saves (19.8 -> 22.3 ms/batch32). Revisit with a
    # uint8 on-device-normalize input path.
    s2d_stem: bool = False
    # Phase-folded stem (models/folded_stem.py): both k3/s2 stem convs exact
    # at 1/4 resolution. Inference only; measured 6.0 -> 3.85 ms/batch32 on
    # v5e for the v8n stem. Params stay identical to the unfolded layers.
    folded_stem: bool = True
    v10_dual: bool = False  # v10 end2end dual head (training parity)
    # Profiling aid: stop the forward after this layer index and return its
    # output (used by scripts/profile_segments.py for marginal-cost prefix
    # timing on hardware; -1 = full forward).
    stop_after: int = -1
    dtype: Any = jnp.float32

    def _ch(self, c: int) -> int:
        return make_divisible(min(c, self.max_channels) * self.width, 8)

    def _n(self, n: int) -> int:
        return max(round(n * self.depth), 1) if n > 1 else n

    def _can_fold_stem(self, x, train: bool) -> bool:
        if train or not self.folded_stem or len(self.spec) < 3:
            return False
        for frm, _, mod, args in self.spec[:2]:
            if mod != "Conv" or list(args[1:]) != [3, 2]:
                return False
        if x.shape[1] % 4 or x.shape[2] % 4:
            return False
        for frm, _, _, _ in self.spec[2:]:
            refs = frm if isinstance(frm, (list, tuple)) else [frm]
            if any(isinstance(r, int) and r in (0, 1) for r in refs):
                return False
        return True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        ys: List[jax.Array] = []
        dt = self.dtype
        x = x.astype(dt)
        start_li = 0
        if self._can_fold_stem(x, train):
            # inference-only phase-folded stem (models/folded_stem.py): both
            # k3/s2 stem convs recomputed exactly at 1/4 resolution; params
            # remain byte-identical to the unfolded Conv layers
            from .folded_stem import phase_folded_stem

            c1 = self._ch(self.spec[0][3][0])
            c2 = self._ch(self.spec[1][3][0])
            k1, bn1 = L.ConvBNParams(x.shape[-1], c1, name="l0_Conv")()
            k2, bn2 = L.ConvBNParams(c1, c2, name="l1_Conv")()
            folded = phase_folded_stem(x, k1, bn1, k2, bn2, dtype=dt)
            ys.extend([x, folded])  # ys[0] unused (checked by _can_fold_stem)
            x = folded
            start_li = 2
        for li, (frm, rep, mod, args) in enumerate(self.spec):
            if li < start_li:
                continue
            if mod == "Detect":
                neck_feats = [ys[i] for i in frm]
                dual = self.v10_dual and self.head_style == "v10"
                head = DetectHead(
                    nc=self.nc,
                    ch=tuple(f.shape[-1] for f in neck_feats),
                    style=self.head_style,
                    dual=dual,
                    dtype=dt,
                    name="detect",
                )
                out = head(neck_feats, train)
                if dual:
                    # v10 end2end: one2one branch is the inference path
                    # (reference head.py:100-107); one2many returned third for
                    # the dual training loss (train/loss.py v10_detection_loss)
                    raw_main, raw_o2o = out
                    return raw_o2o, neck_feats, raw_main
                return out, neck_feats

            if isinstance(frm, int):
                inp = x if frm == -1 else ys[frm]
            else:
                inp = None  # multi-input modules (Concat) index ys directly
            name = f"l{li}_{mod}"
            n = self._n(rep)
            if mod == "Conv":
                c, k, s = args
                if li == 0 and self.s2d_stem and k == 3 and s == 2 \
                        and inp.shape[1] % 2 == 0 and inp.shape[2] % 2 == 0:
                    x = L.StemConv(self._ch(c), dtype=dt, name=name)(inp, train)
                else:
                    x = L.Conv(self._ch(c), k, s, dtype=dt, name=name)(inp, train)
            elif mod == "C2f":
                c = self._ch(args[0])
                shortcut = args[1] if len(args) > 1 else False
                x = L.C2f(c, n, shortcut, dtype=dt, name=name)(inp, train)
            elif mod == "C3k2":
                c = self._ch(args[0])
                c3k = self.c3k_force or (args[1] if len(args) > 1 else False)
                e = args[2] if len(args) > 2 else 0.5
                x = L.C3k2(c, n, c3k=c3k, e=e, dtype=dt, name=name)(inp, train)
            elif mod == "A2C2f":
                c = self._ch(args[0])
                a2 = args[1] if len(args) > 1 else True
                area = args[2] if len(args) > 2 else 1
                area = 1 if area in (-1, None) else area
                residual = self.attn_residual and a2
                mlp_ratio = 1.2 if self.attn_residual else 2.0
                x = L.A2C2f(c, n, a2=a2, area=area, residual=residual, mlp_ratio=mlp_ratio,
                            dtype=dt, name=name)(inp, train)
            elif mod == "C2fCIB":
                c = self._ch(args[0])
                shortcut = args[1] if len(args) > 1 else False
                lk = args[2] if len(args) > 2 else False
                x = L.C2fCIB(c, n, shortcut=shortcut, lk=lk, dtype=dt, name=name)(inp, train)
            elif mod == "C2PSA":
                c = self._ch(args[0])
                x = L.C2PSA(c, n, dtype=dt, name=name)(inp, train)
            elif mod == "SPPF":
                c, k = args
                x = L.SPPF(self._ch(c), k, dtype=dt, name=name)(inp, train)
            elif mod == "SCDown":
                c, k, s = args
                x = L.SCDown(self._ch(c), k, s, dtype=dt, name=name)(inp, train)
            elif mod == "PSA":
                c = self._ch(args[0])
                x = L.PSA(c, dtype=dt, name=name)(inp, train)
            elif mod == "RepNCSPELAN4":
                # only args[0] is width-scaled/rounded by the reference parser
                # (nn/tasks.py parse_model: c2 = make_divisible(...), the rest
                # pass through raw — v9m's c4=180 must NOT round to 184)
                c2, c3, c4, nrep = args
                x = L.RepNCSPELAN4(self._ch(c2), c3, c4, nrep, dtype=dt, name=name)(inp, train)
            elif mod == "ADown":
                c = self._ch(args[0])
                x = L.ADown(c, dtype=dt, name=name)(inp, train)
            elif mod == "AConv":
                c = self._ch(args[0])
                x = L.AConv(c, dtype=dt, name=name)(inp, train)
            elif mod == "ELAN1":
                c2, c3, c4 = args  # c3/c4 raw (see RepNCSPELAN4 note)
                x = L.ELAN1(self._ch(c2), c3, c4,
                            dtype=dt, name=name)(inp, train)
            elif mod == "SPPELAN":
                c2, c3 = args  # c3 raw (see RepNCSPELAN4 note)
                x = L.SPPELAN(self._ch(c2), c3, dtype=dt, name=name)(inp, train)
            elif mod == "Upsample":
                x = L.upsample2x(inp)
            elif mod == "Identity":
                x = inp
            elif mod == "CBLinear":
                # 1x1 conv with bias, output split into channel chunks
                # (reference block.py CBLinear; yolov9e reversible aux branch)
                c2s = [self._ch(c) for c in args[0]]
                y = L.Conv2dRaw(sum(c2s), 1, dtype=dt, name=name)(inp)
                splits = []
                off = 0
                for c in c2s:
                    splits.append(y[..., off : off + c])
                    off += c
                x = tuple(splits)
            elif mod == "CBFuse":
                # select chunk idx[i] from each CBLinear input, nearest-resize
                # to the last input's grid, sum (reference block.py CBFuse)
                idx = args[0]
                srcs = [x if i == -1 else ys[i] for i in frm]
                tgt = srcs[-1]
                th, tw = tgt.shape[1], tgt.shape[2]
                acc = tgt
                for i2, src in enumerate(srcs[:-1]):
                    chunk = src[idx[i2]]
                    b, h, w, c = chunk.shape
                    fy, fx = th // h, tw // w
                    up = jnp.broadcast_to(
                        chunk[:, :, None, :, None, :], (b, h, fy, w, fx, c)
                    ).reshape(b, h * fy, w * fx, c)
                    acc = acc + up
                x = acc
            elif mod == "Concat":
                parts = [x if i == -1 else ys[i] for i in frm]
                x = jnp.concatenate(parts, axis=-1)
            else:
                raise ValueError(f"unknown module {mod}")
            if train:
                # remat boundary tag: under trainer remat (TrainConfig.remat,
                # jax.checkpoint policy save_only_these_names) only these
                # per-layer outputs survive the forward; block-internal
                # intermediates (C2f splits, BN/SiLU pre-activations, PSA
                # attention) are recomputed in the backward. A no-op identity
                # otherwise; tagged only in training so the inference/bench
                # path is untouched.
                from jax.ad_checkpoint import checkpoint_name

                x = checkpoint_name(x, "layer_out")
            ys.append(x)
            if li == self.stop_after:
                return x
        raise RuntimeError("spec did not terminate with a Detect layer")


def build_model(name: str, nc: int = 80, dtype: Any = jnp.float32) -> YOLODetector:
    """Build a detector by name, e.g. 'yolov8n', 'yolov8l', 'yolo11l', 'yolo12l',
    'yolov9c', 'yolov10l' (reference: custom_training.py:90-127 model selection)."""
    for family in sorted(SPECS, key=len, reverse=True):
        if name.startswith(family):
            size = name[len(family):]
            if size not in SCALES[family]:
                raise ValueError(f"unknown size '{size}' for {family}; have {list(SCALES[family])}")
            depth, width, max_ch = SCALES[family][size]
            # yolo12 style: head follows v11 topology; A2C2f residual for l/x
            head_style = HEAD_STYLE[family]
            if head_style == "v12":
                head_style = "v11"
            return YOLODetector(
                spec=tuple(tuple(s) for s in SPECS[family]),
                nc=nc,
                depth=depth,
                width=width,
                max_channels=max_ch,
                head_style=head_style,
                attn_residual=(family == "yolo12" and size in ("l", "x")),
                c3k_force=(family in ("yolo11", "yolo12")
                           and size in ("m", "l", "x")),
                # v10 is an end2end architecture: the one2one branch is the
                # inference path and one2many trains alongside (reference
                # head.py:88-107 forward_end2end); both heads always exist in
                # the reference checkpoint, so build them by default.
                v10_dual=(HEAD_STYLE[family] == "v10"),
                dtype=dtype,
            )
    raise ValueError(f"unknown model name {name}")


def model_forward(model: YOLODetector, variables, images, train: bool = False):
    """Pure forward: images (B, H, W, 3) float -> dict of declared outputs.

    Replaces the reference's predict-with-extraction path
    (nn/tasks.py:153-208 + engine/predictor.py:276): a single jitted call
    producing boxes, pre-sigmoid logits and neck feature maps.
    """
    out = model.apply(variables, images, train=train)
    raw_levels, neck_feats = out[0], out[1]  # v10_dual appends one2many third
    boxes_xywh, cls_logits, anchor_strides = decode_detections(raw_levels, model.nc)
    return {
        "boxes_xywh": boxes_xywh,       # (B, A, 4) pixels
        "cls_logits": cls_logits,       # (B, A, nc) pre-sigmoid
        "anchor_strides": anchor_strides,  # (A,)
        "neck_feats": neck_feats,       # 3 x (B, H, W, C)
        "raw_levels": raw_levels,       # for the training loss
    }

"""High-level detector facade: one jitted predict step with every OoD tap.

Replaces the reference's YOLO facade + streaming predictor + model-mutation
extraction configuration (engine/model.py, engine/predictor.py:276,
ood_utils.py:3523-3541 ``configure_extra_output_of_the_model``): there is
nothing to configure — the jitted step always returns boxes, pre-sigmoid
logits, per-box stride levels, per-box RoI features and the stride-8 neck map,
and each OoD method consumes the taps it needs. Fusion therefore needs ONE
forward pass where the reference runs 2-3 (ood_utils.py:2971-2997).
"""

from __future__ import annotations

import dataclasses

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models import build_model, model_forward

from .ops import Detections, batched_nms, fused_detect
from .ops.roi_align import batched_roi_align_1x1, roi_and_exact_batched


class PredictOutput(NamedTuple):
    det: Detections          # (B, max_det, ...) boxes xyxy / conf / cls / valid
    logits: jnp.ndarray      # (B, max_det, nc) pre-sigmoid class logits per box
    stride_level: jnp.ndarray  # (B, max_det) int32 in {0,1,2}
    anchor_idx: jnp.ndarray  # (B, max_det) flat anchor index
    roi_feats: jnp.ndarray   # (B, max_det, Cmax) 1x1 RoI-aligned neck features
    exact_feats: jnp.ndarray  # (B, max_det, Cmax) neck feature at the box's own
                             # anchor cell — the 'ftmaps_and_strides_exact_pos'
                             # tap (reference predict.py:288-325)
    neck: tuple              # 3 x (B, H/s, W/s, C_s) PAN neck maps
                             # (the 'all_ftmaps'/'ftmaps_and_strides' tap;
                             # neck[0] is the stride-8 EUL map)

    @property
    def p3(self):
        return self.neck[0]


def _exact_pos_features(neck_feats, anchor_idx, level=None):
    """Per-box neck feature at the box's own anchor cell (flat-anchor indexing,
    reference predict.py:288-325 carries flat indices through NMS; here they
    are gathered on device). The flat anchor index addresses the
    level-concatenated anchor rows; rather than materialising the padded
    (B, A, Cmax) concat (a ~550 MB relayout at batch 128), each level is
    gathered separately with its local index (clamped; out-of-level rows are
    masked by the select), then zero-padded to Cmax and chosen per box."""
    del level
    cmax = max(f.shape[-1] for f in neck_feats)
    out = None
    off = 0
    for f in neck_feats:
        b, h, w, c = f.shape
        fl = f.reshape(b, h * w, c)
        local = jnp.clip(anchor_idx - off, 0, h * w - 1)
        v = jnp.take_along_axis(fl, local[..., None], axis=1)  # (B, N, c)
        if c < cmax:
            v = jnp.pad(v, ((0, 0), (0, 0), (0, cmax - c)))
        in_level = (anchor_idx >= off) & (anchor_idx < off + h * w)
        out = v if out is None else jnp.where(in_level[..., None], v, out)
        off += h * w
    return out


@dataclasses.dataclass
class Detector:
    """Build with `Detector.create('yolov8l', nc=20)`; `predict_fn(conf)`
    returns the jitted end-to-end step."""

    model: object
    variables: dict
    img_size: int = 640
    # 0 = torchvision's adaptive ceil(roi_span) sampling (the reference's
    # roi_align default, predict.py:64-70); >0 = fixed SxS grid
    roi_samples: int = 0
    # lazy top-k decode (ops/fused_detect.py): DFL decode only for the
    # pre-NMS candidates; exact up to float associativity. Disable to fall
    # back to the full-anchor decode (decode_detections + batched_nms).
    fused: bool = True
    _step_cache: dict = dataclasses.field(default_factory=dict, repr=False)

    @classmethod
    def create(cls, name: str, nc: int = 80, img_size: int = 640,
               dtype=jnp.float32, seed: int = 0, variables: Optional[dict] = None):
        model = build_model(name, nc=nc, dtype=dtype)
        if variables is None:
            dummy = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
            variables = model.init(jax.random.PRNGKey(seed), dummy, train=False)
        return cls(model=model, variables=variables, img_size=img_size)

    @property
    def nc(self) -> int:
        return self.model.nc

    def _jitted_step(self, iou_thres: float, max_det: int, pre_nms_k: int,
                     use_pallas: bool = True):
        """One compiled step per (iou, max_det, k); conf_thres is a *traced*
        argument so benchmark sweeps over test thresholds never recompile
        (the reference re-runs predict per threshold, ood_evaluation.py:1015).

        use_pallas=False keeps the RoI contraction on the plain XLA einsum —
        required under multi-device SPMD meshes, where a pallas_call has no
        partitioning rule (predict_sharded sets it; the einsum ties the
        kernel within ~2 %, PERF.md)."""
        key = (iou_thres, max_det, pre_nms_k, self.fused, self.roi_samples,
               use_pallas)
        if key in self._step_cache:
            return self._step_cache[key]
        model = self.model
        img_size = self.img_size
        samples = self.roi_samples
        fused = self.fused

        @jax.jit
        def step(variables, images, conf_thres) -> PredictOutput:
            if images.dtype == jnp.uint8:  # on-device normalize (4x less PCIe)
                images = images.astype(jnp.float32) * (1.0 / 255.0)
            if fused:
                out = model.apply(variables, images, train=False)
                raw_levels, neck_feats = out[0], out[1]
                det, logits = fused_detect(raw_levels, model.nc, conf_thres,
                                           iou_thres=iou_thres, max_det=max_det,
                                           pre_nms_k=pre_nms_k)
                hw = [(f.shape[1], f.shape[2]) for f in raw_levels]
            else:
                fw = model_forward(model, variables, images)
                neck_feats = fw["neck_feats"]
                det = batched_nms(fw["boxes_xywh"], fw["cls_logits"],
                                  conf_thres=conf_thres, iou_thres=iou_thres,
                                  max_det=max_det, pre_nms_k=pre_nms_k)
                logits = jnp.take_along_axis(fw["cls_logits"], det.anchor_idx[..., None], axis=1)
                hw = [(f.shape[1], f.shape[2]) for f in neck_feats]
            # level from the flat anchor index by comparing against the level
            # boundaries — an anchor_strides[anchor_idx] table gather costs
            # tens of ns per element on TPU (PERF.md)
            b0 = hw[0][0] * hw[0][1]
            b1 = b0 + hw[1][0] * hw[1][1]
            level = ((det.anchor_idx >= b0).astype(jnp.int32)
                     + (det.anchor_idx >= b1).astype(jnp.int32))
            # RoI + exact-position taps in one separable contraction per
            # level (exact = one-hot axis weights); Pallas VMEM-Q kernel on
            # TPU for the large levels (ops/pallas/roi.py)
            roi, exact = roi_and_exact_batched(
                neck_feats, det.boxes, det.anchor_idx, level,
                img_w=img_size, samples=samples, use_pallas=use_pallas)
            # final boxes are clipped to the image like the reference's
            # Results (scale_boxes -> clip_boxes, utils/ops.py:96,536 — with
            # tensor input gain=1/pad=0 so it is a pure clamp). Order matters:
            # the reference RoI-aligns on the UNclipped NMS boxes
            # (detect/predict.py:176-199 runs before construct), so the clamp
            # happens after roi/exact extraction here too.
            det = det._replace(boxes=jnp.clip(det.boxes, 0.0, float(img_size)))
            return PredictOutput(det, logits, level, det.anchor_idx, roi, exact,
                                 tuple(neck_feats))

        self._step_cache[key] = step
        return step

    def predict_fn(self, conf_thres: float = 0.25, iou_thres: float = 0.7,
                   max_det: int = 300, pre_nms_k: int = 1024,
                   use_pallas: bool = True):
        """(variables, images) -> PredictOutput with conf baked as a traced
        scalar; repeated calls with different conf reuse the same executable."""
        step = self._jitted_step(iou_thres, max_det, pre_nms_k, use_pallas)
        return lambda variables, images: step(variables, images,
                                              jnp.float32(conf_thres))

    def predict(self, images, conf_thres: float = 0.25, **kw) -> PredictOutput:
        return self.predict_fn(conf_thres=conf_thres, **kw)(self.variables, images)

    def predict_sharded(self, images, mesh, conf_thres: float = 0.25,
                        **kw) -> PredictOutput:
        """Multi-chip data-parallel serving: params replicated, the image
        batch sharded over the mesh's data axis; jit compiles the same step
        as an SPMD program (XLA inserts the collectives — none are needed for
        DP inference, every per-image output stays on its shard). If the
        mesh has an ``sp`` axis of size > 1, image height is additionally
        sharded across it (spatial parallelism: conv halos ride XLA SPMD
        collective-permutes) — this scales single-image latency where DP
        cannot.

        The reference parallelizes eval by launching one process per GPU
        (replicate/benchmarks_v8.sh); here one process drives the whole mesh.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .parallel.mesh import batch_sharding, replicated

        # replicate weights once per (mesh, weight-tree identity). A single
        # entry holding a strong reference to the source tree: identity
        # comparison is safe (no id() reuse after GC), swapping in new
        # weights (checkpoint load, EMA) evicts the previous on-device copy.
        cached = self._step_cache.get("replicated")
        if cached is None or cached[0] is not mesh or cached[1] is not self.variables:
            cached = (mesh, self.variables,
                      jax.device_put(self.variables, replicated(mesh)))
            self._step_cache["replicated"] = cached
        v = cached[2]
        if "sp" in mesh.axis_names and mesh.shape["sp"] > 1:
            from .parallel.mesh import BATCH_AXES

            x = jax.device_put(
                images, NamedSharding(mesh, P(BATCH_AXES, "sp", None, None)))
        else:
            x = jax.device_put(images, batch_sharding(mesh))
        # multi-device meshes: keep the RoI contraction on XLA (a pallas_call
        # cannot be SPMD-partitioned; the einsum ties it within ~2 %, PERF.md)
        kw.setdefault("use_pallas", mesh.devices.size == 1)
        return self.predict_fn(conf_thres=conf_thres, **kw)(v, x)

    # per-level neck channel counts (to slice roi_feats padding)
    def neck_channels(self) -> Tuple[int, ...]:
        dummy = jax.eval_shape(
            lambda v: self.model.apply(v, jnp.zeros((1, self.img_size, self.img_size, 3)),
                                       train=False),
            self.variables,
        )
        return tuple(f.shape[-1] for f in dummy[1])

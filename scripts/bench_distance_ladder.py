"""Marginal-cost ladder for the distance-method eval step (VERDICT r3 #7).

Times the bench.py distance pipeline and ablations of its tap consumers on
the real chip, to locate the ~7 ms gap between the distance step (5215
img/s) and the headline detect+score step (7439 img/s) at batch 128:

  A. headline pipeline (u8 input, MSP decide)              [reference point]
  B. distance pipeline exactly as bench.py (f32 input)
  C. B with u8 input + u8 perturbation                     [input-dtype tax]
  D. C without the neck-map sum                            [neck output tax]
  E. C without RoIAlign (zeros)                            [RoI cost]
  F. C without exact-pos feats (zeros)                     [exact cost]
  G. C with RoI as two-stage separable contraction         [alternative]

Run from /root/repo (axon registration): python scripts/bench_distance_ladder.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

BATCH, IMG, NC, K = 128, 640, 20, 512
ITERS = 16


def timed(fn, *args):
    @jax.jit
    def loop(args, iters):
        def body(i, acc):
            return acc + fn(*args, i)
        return lax.fori_loop(0, iters, body, jnp.float32(0.0))

    _ = float(loop(args, 2))
    t0 = time.perf_counter()
    _ = float(loop(args, ITERS))
    dt = time.perf_counter() - t0
    t1 = time.perf_counter()
    _ = float(loop(args, 1))
    ov = time.perf_counter() - t1
    return max(dt - max(ov - dt / ITERS, 0.0), 1e-9) / ITERS * 1000.0


def roi_two_stage(fmaps, boxes, level_idx, img_w):
    """out[b,n,c] = sum_h wy * (sum_w wx * f) — avoids materialising the
    (B, N, H*W) outer-product Q of the shipped one-matmul path."""
    from ood_in_object_detection_tpu.ops.roi_align import _axis_weights

    cmax = max(f.shape[-1] for f in fmaps)
    out = None
    for li, f in enumerate(fmaps):
        b, h, w, c = f.shape
        scale = w / img_w
        bx = boxes * scale
        x1, y1 = bx[..., 0], bx[..., 1]
        bw = jnp.maximum(bx[..., 2] - x1, 1.0)
        bh = jnp.maximum(bx[..., 3] - y1, 1.0)
        wx = _axis_weights(x1, bw, w, 0).astype(f.dtype)   # (B,N,W)
        wy = _axis_weights(y1, bh, h, 0).astype(f.dtype)   # (B,N,H)
        r = jnp.einsum("bnw,bhwc->bnhc", wx, f,
                       preferred_element_type=jnp.float32)  # (B,N,H,C)
        v = jnp.einsum("bnh,bnhc->bnc", wy, r.astype(f.dtype),
                       preferred_element_type=jnp.float32).astype(f.dtype)
        if c < cmax:
            v = jnp.pad(v, ((0, 0), (0, 0), (0, cmax - c)))
        out = v if out is None else jnp.where((level_idx == li)[..., None], v, out)
    return out


def main():
    from ood_in_object_detection_tpu.engine import Detector, _exact_pos_features
    from ood_in_object_detection_tpu.models import build_model
    from ood_in_object_detection_tpu.ops import fused_detect
    from ood_in_object_detection_tpu.ops.roi_align import batched_roi_align_1x1
    from ood_in_object_detection_tpu.ood.distance import l2_normalize_rows
    from ood_in_object_detection_tpu.ood.scores import msp_score
    import bench as B

    det = Detector.create("yolov8n", nc=NC, img_size=IMG, dtype=jnp.bfloat16)
    model, variables = det.model, det.variables
    method = B.make_distance_method(256)
    thr = method.packed_thresholds()

    rng = jax.random.PRNGKey(0)
    img_f32 = jax.random.uniform(rng, (BATCH, IMG, IMG, 3), jnp.float32)
    img_u8 = (img_f32 * 255).astype(jnp.uint8)

    def fwd_taps(variables, x, roi_mode, want_exact=True):
        raw_levels, neck = model.apply(variables, x, train=False)
        d, logits = fused_detect(raw_levels, NC, jnp.float32(0.25),
                                 iou_thres=0.45, max_det=300, pre_nms_k=K)
        hw = [(f.shape[1], f.shape[2]) for f in raw_levels]
        b0 = hw[0][0] * hw[0][1]
        b1 = b0 + hw[1][0] * hw[1][1]
        level = ((d.anchor_idx >= b0).astype(jnp.int32)
                 + (d.anchor_idx >= b1).astype(jnp.int32))
        if roi_mode == "one_matmul":
            roi = batched_roi_align_1x1(neck, d.boxes, level, img_w=IMG, samples=0)
        elif roi_mode == "two_stage":
            roi = roi_two_stage(neck, d.boxes, level, img_w=IMG)
        else:
            roi = jnp.zeros(d.boxes.shape[:2] + (256,), jnp.bfloat16)
        exact = (_exact_pos_features(neck, d.anchor_idx) if want_exact
                 else jnp.zeros_like(roi))
        return d, logits, level, roi, exact, neck

    def dist_decide(d, level, roi):
        b, k, c = roi.shape
        feats = l2_normalize_rows(roi.reshape(b * k, c).astype(jnp.float32))
        dist = method.distances(feats, d.cls.reshape(-1), level.reshape(-1))
        ind = (dist.reshape(b, k) < thr[d.cls, level])
        ood = jnp.where(d.valid, ind.astype(jnp.int32), 0)
        return dist.sum() + ood.sum()

    def headline(variables, images, i):
        x = (images + i.astype(jnp.uint8)).astype(jnp.float32) * (1.0 / 255.0)
        raw_levels, _ = model.apply(variables, x, train=False)
        d, logits = fused_detect(raw_levels, NC, jnp.float32(0.25),
                                 iou_thres=0.45, max_det=300, pre_nms_k=K)
        scores = msp_score(logits, d.cls)
        ood = jnp.where(d.valid, (scores >= 0.5).astype(jnp.int32), 0)
        return d.conf.sum() + scores.sum() + ood.sum()

    def make_dist_pipeline(u8, neck_sum=True, roi_mode="one_matmul",
                           want_exact=True):
        def pipeline(variables, images, i):
            if u8:
                x = ((images + i.astype(jnp.uint8)).astype(jnp.float32)
                     * (1.0 / 255.0))
            else:
                x = images + i.astype(jnp.float32) * 1e-9
            d, logits, level, roi, exact, neck = fwd_taps(
                variables, x, roi_mode, want_exact)
            acc = d.conf.sum() + dist_decide(d, level, roi)
            acc = acc + jnp.sum(exact.astype(jnp.float32))
            if neck_sum:
                acc = acc + sum(jnp.sum(f.astype(jnp.float32)) for f in neck)
            return acc
        return pipeline

    rows = [
        ("A headline u8 (ref point)", headline, img_u8),
        ("B dist f32 (bench.py today)", make_dist_pipeline(False), img_f32),
        ("C dist u8", make_dist_pipeline(True), img_u8),
        ("D C - neck_sum", make_dist_pipeline(True, neck_sum=False), img_u8),
        ("E C - roi", make_dist_pipeline(True, roi_mode="none"), img_u8),
        ("F C - exact", make_dist_pipeline(True, want_exact=False), img_u8),
        ("G C roi=two_stage", make_dist_pipeline(True, roi_mode="two_stage"),
         img_u8),
    ]
    for name, fn, img in rows:
        ms = timed(fn, variables, img)
        print(f"{name:34s} {ms:7.2f} ms  {BATCH / ms * 1000:7.0f} img/s",
              flush=True)


if __name__ == "__main__":
    main()

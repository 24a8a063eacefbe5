"""RoI+exact tap variants on the real chip (VERDICT r3 #7, distance step).

Times the full distance-eval pipeline (fwd + fused detect + taps + distance
decide + neck sums, u8 input, batch 128) with the RoI/exact region swapped:

  base   shipped r2 path: XLA Q einsum RoI + take_along exact gathers
  fold   XLA Q einsum with exact folded as one-hot rows (no gathers)
  store  Pallas VMEM-Q kernel (per-h lane-broadcast build) for P3/P4
  expand Pallas VMEM-Q kernel (E-matmul wy expansion) for P3/P4

Run from /root/repo: python scripts/bench_roi_kernel.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
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


def main():
    from ood_in_object_detection_tpu.engine import Detector, _exact_pos_features
    from ood_in_object_detection_tpu.ops import fused_detect
    from ood_in_object_detection_tpu.ops.roi_align import (
        batched_roi_align_1x1, roi_and_exact_batched)
    import ood_in_object_detection_tpu.ops.pallas.roi as proi
    from ood_in_object_detection_tpu.ood.distance import l2_normalize_rows
    import bench as B

    det = Detector.create("yolov8n", nc=NC, img_size=IMG, dtype=jnp.bfloat16)
    model, variables = det.model, det.variables
    method = B.make_distance_method(256)
    thr = method.packed_thresholds()
    rng = jax.random.PRNGKey(0)
    img_u8 = (jax.random.uniform(rng, (BATCH, IMG, IMG, 3), jnp.float32)
              * 255).astype(jnp.uint8)

    def make_pipeline(tap_mode):
        def pipeline(variables, images, i):
            x = ((images + i.astype(jnp.uint8)).astype(jnp.float32)
                 * (1.0 / 255.0))
            raw_levels, neck = model.apply(variables, x, train=False)
            d, logits = fused_detect(raw_levels, NC, jnp.float32(0.25),
                                     iou_thres=0.45, max_det=300, pre_nms_k=K)
            hw = [(f.shape[1], f.shape[2]) for f in raw_levels]
            b0 = hw[0][0] * hw[0][1]
            b1 = b0 + hw[1][0] * hw[1][1]
            level = ((d.anchor_idx >= b0).astype(jnp.int32)
                     + (d.anchor_idx >= b1).astype(jnp.int32))
            if tap_mode == "base":
                roi = batched_roi_align_1x1(neck, d.boxes, level, img_w=IMG,
                                            samples=0)
                exact = _exact_pos_features(neck, d.anchor_idx)
            else:
                roi, exact = roi_and_exact_batched(
                    neck, d.boxes, d.anchor_idx, level, img_w=IMG, samples=0,
                    use_pallas=(tap_mode != "fold"))
            b, k, c = roi.shape
            feats = l2_normalize_rows(roi.reshape(b * k, c).astype(jnp.float32))
            dist = method.distances(feats, d.cls.reshape(-1), level.reshape(-1))
            ind = (dist.reshape(b, k) < thr[d.cls, level])
            ood = jnp.where(d.valid, ind.astype(jnp.int32), 0)
            acc = d.conf.sum() + dist.sum() + ood.sum()
            acc = acc + jnp.sum(exact.astype(jnp.float32))
            acc = acc + sum(jnp.sum(f.astype(jnp.float32)) for f in neck)
            return acc
        return pipeline

    for mode in ("base", "fold", "store", "expand"):
        if mode in ("store", "expand"):
            orig = proi.roi_matmul_level_pallas

            # NOT functools.partial: the engine call site now passes
            # variant="twostage" explicitly, and call-time kwargs override a
            # partial's — force the swept variant by dropping the caller's
            def proi_fn(f, wx, wy, variant=None, *, _m=mode, _o=orig):
                return _o(f, wx, wy, variant=_m)

            proi.roi_matmul_level_pallas = proi_fn
        try:
            ms = timed(make_pipeline(mode), variables, img_u8)
            print(f"{mode:8s} {ms:7.2f} ms  {BATCH / ms * 1000:7.0f} img/s",
                  flush=True)
        except Exception as e:
            print(f"{mode:8s} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
        finally:
            if mode in ("store", "expand"):
                proi.roi_matmul_level_pallas = orig


if __name__ == "__main__":
    main()

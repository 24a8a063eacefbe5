"""Two-stage Pallas RoI kernel vs shipped path in the full distance pipeline
(PERF.md round-3 RoI-wall section). Run from /root/repo."""
import os, sys, time, functools
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
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
    t0 = time.perf_counter(); _ = float(loop(args, ITERS)); dt = time.perf_counter() - t0
    t1 = time.perf_counter(); _ = float(loop(args, 1)); ov = time.perf_counter() - t1
    return max(dt - max(ov - dt / ITERS, 0.0), 1e-9) / ITERS * 1000.0

from ood_in_object_detection_tpu.engine import Detector, _exact_pos_features
from ood_in_object_detection_tpu.ops import fused_detect
from ood_in_object_detection_tpu.ops.roi_align import batched_roi_align_1x1, roi_and_exact_batched
import ood_in_object_detection_tpu.ops.pallas.roi as proi
from ood_in_object_detection_tpu.ood.distance import l2_normalize_rows
import bench as B

det = Detector.create("yolov8n", nc=NC, img_size=IMG, dtype=jnp.bfloat16)
model, variables = det.model, det.variables
method = B.make_distance_method(256)
thr = method.packed_thresholds()
rng = jax.random.PRNGKey(0)
img_u8 = (jax.random.uniform(rng, (BATCH, IMG, IMG, 3), jnp.float32) * 255).astype(jnp.uint8)

def make_pipeline(tap_mode):
    def pipeline(variables, images, i):
        x = ((images + i.astype(jnp.uint8)).astype(jnp.float32) * (1.0 / 255.0))
        raw_levels, neck = model.apply(variables, x, train=False)
        d, logits = fused_detect(raw_levels, NC, jnp.float32(0.25), iou_thres=0.45, max_det=300, pre_nms_k=K)
        hw = [(f.shape[1], f.shape[2]) for f in raw_levels]
        b0 = hw[0][0] * hw[0][1]; b1 = b0 + hw[1][0] * hw[1][1]
        level = ((d.anchor_idx >= b0).astype(jnp.int32) + (d.anchor_idx >= b1).astype(jnp.int32))
        if tap_mode == "base":
            roi = batched_roi_align_1x1(neck, d.boxes, level, img_w=IMG, samples=0)
            exact = _exact_pos_features(neck, d.anchor_idx)
        else:
            roi, exact = roi_and_exact_batched(neck, d.boxes, d.anchor_idx, level, img_w=IMG, samples=0, use_pallas=True)
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

orig = proi.roi_matmul_level_pallas
for mode in ("base", "twostage", "twostage_p5k"):
    if mode.startswith("twostage"):
        proi.roi_matmul_level_pallas = functools.partial(orig, variant="twostage")
    if mode == "twostage_p5k":
        import ood_in_object_detection_tpu.ops.roi_align as ra
        ra.PALLAS_MIN_HW = 256  # kernel for P5 as well
    try:
        ms = timed(make_pipeline(mode), variables, img_u8)
        print(f"{mode:14s} {ms:7.2f} ms  {BATCH / ms * 1000:7.0f} img/s", flush=True)
    except Exception as e:
        print(f"{mode:14s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
    finally:
        proi.roi_matmul_level_pallas = orig

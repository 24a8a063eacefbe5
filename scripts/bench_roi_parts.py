"""RoI sub-component cost probe (hats / Q-materialisation / einsum), PERF.md
round-3 RoI-wall section. Run from /root/repo."""
import os, sys, time
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
from ood_in_object_detection_tpu.ops.roi_align import _axis_weights, batched_roi_align_1x1
from ood_in_object_detection_tpu.ood.distance import l2_normalize_rows
import bench as B

det = Detector.create("yolov8n", nc=NC, img_size=IMG, dtype=jnp.bfloat16)
model, variables = det.model, det.variables
method = B.make_distance_method(256)
thr = method.packed_thresholds()
rng = jax.random.PRNGKey(0)
img_u8 = (jax.random.uniform(rng, (BATCH, IMG, IMG, 3), jnp.float32) * 255).astype(jnp.uint8)

def make(mode):
    def pipeline(variables, images, i):
        x = ((images + i.astype(jnp.uint8)).astype(jnp.float32) * (1.0 / 255.0))
        raw_levels, neck = model.apply(variables, x, train=False)
        d, logits = fused_detect(raw_levels, NC, jnp.float32(0.25), iou_thres=0.45, max_det=300, pre_nms_k=K)
        hw = [(f.shape[1], f.shape[2]) for f in raw_levels]
        b0 = hw[0][0] * hw[0][1]; b1 = b0 + hw[1][0] * hw[1][1]
        level = ((d.anchor_idx >= b0).astype(jnp.int32) + (d.anchor_idx >= b1).astype(jnp.int32))
        acc = d.conf.sum() + sum(jnp.sum(f.astype(jnp.float32)) for f in neck)
        # distance decide on exact feats path uses roi; here always feed zeros-or-roi
        if mode == "none":
            roi = jnp.zeros(d.boxes.shape[:2] + (256,), jnp.bfloat16)
        if mode in ("hats", "q3", "full_noexact"):
            for f in neck:
                b, h, w, c = f.shape
                scale = w / IMG
                bx = d.boxes * scale
                x1, y1 = bx[..., 0], bx[..., 1]
                bw = jnp.maximum(bx[..., 2] - x1, 1.0)
                bh = jnp.maximum(bx[..., 3] - y1, 1.0)
                wx = _axis_weights(x1, bw, w, 0)
                wy = _axis_weights(y1, bh, h, 0)
                if mode == "hats":
                    acc = acc + wx.sum() + wy.sum()
                else:
                    n = d.boxes.shape[1]
                    q = (wy[..., :, None] * wx[..., None, :]).reshape(b, n, h * w).astype(f.dtype)
                    if mode == "q3":
                        acc = acc + jnp.sum(q[:, :, ::127].astype(jnp.float32))
                    else:
                        v = jnp.einsum("bnk,bkc->bnc", q, f.reshape(b, h * w, c), preferred_element_type=jnp.float32)
                        acc = acc + jnp.sum(v)
            roi = jnp.zeros(d.boxes.shape[:2] + (256,), jnp.bfloat16)
        if mode == "shipped":
            roi = batched_roi_align_1x1(neck, d.boxes, level, img_w=IMG, samples=0)
        if mode in ("exact_only", "shipped"):
            exact = _exact_pos_features(neck, d.anchor_idx)
            acc = acc + jnp.sum(exact.astype(jnp.float32))
        b, k, c = roi.shape
        feats = l2_normalize_rows(roi.reshape(b * k, c).astype(jnp.float32))
        dist = method.distances(feats, d.cls.reshape(-1), level.reshape(-1))
        ind = (dist.reshape(b, k) < thr[d.cls, level])
        ood = jnp.where(d.valid, ind.astype(jnp.int32), 0)
        return acc + dist.sum() + ood.sum()
    return pipeline

for mode in ("none", "hats", "q3", "full_noexact", "exact_only", "shipped"):
    ms = timed(make(mode), variables, img_u8)
    print(f"{mode:14s} {ms:7.2f} ms  {BATCH / ms * 1000:7.0f} img/s", flush=True)

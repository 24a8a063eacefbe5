"""Tap-dtype lever for the distance-eval step (VERDICT r3 #5a).

bench.py's distance-eval step already runs the model in bf16, which — as
measured by scripts/ probes and pinned here — makes every neck tap and RoI
feature bf16 end-to-end (ops/roi_align.py keeps fmap dtype with f32
accumulation). The unmeasured comparison is the f32-model variants:

  A. f32 model, f32 taps             (the CLI default precision)
  B. f32 model, taps CAST to bf16    (halved tap HBM traffic, f32 compute)
  C. bf16 model (bench.py config)    (bf16 everywhere)

plus the decision/threshold parity impact of bf16 taps: fit percentile
thresholds from f32 vs bf16 activations of the SAME weights on the SAME
images, and count per-box decision flips at eval.

Run from /root/repo (axon registration): python scripts/bench_bf16_taps.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

IMG, NC, BATCH, ITERS, PRE_NMS_K = 640, 20, 128, 8, 512


def timed(fn, *args):
    @jax.jit
    def loop(args, iters):
        def body(i, acc):
            return acc + fn(*args, i)

        return lax.fori_loop(0, iters, body, jnp.float32(0.0))

    _ = float(loop(args, 2))
    dt = min(_t(loop, args, ITERS) for _ in range(3))
    ov = min(_t(loop, args, 1) for _ in range(3))
    return max(dt - max(ov - dt / ITERS, 0.0), 1e-9) / ITERS * 1000.0


def _t(fn, args, iters):
    t0 = time.perf_counter()
    _ = float(fn(args, iters))
    return time.perf_counter() - t0


def make_pipeline(model, variables, method, thr, tap_dtype):
    """The bench distance pipeline with an explicit tap dtype: neck maps are
    cast to `tap_dtype` right after the forward, so the RoI contraction reads
    (and XLA materializes) taps at that width."""
    from ood_in_object_detection_tpu.ops.fused_detect import fused_detect
    from ood_in_object_detection_tpu.ops.roi_align import roi_and_exact_batched
    from ood_in_object_detection_tpu.ood.distance import l2_normalize_rows

    def pipeline(variables, images, thr, i):
        x = images + i.astype(jnp.float32) * 1e-9
        raw_levels, neck = model.apply(variables, x, train=False)
        neck = [f.astype(tap_dtype) for f in neck]
        det, logits = fused_detect(raw_levels, NC, jnp.float32(0.25),
                                   iou_thres=0.7, max_det=300,
                                   pre_nms_k=PRE_NMS_K)
        b0 = neck[0].shape[1] * neck[0].shape[2]
        b1 = b0 + neck[1].shape[1] * neck[1].shape[2]
        level = ((det.anchor_idx >= b0).astype(jnp.int32)
                 + (det.anchor_idx >= b1).astype(jnp.int32))
        roi, exact = roi_and_exact_batched(neck, det.boxes, det.anchor_idx,
                                           level, img_w=IMG, use_pallas=True)
        b, k, d = roi.shape
        feats = l2_normalize_rows(roi.reshape(b * k, d).astype(jnp.float32))
        dist = method.distances(feats, det.cls.reshape(-1), level.reshape(-1))
        ind = dist.reshape(b, k) < thr[det.cls, level]
        ood = jnp.where(det.valid, ind.astype(jnp.int32), 0)
        neck_sum = sum(jnp.sum(f.astype(jnp.float32)) for f in neck)
        return (det.conf.sum() + dist.sum() + ood.sum()
                + jnp.sum(exact.astype(jnp.float32)) + neck_sum)

    return pipeline


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    from bench import make_distance_method
    from ood_in_object_detection_tpu.models import build_model

    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (BATCH, IMG, IMG, 3), jnp.float32)
    method = make_distance_method(256)
    thr = method.packed_thresholds()

    results = {}
    for tag, model_dtype, tap_dtype in (
            ("A_f32_model_f32_taps", jnp.float32, jnp.float32),
            ("B_f32_model_bf16_taps", jnp.float32, jnp.bfloat16),
            ("C_bf16_model", jnp.bfloat16, jnp.bfloat16)):
        model = build_model("yolov8n", nc=NC, dtype=model_dtype)
        variables = jax.jit(model.init, static_argnames="train")(
            rng, jnp.zeros((1, IMG, IMG, 3), jnp.float32), train=False)
        pipe = make_pipeline(model, variables, method, thr, tap_dtype)
        ms = timed(pipe, variables, images, thr)
        ips = BATCH / ms * 1000.0
        results[tag] = round(ips, 1)
        print(json.dumps({"variant": tag, "img_per_sec": round(ips, 1),
                          "ms_per_batch": round(ms, 2)}), flush=True)

    print(json.dumps({"summary": results,
                      "bf16_tap_gain_on_f32_model":
                          round(results["B_f32_model_bf16_taps"]
                                / results["A_f32_model_f32_taps"], 4)}))


def parity_probe():
    """Decision/threshold impact of bf16 taps: same f32 weights, same images;
    thresholds fitted from f32 RoI feats vs bf16-cast RoI feats; decisions
    compared box-by-box. Runs on whatever backend is active (CPU is fine —
    the cast semantics, not the chip, are under test)."""
    from ood_in_object_detection_tpu.engine import Detector
    from ood_in_object_detection_tpu.ood.distance import l2_normalize_rows, pairwise_distance

    det = Detector.create("yolov8n", nc=4, img_size=192)
    images = jax.random.uniform(jax.random.PRNGKey(3), (8, 192, 192, 3))
    out = det.predict(images, conf_thres=1e-6, pre_nms_k=256)
    valid = np.asarray(out.det.valid).reshape(-1)
    cls = np.asarray(out.det.cls).reshape(-1)[valid]
    roi = np.asarray(out.roi_feats, np.float32).reshape(valid.shape[0], -1)[valid]
    roi16 = roi.astype(jnp.bfloat16).astype(np.float32)

    def fit_and_decide(feats):
        f = np.asarray(l2_normalize_rows(jnp.asarray(feats)))
        # one centroid per class from the first half; decide the second half
        n = len(f) // 2
        thr, dec = {}, np.zeros(len(f) - n, np.int32)
        for c in np.unique(cls[:n]):
            sel = f[:n][cls[:n] == c]
            cen = sel.mean(0, keepdims=True)
            cen /= np.linalg.norm(cen, axis=-1, keepdims=True)
            d = np.asarray(pairwise_distance(jnp.asarray(cen),
                                             jnp.asarray(sel), "cosine"))[0]
            thr[int(c)] = float(np.percentile(d, 95))
            m = cls[n:] == c
            dd = np.asarray(pairwise_distance(
                jnp.asarray(cen), jnp.asarray(f[n:][m]), "cosine"))[0]
            dec[m] = (dd < thr[int(c)]).astype(np.int32)
        return thr, dec

    thr32, dec32 = fit_and_decide(roi)
    thr16, dec16 = fit_and_decide(roi16)
    flips = int((dec32 != dec16).sum())
    max_thr_rel = max(abs(thr32[c] - thr16[c]) / max(abs(thr32[c]), 1e-9)
                      for c in thr32)
    print(json.dumps({"parity_probe": {
        "n_boxes_decided": int(len(dec32)), "decision_flips": flips,
        "max_threshold_rel_delta": round(max_thr_rel, 6)}}))


if __name__ == "__main__":
    if "--parity" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        parity_probe()
    else:
        main()

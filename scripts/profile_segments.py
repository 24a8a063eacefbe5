"""Per-segment on-device timing of the v8n inference pipeline (real TPU).

Each segment is timed with the same protocol as bench.py: a single jit whose
body is a lax.fori_loop over the segment with an input perturbation (defeats
loop-invariant hoisting), terminated by a host fetch; the 1-iter dispatch
overhead is measured and subtracted. Host-side per-call timing through the
axon tunnel is meaningless (CLAUDE.md).

Usage: python scripts/profile_segments.py [batch]
"""

import os
import sys
import time

# setting PYTHONPATH breaks axon backend registration; add repo root here
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = 16


def timed(name, fn, *args):
    """fn(*args, i) -> scalar; time ITERS on-device iterations."""

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
    compute = max(dt - max(ov - dt / ITERS, 0.0), 1e-9)
    ms = compute / ITERS * 1000.0
    print(f"{name:38s} {ms:8.3f} ms/iter   {BATCH/ms*1000:9.1f} img/s")
    return ms


def main():
    from flax import linen as nn

    from ood_in_object_detection_tpu.models import build_model, model_forward
    from ood_in_object_detection_tpu.models import layers as L
    from ood_in_object_detection_tpu.models.folded_stem import phase_folded_stem
    from ood_in_object_detection_tpu.ops import batched_nms
    from ood_in_object_detection_tpu.ood.scores import msp_score

    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    img = jax.random.uniform(rng, (BATCH, 640, 640, 3), jnp.float32)

    model = build_model("yolov8n", nc=20, dtype=dt)
    variables = jax.jit(model.init, static_argnames="train")(rng, img[:1], train=False)
    thresholds = jnp.full((20,), 0.5, jnp.float32)

    # --- full pipeline (bench.py parity) ---
    def pipeline(v, x, i):
        x = x + i.astype(jnp.float32) * 1e-9
        out = model_forward(model, v, x)
        det = batched_nms(out["boxes_xywh"], out["cls_logits"],
                          conf_thres=0.25, iou_thres=0.45, max_det=300, pre_nms_k=512)
        logits = jnp.take_along_axis(out["cls_logits"], det.anchor_idx[..., None], axis=1)
        scores = msp_score(logits, det.cls)
        ood = jnp.where(det.valid, (scores >= thresholds[det.cls]).astype(jnp.int32), 0)
        return det.conf.sum() + scores.sum() + ood.sum()

    def fwd_only(v, x, i):
        x = x + i.astype(jnp.float32) * 1e-9
        out = model_forward(model, v, x)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in (
            out["boxes_xywh"], out["cls_logits"]))

    t_pipe = timed("full pipeline (fwd+nms+score)", pipeline, variables, img)
    t_fwd = timed("model_forward (decode incl.)", fwd_only, variables, img)

    # --- stem: folded l0+l1 ---
    p = variables["params"]
    k1, bn1 = p["l0_Conv"]["conv"]["kernel"], {
        "scale": p["l0_Conv"]["bn"]["scale"], "bias": p["l0_Conv"]["bn"]["bias"],
        "mean": variables["batch_stats"]["l0_Conv"]["bn"]["mean"],
        "var": variables["batch_stats"]["l0_Conv"]["bn"]["var"]}
    k2, bn2 = p["l1_Conv"]["conv"]["kernel"], {
        "scale": p["l1_Conv"]["bn"]["scale"], "bias": p["l1_Conv"]["bn"]["bias"],
        "mean": variables["batch_stats"]["l1_Conv"]["bn"]["mean"],
        "var": variables["batch_stats"]["l1_Conv"]["bn"]["var"]}

    def stem_fn(x, i):
        x = x + i.astype(jnp.float32) * 1e-9
        y = phase_folded_stem(x, k1, bn1, k2, bn2, dtype=dt)
        return jnp.sum(y.astype(jnp.float32))

    t_stem = timed("folded stem l0+l1 (640->160x32)", stem_fn, img)

    # --- standalone blocks at their true resolutions ---
    def block(name, mod, shape):
        x0 = jax.random.normal(rng, shape, dt)
        v = mod.init(rng, x0, False)

        def f(v, x, i):
            return jnp.sum(mod.apply(v, x + i.astype(dt) * jnp.bfloat16(1e-9), False).astype(jnp.float32))

        return timed(name, f, v, x0)

    t_l2 = block("l2 C2f(32,n1) @160", L.C2f(32, 1, True, dtype=dt), (BATCH, 160, 160, 32))
    t_l3 = block("l3 Conv(64,3,2) @160->80", L.Conv(64, 3, 2, dtype=dt), (BATCH, 160, 160, 32))
    t_l4 = block("l4 C2f(64,n2) @80", L.C2f(64, 2, True, dtype=dt), (BATCH, 80, 80, 64))
    t_l5 = block("l5 Conv(128,3,2) @80->40", L.Conv(128, 3, 2, dtype=dt), (BATCH, 80, 80, 64))
    t_l6 = block("l6 C2f(128,n2) @40", L.C2f(128, 2, True, dtype=dt), (BATCH, 40, 40, 128))

    t_l7 = block("l7 Conv(256,3,2) @40->20", L.Conv(256, 3, 2, dtype=dt), (BATCH, 40, 40, 128))
    t_l8 = block("l8 C2f(256,n1) @20", L.C2f(256, 1, True, dtype=dt), (BATCH, 20, 20, 256))
    t_l9 = block("l9 SPPF(256) @20", L.SPPF(256, 5, dtype=dt), (BATCH, 20, 20, 256))
    t_n12 = block("neck C2f(128)@40", L.C2f(128, 1, False, dtype=dt), (BATCH, 40, 40, 384))
    t_n15 = block("neck C2f(64)@80 (P3)", L.C2f(64, 1, False, dtype=dt), (BATCH, 80, 80, 192))
    t_n18 = block("neck C2f(128)@40 (P4)", L.C2f(128, 1, False, dtype=dt), (BATCH, 40, 40, 192))
    t_n21 = block("neck C2f(256)@20 (P5)", L.C2f(256, 1, False, dtype=dt), (BATCH, 20, 20, 384))
    t_n16 = block("neck Conv(64,3,2)@80", L.Conv(64, 3, 2, dtype=dt), (BATCH, 80, 80, 64))
    t_n19 = block("neck Conv(128,3,2)@40", L.Conv(128, 3, 2, dtype=dt), (BATCH, 40, 40, 128))

    # head + decode
    from ood_in_object_detection_tpu.models.head import DetectHead, decode_detections
    feats = [jax.random.normal(rng, (BATCH, 80, 80, 64), dt),
             jax.random.normal(rng, (BATCH, 40, 40, 128), dt),
             jax.random.normal(rng, (BATCH, 20, 20, 256), dt)]
    head = DetectHead(nc=20, ch=(64, 128, 256), style="v8", dtype=dt)
    hv = head.init(rng, feats, False)

    def head_fn(hv, feats, i):
        fs = [f + i.astype(dt) * jnp.bfloat16(1e-9) for f in feats]
        out = head.apply(hv, fs, False)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in out)

    t_head = timed("detect head (3 levels)", head_fn, hv, feats)

    raw = [jax.random.normal(rng, (BATCH, s, s, 84), dt) for s in (80, 40, 20)]

    def dec_fn(raw, i):
        rs = [r + i.astype(dt) * jnp.bfloat16(1e-9) for r in raw]
        boxes, logits = decode_detections(rs, nc=20)[:2]
        return jnp.sum(boxes.astype(jnp.float32)) + jnp.sum(logits.astype(jnp.float32))

    t_dec = timed("decode (DFL+dist2bbox+concat)", dec_fn, raw)

    known = (t_stem + t_l2 + t_l3 + t_l4 + t_l5 + t_l6 + t_l7 + t_l8 + t_l9
             + t_n12 + t_n15 + t_n18 + t_n16 + t_n19 + t_n21 + t_head + t_dec)
    print(f"{'nms+score (pipe-fwd)':38s} {t_pipe - t_fwd:8.3f} ms/iter")
    print(f"{'sum of segments':38s} {known:8.3f} ms/iter  (fwd={t_fwd:.3f})")
    print(f"{'stem region l0-l2 total':38s} {t_stem + t_l2:8.3f} ms/iter")


if __name__ == "__main__":
    main()

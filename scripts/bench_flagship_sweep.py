"""Flagship (v8l) throughput sweep — VERDICT r3 #7.

Measures the detect+score e2e pipeline (bench.py bench_flagship) across:
  - batch size 96 / 112 / 128 (r2 shipped 96)
  - f32 vs bf16 param storage (weight HBM reads halve at bf16)
  - pre_nms_k 512 vs 256 (NMS tile count)

Run from /root/repo (axon registration): python scripts/bench_flagship_sweep.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

IMG, NC, ITERS = 640, 20, 8


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
    from ood_in_object_detection_tpu.models import build_model
    from ood_in_object_detection_tpu.ops import fused_detect
    from ood_in_object_detection_tpu.ood.scores import msp_score

    model = build_model("yolov8l", nc=NC, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames="train")(
        rng, jnp.zeros((1, IMG, IMG, 3), jnp.float32), train=False)
    v_bf16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables)
    thresholds = jnp.full((NC,), 0.5, jnp.float32)

    def make_pipeline(k):
        def pipeline(vs, images, i):
            x = (images + i.astype(jnp.uint8)).astype(jnp.float32) * (1.0 / 255.0)
            raw_levels, _ = model.apply(vs, x, train=False)
            det, logits = fused_detect(raw_levels, NC, jnp.float32(0.25),
                                       iou_thres=0.7, max_det=300, pre_nms_k=k)
            scores = msp_score(logits, det.cls)
            ood = jnp.where(det.valid,
                            (scores >= thresholds[det.cls]).astype(jnp.int32), 0)
            return det.conf.sum() + scores.sum() + ood.sum()
        return pipeline

    # r4 (VERDICT r3 #5b): fine batch sweep around the r3 optimum + mixed
    # per-region param storage (backbone bf16 / detect-head f32 — the head's
    # small convs pay the upcast worst) + k=384 + the corrected IoU default
    def _is_head(path):
        return any("detect" in str(k).lower() for k in path)

    v_mixed = jax.tree_util.tree_map_with_path(
        lambda p, x: (x if (_is_head(p) or x.dtype != jnp.float32)
                      else x.astype(jnp.bfloat16)), variables)

    cases = []
    for bsz in (112, 116, 120, 124, 128, 132, 136):
        cases.append((f"b{bsz} f32-params k512", bsz, variables, 512))
    cases.append(("b128 f32-params k384", 128, variables, 384))
    cases.append(("b128 f32-params k256", 128, variables, 256))
    cases.append(("b128 bf16-params k512", 128, v_bf16, 512))
    cases.append(("b128 mixed-params k512", 128, v_mixed, 512))

    for name, bsz, vs, k in cases:
        try:
            img = (jax.random.uniform(rng, (bsz, IMG, IMG, 3), jnp.float32)
                   * 255).astype(jnp.uint8)
            ms = timed(make_pipeline(k), vs, img)
            print(f"{name:24s} {ms:8.2f} ms  {bsz / ms * 1000:7.0f} img/s",
                  flush=True)
        except Exception as e:
            print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()

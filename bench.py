"""End-to-end throughput bench: YOLOv8n decode -> detect -> OoD-score.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures images/sec/chip for the full jitted pipeline (640x640 forward in
bf16, fixed-shape NMS, per-box logits gather + MSP scoring + threshold
decision) on the attached TPU. The reference publishes no throughput numbers
(BASELINE.md); vs_baseline is measured against a nominal 1000 img/s for the
reference's single-A100 torch predict+score loop (its per-box Python scoring
is host-bound), per BASELINE.json's ">=5x A100" north star.
"""

import json
import time

import jax
import jax.numpy as jnp

A100_REFERENCE_IMG_PER_SEC = 1000.0
BATCH = 32
IMG = 640
WARMUP = 3
ITERS = 20


def main():
    from ood_in_object_detection_tpu.models import build_model, model_forward
    from ood_in_object_detection_tpu.ops import batched_nms
    from ood_in_object_detection_tpu.ood.scores import msp_score

    model = build_model("yolov8n", nc=20, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (BATCH, IMG, IMG, 3), jnp.float32)
    variables = model.init(rng, images[:1], train=False)

    thresholds = jnp.full((20,), 0.5, jnp.float32)

    @jax.jit
    def pipeline(variables, images):
        out = model_forward(model, variables, images)
        det = batched_nms(out["boxes_xywh"], out["cls_logits"],
                          conf_thres=0.25, iou_thres=0.45, max_det=300, pre_nms_k=1024)
        logits = jnp.take_along_axis(out["cls_logits"], det.anchor_idx[..., None], axis=1)
        scores = msp_score(logits, det.cls)
        ood = jnp.where(det.valid, (scores >= thresholds[det.cls]).astype(jnp.int32), 0)
        return det.boxes, det.conf, det.cls, det.valid, scores, ood

    # warmup / compile
    for _ in range(WARMUP):
        out = pipeline(variables, images)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = pipeline(variables, images)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    ips = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "images_per_sec_per_chip_yolov8n_detect_score_e2e",
        "value": round(ips, 2),
        "unit": "img/s",
        "vs_baseline": round(ips / A100_REFERENCE_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()

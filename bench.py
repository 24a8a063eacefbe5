"""End-to-end throughput bench of the shipped inference paths.

Prints one JSON line per metric. The HEADLINE metric (v8n detect+score e2e)
runs and prints FIRST so a driver-side timeout can never lose it (round 4
lost 5 of 7 metrics to rc=124 because a >9 min metric ran third); every
metric after it runs under a SIGALRM wall-clock budget and a global
deadline (env ``BENCH_DEADLINE_S``, default 1500 s) — a metric that would
blow the budget is skipped with a stderr note instead of starving the rest.

1. ``detect_score_e2e`` (headline): 640x640 bf16 forward, lazy fused
   DFL decode + fixed-shape NMS, per-box MSP + threshold decision.
2. ``distance_eval_step``: the engine's REAL predict step — forward, fused
   detect, RoI-aligned + exact-position neck features, all three neck maps —
   plus a Cosine_cl_stride distance-method decision against a fitted-size
   centroid bank (3 centroids x 20 classes x 3 strides, Pallas MXU kernel).
   This is the step `cli/ood_eval.py` actually drives for distance methods
   (reference flow: ood_utils.py:428-582).
3. ``eul_host_ms_per_image``: host-side Enhanced Unknown Localization cost
   per image (saliency -> Otsu thresholds -> CC boxes -> postprocess) on a
   real P3 map (reference ood_utils.py:641-898).
4. train / flagship / latency, then ``distance_eul_eval_e2e`` — it is
   a pipeline-overlap metric, not a peak number, so it runs a slim config
   (batch 32 x 8 batches) that fits ~2 min even through the tunnel.
   The headline line is reprinted as the FINAL line so last-line parsers
   (the original one-JSON-line contract) also record it.

All device loops run ON DEVICE inside a single jit (lax.fori_loop with a
per-iteration input perturbation to defeat loop-invariant hoisting) and end
with a host fetch — the remote-dispatch tunnel used in this environment has
tens-of-ms per-call latency and a block_until_ready that returns early, so
per-dispatch host timing is meaningless; a fused device loop measures the
chip itself.

The reference publishes no throughput numbers (BASELINE.md); vs_baseline uses
a nominal 1000 img/s for the reference's single-A100 torch predict + per-box
host scoring loop, per BASELINE.json's ">=5x A100" north star.
"""

import json
import os
import signal
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# Persistent XLA compile cache: the bench's wall is dominated by ~7 cold
# model compiles (1-5 min each through the tunnel), not by the measured
# device loops (which all time AFTER their own warm-up). Caching compiled
# executables across runs is measurement-neutral and lets the whole bench
# fit any driver budget from the second run on. Repo-local dir (gitignored)
# so the driver's run on this machine hits the warm cache.
from ood_in_object_detection_tpu.utils.compile_cache import \
    enable_compilation_cache

enable_compilation_cache(os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".jax_compile_cache"))

A100_REFERENCE_IMG_PER_SEC = 1000.0
# batch 128 is the serving sweet spot on v5e (see CLAUDE.md perf notes).
# pre_nms_k=512 is ample headroom for conf 0.25 (max_det=300) and halves the
# NMS cost vs 1024; the engine default stays 1024 for low-threshold sweeps.
BATCH = 128
IMG = 640
LOOP_ITERS = 16
PRE_NMS_K = 512
NC = 20


_T0 = time.monotonic()
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "1500"))


class _BudgetExceeded(BaseException):
    # BaseException so per-metric `except Exception` fallbacks (e.g. the
    # batch-size ladder in _bench_detect_score) cannot swallow the budget
    # alarm and keep running unbounded
    pass


def _budgeted(name, budget_s, fn, *args):
    """Run one metric under a wall-clock budget (SIGALRM) and the global
    deadline. On overrun: stderr note, keep going — a slow metric must
    never starve the ones after it (round-4 rc=124 post-mortem)."""
    remaining = DEADLINE_S - (time.monotonic() - _T0)
    if remaining < 30:
        print(f"{name}: skipped, global deadline "
              f"({DEADLINE_S:.0f}s) nearly spent", file=sys.stderr)
        return None
    limit = int(min(budget_s, remaining))

    def _raise(signum, frame):
        raise _BudgetExceeded()

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(limit)
    t0 = time.monotonic()
    try:
        out = fn(*args)
        print(f"{name}: {time.monotonic() - t0:.0f}s (budget {limit}s)",
              file=sys.stderr)
        return out
    except _BudgetExceeded:
        print(f"{name}: exceeded {limit}s budget, skipped", file=sys.stderr)
        return None
    except Exception:
        import traceback
        print(f"{name}: failed:", file=sys.stderr)
        traceback.print_exc()
        return None
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def device_loop_ms(pipeline, *args, iters=None):
    """Time `pipeline(*args, i) -> f32 scalar` on device; returns ms/iter.

    `iters` overrides LOOP_ITERS — small per-iteration pipelines (batch-1
    latency) need many iterations so the ~25 ms tunnel dispatch noise
    amortizes out of the per-iter figure."""
    n = LOOP_ITERS if iters is None else iters

    @jax.jit
    def bench_loop(args, iters):
        def body(i, acc):
            return acc + pipeline(*args, i)

        return lax.fori_loop(0, iters, body, jnp.float32(0.0))

    _ = float(bench_loop(args, 2))
    # best-of-3 timed runs: transient host/tunnel noise only ever ADDS time,
    # so the minimum is the closest observation of the chip's steady rate
    dt = min(_timed(bench_loop, args, n) for _ in range(3))
    overhead = min(_timed(bench_loop, args, 1) for _ in range(3))
    compute = max(dt - max(overhead - dt / n, 0.0), 1e-9)
    return compute / n * 1000.0


def _timed(fn, args, iters) -> float:
    t0 = time.perf_counter()
    _ = float(fn(args, iters))  # host fetch = sync
    return time.perf_counter() - t0


def make_distance_method(neck_cmax: int):
    """Cosine_cl_stride with a synthetic fitted state of realistic size."""
    from ood_in_object_detection_tpu.ood.methods import DistanceOODMethod

    rng = np.random.default_rng(0)
    clusters = []
    for _ in range(NC):
        row = []
        for _ in range(3):
            c = rng.normal(size=(3, neck_cmax)).astype(np.float32)
            row.append(c / np.linalg.norm(c, axis=-1, keepdims=True))
        clusters.append(row)
    m = DistanceOODMethod.from_name("Cosine_cl_stride", cluster_method="all")
    m.clusters = clusters
    m.thresholds = [[0.3] * 3 for _ in range(NC)]
    return m


def bench_distance_step():
    from ood_in_object_detection_tpu.engine import Detector
    from ood_in_object_detection_tpu.ood.distance import l2_normalize_rows

    det = Detector.create("yolov8n", nc=NC, img_size=IMG, dtype=jnp.bfloat16)
    method = make_distance_method(256)
    thr = method.packed_thresholds()
    step = det._jitted_step(iou_thres=0.7, max_det=300, pre_nms_k=PRE_NMS_K)

    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (BATCH, IMG, IMG, 3), jnp.float32)

    def pipeline(variables, images, thr, i):
        x = images + i.astype(jnp.float32) * 1e-9
        out = step(variables, x, jnp.float32(0.25))
        b, k, d = out.roi_feats.shape
        feats = l2_normalize_rows(out.roi_feats.reshape(b * k, d).astype(jnp.float32))
        dist = method.distances(feats, out.det.cls.reshape(-1),
                                out.stride_level.reshape(-1))
        ind = (dist.reshape(b, k) < thr[out.det.cls, out.stride_level])
        ood = jnp.where(out.det.valid, ind.astype(jnp.int32), 0)
        # consume every tap the real eval step ships (exact feats + neck maps)
        neck_sum = sum(jnp.sum(f.astype(jnp.float32)) for f in out.neck)
        return (out.det.conf.sum() + dist.sum() + ood.sum()
                + jnp.sum(out.exact_feats.astype(jnp.float32)) + neck_sum)

    ms = device_loop_ms(pipeline, det.variables, images, thr)
    ips = BATCH / ms * 1000.0
    print(json.dumps({
        "metric": "images_per_sec_yolov8n_distance_eval_step",
        "value": round(ips, 2),
        "unit": "img/s",
        "vs_baseline": round(ips / A100_REFERENCE_IMG_PER_SEC, 3),
        "baseline": "1000 img/s nominal single-A100 torch predict+host scoring (BASELINE.json north star)",
    }))
    return det


def bench_eul_host(det):
    """EUL cost per image on the shipped split: batched DEVICE front-end
    (saliency + recursive-Otsu thresholds, one jitted call per batch of 64)
    + the remaining HOST stages (CC boxes + postprocess). The metric keeps
    its historical name; until round 3 all four stages ran on the host
    (r2 driver: 3.835 ms/img)."""
    from ood_in_object_detection_tpu.ood.unknown import (
        eul_frontend_batched, unknown_proposals_for_image)

    rng = jax.random.PRNGKey(1)
    images = jax.random.uniform(rng, (8, IMG, IMG, 3), jnp.float32)
    out = det.predict(images, conf_thres=0.25, pre_nms_k=PRE_NMS_K)
    # 64 maps amortize the tunnel's ~25 ms dispatch as a real sweep would.
    # P3 stays ON DEVICE for the front-end (as in the pipeline, where it is
    # a fresh predict output) — only the (B, H, W) saliency crosses the wire.
    p3_dev = jnp.tile(out.neck[0].astype(jnp.float32), (8, 1, 1, 1))
    p3 = np.asarray(p3_dev)
    boxes = np.tile(np.asarray(out.det.boxes, np.float32), (8, 1, 1))
    valid = np.tile(np.asarray(out.det.valid), (8, 1))
    ratio_pads = [((1.0, 1.0), (0.0, 0.0))] * len(p3)

    n_imgs, reps = p3.shape[0], 4
    eul_frontend_batched(p3_dev, ratio_pads)  # compile outside the timed loop
    t0 = time.perf_counter()
    for _ in range(reps):
        # None when the configured summarizer/thresholding has no device
        # implementation — fall back to the all-host path, as the pipeline does
        fe = eul_frontend_batched(p3_dev, ratio_pads)
        for b in range(n_imgs):
            unknown_proposals_for_image(p3[b], ratio_pads[b],
                                        boxes[b][valid[b]],
                                        precomputed=None if fe is None
                                        else fe[b])
    ms = (time.perf_counter() - t0) / (reps * n_imgs) * 1000.0
    print(json.dumps({
        "metric": "eul_host_ms_per_image",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(ms / 100.0, 3),
        "baseline": "100 ms/img class of the reference's all-host EUL loop (ood_utils.py:641-932)",
    }))


def bench_distance_eul_e2e(det):
    """Combined distance+EUL eval throughput through the REAL pipeline loop
    (ood/pipeline.py evaluate_method): device forward + fused detect + RoI
    taps + distance decide + device EUL front-end for batch i+1 overlapped
    with batch i's host CC/postprocess + metric accumulation (VERDICT r3 #6).
    Wall-clock over the full call with state carried into compute_metrics —
    nothing is DCE-able. The reference runs this loop entirely on the host
    (ood_utils.py:428-932).

    SLIM config (batch 32 x 8 batches, 1 warm batch): this is a
    pipeline-OVERLAP metric, not a peak-throughput number — at batch 128 x
    9 batches the neck-tap fetches through the ~25 ms/dispatch tunnel alone
    exceeded 9 min and timed out the round-4 driver run (VERDICT r4 weak #1).
    Peak chip throughput for the same step lives in distance_eval_step."""
    from ood_in_object_detection_tpu.ood.methods import DistanceOODMethod
    from ood_in_object_detection_tpu.ood.pipeline import evaluate_method

    eul_bs = 32
    dims = det.neck_channels()
    rng = np.random.default_rng(0)
    clusters = []
    for _ in range(NC):
        row = []
        for s in range(3):
            c = rng.normal(size=(3, dims[s])).astype(np.float32)
            row.append(c / np.linalg.norm(c, axis=-1, keepdims=True))
        clusters.append(row)
    method = DistanceOODMethod.from_name("Cosine_cl_stride", cluster_method="all")
    method.clusters = clusters
    method.thresholds = [[0.3] * 3 for _ in range(NC)]

    def make_batches(n_batches, bs):
        out = []
        # device-resident input feed, like every other metric's on-device
        # loop: a host-NumPy batch would re-upload 157 MB per step(images)
        # call, and through this environment's ~8 MB/s tunnel that H2D alone
        # is ~20 s/batch — 93 % of wall, measuring the wire instead of the
        # pipeline (PERF.md r5 "EUL e2e post-mortem"; production feeds are
        # local PCIe + parallel.prefetch_to_device)
        imgs = jax.device_put(jax.random.uniform(
            jax.random.PRNGKey(7), (bs, IMG, IMG, 3), jnp.float32))
        imgs.block_until_ready()
        for k in range(n_batches):
            out.append(dict(
                images=imgs, im_names=[f"b{k}_{i}" for i in range(bs)],
                batch_mask=np.ones(bs, bool),
                ratio_pad=[((1.0, 1.0), (0.0, 0.0))] * bs,
                gt_bboxes=np.tile(np.array([[100, 100, 260, 280]], np.float32),
                                  (bs, 1, 1)),
                gt_labels=np.zeros((bs, 1), np.int32),
                gt_mask=np.ones((bs, 1), bool)))
        return out

    kw = dict(known_classes=list(range(NC)),
              class_names=[f"c{i}" for i in range(NC)] + ["unknown"],
              conf_thr_test=0.25, enhanced_unk_localization=True)
    evaluate_method(det, make_batches(1, eul_bs), method, **kw)  # compile warm
    # 8 timed batches (~15 s at the measured 1.8 s/batch): amortizes the
    # per-dispatch tunnel jitter without risking the 300 s budget
    n_batches = 8
    t0 = time.perf_counter()
    evaluate_method(det, make_batches(n_batches, eul_bs), method, **kw)
    wall = time.perf_counter() - t0
    ips = n_batches * eul_bs / wall
    # Apples-to-apples nominal: the reference's EUL eval loop is its predict
    # (1000 img/s A100 north-star class) PLUS its all-host per-image EUL
    # chain (~100 ms/img class, same denominator as eul_host_ms_per_image's
    # baseline) run serially => 1/(1/1000 + 0.100) ~= 9.9 img/s e2e. The
    # plain 1000 img/s denominator would compare our EUL-included loop to a
    # reference number that excludes EUL entirely.
    ref_eul_e2e = 1.0 / (1.0 / A100_REFERENCE_IMG_PER_SEC + 0.100)
    print(json.dumps({
        "metric": "images_per_sec_yolov8n_distance_eul_eval_e2e",
        "value": round(ips, 2),
        "unit": "img/s",
        "baseline": "9.9 img/s nominal reference EUL e2e: 1000 img/s predict "
                    "+ 100 ms/img all-host EUL chain (ood_utils.py:641-932), serial",
        "note": "wall-clock through this environment's ~25 ms/dispatch, "
                "~8 MB/s tunnel; chip-side pipeline is ~1.8 s/batch-32 "
                "(PERF.md r5 EUL e2e post-mortem)",
        "vs_baseline": round(ips / ref_eul_e2e, 3),
    }))


def _detect_score_pipeline(model):
    """u8-input forward + fused detect + MSP + threshold decide closure.

    uint8 input is the serving-path dtype (4x less PCIe; normalize on
    device); the per-iteration perturbation stays in u8 so the anti-hoisting
    pass costs u8 traffic, as a real input feed would."""
    from ood_in_object_detection_tpu.ops import fused_detect
    from ood_in_object_detection_tpu.ood.scores import msp_score

    thresholds = jnp.full((NC,), 0.5, jnp.float32)

    def pipeline(variables, images, i):
        x = (images + i.astype(jnp.uint8)).astype(jnp.float32) * (1.0 / 255.0)
        raw_levels, _ = model.apply(variables, x, train=False)
        det, logits = fused_detect(raw_levels, NC, jnp.float32(0.25),
                                   iou_thres=0.7, max_det=300,
                                   pre_nms_k=PRE_NMS_K)
        scores = msp_score(logits, det.cls)
        ood = jnp.where(det.valid, (scores >= thresholds[det.cls]).astype(jnp.int32), 0)
        return det.conf.sum() + scores.sum() + ood.sum()

    return pipeline


def _bench_detect_score(name: str, metric: str, batch_sizes):
    """Build the model once, time the detect+score pipeline at the first
    batch size that fits, print the metric JSON line."""
    import sys
    import traceback

    from ood_in_object_detection_tpu.models import build_model

    model = build_model(name, nc=NC, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames="train")(
        rng, jnp.zeros((1, IMG, IMG, 3), jnp.float32), train=False)
    pipeline = _detect_score_pipeline(model)
    for bsz in batch_sizes:
        try:
            images = (jax.random.uniform(rng, (bsz, IMG, IMG, 3), jnp.float32)
                      * 255).astype(jnp.uint8)
            ms = device_loop_ms(pipeline, variables, images)
            ips = bsz / ms * 1000.0
            line = {
                "metric": metric,
                "value": round(ips, 2),
                "unit": "img/s",
                "vs_baseline": round(ips / A100_REFERENCE_IMG_PER_SEC, 3),
                "batch": bsz,
            }
            print(json.dumps(line))
            return line
        except Exception:
            print(f"{metric} failed at batch {bsz}:", file=sys.stderr)
            traceback.print_exc()
    print(f"{metric}: all batch sizes failed", file=sys.stderr)
    return None


def bench_headline():
    return _bench_detect_score(
        "yolov8n", "images_per_sec_per_chip_yolov8n_detect_score_e2e",
        (BATCH, 32))


def bench_flagship():
    """YOLOv8l (the paper's model, BASELINE.md) detect+score e2e.

    Batch 128 is the measured v5e sweet spot for l-scale too
    (scripts/bench_flagship_sweep.py: 96/112/128 -> 828/845/887 img/s;
    144+ collapses to ~500 on HBM pressure; bf16 param storage loses
    ~8% to per-use upcasts)."""
    _bench_detect_score("yolov8l", "images_per_sec_yolov8l_flagship_e2e",
                        (BATCH, 96, 32))


def bench_train_step(name="yolov8n", metric="train_images_per_sec_yolov8n_640_bf16",
                     batch_sizes=None, iters=LOOP_ITERS):
    """Training throughput: the full TAL+CIoU/DFL/BCE train step (fwd+bwd+
    SGD+EMA) on the bf16 AMP-equivalent path (--dtype bfloat16 of
    cli/train.py), reference engine/trainer.py loop.

    The TrainState is the fori_loop CARRY: every param/opt leaf feeds the
    next iteration's forward, so XLA cannot dead-code-eliminate any of the
    backward. (An earlier probe observed only leaves[:8] of the params on a
    non-carried state; flatten order puts the detect-head leaves first, so
    the whole backbone backward was DCE-able — it measured 4064 img/s where
    the honest carried loop measures ~1500. Real training serializes on the
    params exactly as the carry does.)"""
    from ood_in_object_detection_tpu.models import build_model
    from ood_in_object_detection_tpu.train import TrainConfig, init_state, train_step

    model = build_model(name, nc=NC, dtype=jnp.bfloat16)
    cfg = TrainConfig(epochs=10, steps_per_epoch=100)
    rng = jax.random.PRNGKey(0)
    m = 16

    for batch_sz in (batch_sizes or (BATCH, max(BATCH // 4, 8))):
        try:
            images = jax.random.uniform(rng, (batch_sz, IMG, IMG, 3), jnp.float32)
            state = init_state(model, cfg, rng, images[:1])
            batch = {
                "images": images,
                "gt_labels": jnp.zeros((batch_sz, m), jnp.int32),
                "gt_bboxes": jnp.tile(jnp.asarray([[32.0, 32.0, 256.0, 256.0]]),
                                      (batch_sz, m, 1)),
                "gt_mask": jnp.ones((batch_sz, m), bool).at[:, 4:].set(False),
            }

            @jax.jit
            def loop(state, b0, iters):
                def body(i, st):
                    b = dict(b0)
                    b["images"] = b0["images"] + i.astype(jnp.float32) * 1e-9
                    st2, _ = train_step(model, cfg, st, b)
                    return st2
                final = lax.fori_loop(0, iters, body, state)
                return sum(jnp.sum(l.astype(jnp.float32))
                           for l in jax.tree_util.tree_leaves(final.params))

            _ = float(loop(state, batch, 2))
            dt = min(_timed(lambda a, n: loop(*a, n), (state, batch), iters)
                     for _ in range(3))
            ov = min(_timed(lambda a, n: loop(*a, n), (state, batch), 1)
                     for _ in range(3))
            ms = max(dt - max(ov - dt / iters, 0.0), 1e-9) / iters * 1000.0
            ips = batch_sz / ms * 1000.0
            print(json.dumps({
                "metric": metric,
                "value": round(ips, 2),
                "unit": "img/s",
                "vs_baseline": round(ips / 250.0, 3),
                "baseline": "250 img/s nominal single-A100 v8n@640 torch train step (distinct from the 1000 img/s detect+score north star)",
                "batch": batch_sz,
            }))
            return
        except Exception:
            import sys
            import traceback

            print(f"train bench failed at batch {batch_sz}:", file=sys.stderr)
            traceback.print_exc()


def bench_train_flagship():
    """YOLOv8l training throughput (the model the paper trains,
    replicate/train.sh). NOT in main(): the v8l train-step compile alone
    exceeds 15 min through the tunnel, which would risk the driver's bench
    window; the measured envelope lives in PERF.md ("Flagship training on
    one 16 GB v5e": 227 img/s b16, compute-bound, remat = fit lever).
    Run manually: python -c 'import bench; bench.bench_train_flagship()'."""
    bench_train_step("yolov8l", "train_images_per_sec_yolov8l_flagship",
                     batch_sizes=(32, 16), iters=8)


def bench_latency_b1():
    """Interactive-serving latency: batch-1 u8 640px forward + fused detect
    + NMS + MSP decide, ms per image ON THE CHIP (128-iteration device loop
    so the tunnel's ~25 ms dispatch noise amortizes to <0.2 ms/iter).
    Nominal baseline: ~10 ms for the reference's single-image A100 torch
    predict + host scoring (BASELINE.md publishes no latency numbers)."""
    import sys
    import traceback

    from ood_in_object_detection_tpu.models import build_model

    try:
        model = build_model("yolov8n", nc=NC, dtype=jnp.bfloat16)
        rng = jax.random.PRNGKey(0)
        variables = jax.jit(model.init, static_argnames="train")(
            rng, jnp.zeros((1, IMG, IMG, 3), jnp.float32), train=False)
        pipeline = _detect_score_pipeline(model)
        images = (jax.random.uniform(rng, (1, IMG, IMG, 3), jnp.float32)
                  * 255).astype(jnp.uint8)
        ms = device_loop_ms(pipeline, variables, images, iters=128)
        print(json.dumps({
            "metric": "latency_ms_yolov8n_batch1_e2e",
            "value": round(ms, 3),
            "unit": "ms",
            "vs_baseline": round(10.0 / ms, 3),
            "baseline": "10 ms nominal A100 batch-1 predict dispatch",
        }))
    except Exception:
        print("latency bench failed:", file=sys.stderr)
        traceback.print_exc()


def main():
    # HEADLINE FIRST: a driver-side timeout must never lose it (round 4
    # lost 5/7 metrics to rc=124 with the old third-place ordering).
    headline = _budgeted("headline", 600, bench_headline)
    det = _budgeted("distance_eval_step", 420, bench_distance_step)
    if det is not None:
        _budgeted("eul_host", 240, bench_eul_host, det)
    _budgeted("train_step", 360, bench_train_step)
    _budgeted("flagship", 420, bench_flagship)
    _budgeted("latency_b1", 180, bench_latency_b1)
    # the pipeline-overlap metric runs second-to-last on its slim config:
    # losing it to the deadline costs one metric instead of five.
    if det is not None:
        _budgeted("distance_eul_e2e", 300, bench_distance_eul_e2e, det)
    # Reprint the headline as the FINAL line too: last-line parsers (the
    # original one-JSON-line contract) and first-line parsers both record it.
    if headline is not None:
        print(json.dumps(headline))


if __name__ == "__main__":
    main()

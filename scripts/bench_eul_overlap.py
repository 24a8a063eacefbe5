"""EUL eval host/device overlap delta (VERDICT r3 #6, PERF.md evidence).

Times the REAL evaluate_method loop (distance decide + EUL) twice:
overlap=True (shipped one-deep launch/consume pipeline) vs overlap=False
(serial per-batch), same batches, same method, wall-clock.

Run from /root/repo (axon registration): python scripts/bench_eul_overlap.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np


def main():
    import bench
    from ood_in_object_detection_tpu.engine import Detector
    from ood_in_object_detection_tpu.ood.methods import DistanceOODMethod
    from ood_in_object_detection_tpu.ood.pipeline import evaluate_method

    # SLIM config (r5): batch 128 x 8 batches x 3 reps never finished
    # through the ~25 ms/dispatch tunnel (>10 min; same failure mode as the
    # r4 bench_distance_eul_e2e timeout). The overlap delta is a PIPELINE
    # property, not a peak number — batch 32 x 6 batches measures it in
    # ~2 min and matches bench.py's slim EUL config.
    IMG, NC = bench.IMG, bench.NC
    BATCH = 32
    det = Detector.create("yolov8n", nc=NC, img_size=IMG, dtype=jnp.bfloat16)
    dims = det.neck_channels()
    rng = np.random.default_rng(0)
    clusters = [[(lambda c: c / np.linalg.norm(c, axis=-1, keepdims=True))(
        rng.normal(size=(3, dims[s])).astype(np.float32)) for s in range(3)]
        for _ in range(NC)]
    method = DistanceOODMethod.from_name("Cosine_cl_stride", cluster_method="all")
    method.clusters = clusters
    method.thresholds = [[0.3] * 3 for _ in range(NC)]

    import jax

    # device-resident feed, matching bench_distance_eul_e2e: through this
    # environment's ~8 MB/s tunnel a host-NumPy batch costs ~20 s of H2D per
    # step call, drowning the overlap delta in wire time (PERF.md r5 EUL e2e
    # post-mortem). Overlap is a device-compute-vs-host-CC property.
    imgs = jax.device_put(jax.random.uniform(
        jax.random.PRNGKey(7), (BATCH, IMG, IMG, 3), jnp.float32))
    imgs.block_until_ready()

    def make_batches(n):
        return [dict(images=imgs, im_names=[f"b{k}_{i}" for i in range(BATCH)],
                     batch_mask=np.ones(BATCH, bool),
                     ratio_pad=[((1.0, 1.0), (0.0, 0.0))] * BATCH,
                     gt_bboxes=np.tile(np.array([[100, 100, 260, 280]],
                                                np.float32), (BATCH, 1, 1)),
                     gt_labels=np.zeros((BATCH, 1), np.int32),
                     gt_mask=np.ones((BATCH, 1), bool))
                for k in range(n)]

    kw = dict(known_classes=list(range(NC)),
              class_names=[f"c{i}" for i in range(NC)] + ["unknown"],
              conf_thr_test=0.25, enhanced_unk_localization=True)
    print("compile-warm start", flush=True)
    t0 = time.perf_counter()
    evaluate_method(det, make_batches(1), method, **kw)  # compile warm
    print(f"compile-warm {time.perf_counter()-t0:.1f}s", flush=True)
    out = {}
    for tag, ov in (("overlap", True), ("serial", False)):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            evaluate_method(det, make_batches(6), method, overlap=ov, **kw)
            dt = time.perf_counter() - t0
            print(f"{tag} rep {dt:.2f}s", flush=True)
            best = min(best, dt)
        out[tag] = round(6 * BATCH / best, 1)
        print(json.dumps({"variant": tag, "img_per_sec": out[tag]}), flush=True)
    print(json.dumps({"overlap_speedup": round(out["overlap"] / out["serial"], 4)}))


if __name__ == "__main__":
    main()

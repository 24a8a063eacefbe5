"""Phase-timing probe for bench.bench_distance_eul_e2e's slowness.

Reproduces the bench config (v8n, batch 32, Cosine_cl_stride, EUL on) and
times each phase of evaluate_method's loop separately on the real chip.
Run from /root/repo: python scripts/probe_eul_e2e.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ood_in_object_detection_tpu.engine import Detector
from ood_in_object_detection_tpu.ood.methods import DistanceOODMethod
from ood_in_object_detection_tpu.ood import pipeline as P

IMG = 640
NC = 80


def main():
    det = Detector.create("yolov8n", nc=NC, img_size=IMG)
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

    bs = 32
    imgs = jax.device_put(jax.random.uniform(
        jax.random.PRNGKey(7), (bs, IMG, IMG, 3), jnp.float32))
    imgs.block_until_ready()
    ratio_pads = [((1.0, 1.0), (0.0, 0.0))] * bs

    neck_ch = det.neck_channels()
    step = P._predict_step(det, 0.25)
    rank_bank = P._stride0_rank_bank(method, neck_ch[0])
    print("rank_bank is None:", rank_bank is None)

    # warm
    t = time.perf_counter()
    out = step(imgs)
    jax.block_until_ready(out.det.boxes)
    print(f"step compile+run: {time.perf_counter()-t:.2f}s")

    for it in range(3):
        t0 = time.perf_counter()
        out = step(imgs)
        dec_dev = P._decisions_for_method(method, out, neck_ch, want_scores=False)
        disp = P.eul_frontend_dispatch(out.p3, ratio_pads)
        jax.block_until_ready(dec_dev)
        t1 = time.perf_counter()
        decisions = P._np(dec_dev)
        boxes = P._np(out.det.boxes); confs = P._np(out.det.conf)
        cls = P._np(out.det.cls); valid = P._np(out.det.valid)
        t2 = time.perf_counter()
        fe = P.eul_frontend_finish(disp)
        t3 = time.perf_counter()
        print("fe is None:", fe is None)
        nvalid = [int(valid[i].sum()) for i in range(bs)]
        print("valid boxes/img:", min(nvalid), max(nvalid))
        pred_by_img = {i: boxes[i, :nvalid[i]].astype(np.float64) for i in range(bs)}
        from ood_in_object_detection_tpu.ood.unknown import unknown_candidates_for_image
        cand = {i: unknown_candidates_for_image(
            None, ratio_pads[i], pb, precomputed=fe[i],
            padded_hw=tuple(out.p3.shape[1:3])) for i, pb in pred_by_img.items()}
        t4 = time.perf_counter()
        ncand = [len(c) for c in cand.values()]
        print("candidates/img:", min(ncand), max(ncand), "sum", sum(ncand))
        eul_batch = P._eul_proposals_batch(
            method, rank_bank, out.p3, tuple(out.p3.shape[1:3]),
            fe, ratio_pads, pred_by_img, None)
        t5 = time.perf_counter()
        print(f"iter{it}: launch+decide {t1-t0:.2f}s fetch_small {t2-t1:.2f}s "
              f"fe_finish {t3-t2:.2f}s host_cc {t4-t3:.2f}s rank_batch {t5-t4:.2f}s "
              f"total {t5-t0:.2f}s")


def main_matrix_ab():
    """A/B: force the matrix-fetch rank path (as if the op had no device
    reduction) by emptying _DEVICE_RANK_OPS, so rank_batch's wire cost can
    be attributed (10.5 MB matrix D2H vs 0.13 MB reduced scores)."""
    P._DEVICE_RANK_OPS = ()
    main()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "matrix":
        main_matrix_ab()
    else:
        main()

"""Standalone exported-model inference demo.

Capability parity with the reference's C++ ONNX/OpenCV example
(examples/YOLOv8-CPP-Inference/{main,inference}.cpp): export the full predict
step (forward + fused detect + NMS + OoD taps) to a self-contained
jax.export artifact, then load it back WITHOUT any framework model code and
run detection — the artifact embeds weights and the whole compiled program,
consumable by any PJRT runtime (TPU/CPU/GPU) or, via its embedded StableHLO
module, by IREE/XLA-AOT toolchains.

Usage:
  python examples/exported_inference_demo.py [--model yolov8n] [--nc 20]
      [--img 320] [--checkpoint DIR] [--out model.jaxexport]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--model", default="yolov8n")
    ap.add_argument("--nc", type=int, default=20)
    ap.add_argument("--img", type=int, default=320)
    ap.add_argument("--checkpoint", default=None,
                    help="orbax checkpoint dir to load weights from")
    ap.add_argument("--out", default="/tmp/ood_demo.jaxexport")
    args = ap.parse_args(argv)

    from ood_in_object_detection_tpu.engine import Detector
    from ood_in_object_detection_tpu.utils.export import export_serialized

    variables = None
    if args.checkpoint:
        from ood_in_object_detection_tpu.core.checkpoint import load_checkpoint

        variables, _ = load_checkpoint(args.checkpoint)
    det = Detector.create(args.model, nc=args.nc, img_size=args.img,
                          variables=variables)

    # 1. export: weights + compiled program in one artifact
    p = export_serialized(det, args.out)
    print(f"exported {args.model} predict step -> {p} "
          f"({p.stat().st_size/1e6:.1f} MB)")

    # 2. load back with zero model code and run
    from jax import export as jexport

    exported = jexport.deserialize(p.read_bytes())
    images = jax.random.uniform(jax.random.PRNGKey(0),
                                (1, args.img, args.img, 3), jnp.float32)
    t0 = time.perf_counter()
    out = exported.call(images)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    boxes, conf, cls, valid = (np.asarray(out.det.boxes[0]),
                               np.asarray(out.det.conf[0]),
                               np.asarray(out.det.cls[0]),
                               np.asarray(out.det.valid[0]))
    n = int(valid.sum())
    print(f"ran exported program in {dt*1e3:.1f} ms: {n} detections")
    for i in np.argsort(-conf)[:5]:
        if valid[i]:
            print(f"  cls={int(cls[i]):2d} conf={conf[i]:.3f} "
                  f"box={np.round(boxes[i], 1).tolist()}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

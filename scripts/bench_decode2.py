"""TPU experiments: NHWC-space DFL decode + narrow gathers vs alternatives."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

BATCH = 128
ITERS = 16


def timed(name, fn, *args):
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
    print(f"{name:46s} {ms:8.3f} ms   {BATCH/ms*1000:9.1f} img/s")
    return ms


def nhwc_dfl_boxes(f, stride, reg_max=16):
    """(B,H,W,64+nc) -> (B,H,W,4) xyxy boxes in pixels, no lane-splitting."""
    b, h, w, _ = f.shape
    x = f[..., : 4 * reg_max].astype(jnp.float32)
    cmax = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - cmax)
    bins = np.arange(reg_max, dtype=np.float32)
    bd = np.zeros((4 * reg_max, 4), np.float32)
    od = np.zeros((4 * reg_max, 4), np.float32)
    for k in range(4):
        bd[k * reg_max:(k + 1) * reg_max, k] = bins
        od[k * reg_max:(k + 1) * reg_max, k] = 1.0
    num = e @ jnp.asarray(bd)
    den = e @ jnp.asarray(od)
    dist = num / den                       # (B,H,W,4) ltrb grid units
    gx = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, None, :]
    gy = (jnp.arange(h, dtype=jnp.float32) + 0.5)[None, :, None]
    x1 = (gx - dist[..., 0]) * stride
    y1 = (gy - dist[..., 1]) * stride
    x2 = (gx + dist[..., 2]) * stride
    y2 = (gy + dist[..., 3]) * stride
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def main():
    from ood_in_object_detection_tpu.models import build_model
    from ood_in_object_detection_tpu.ood.scores import msp_score
    from ood_in_object_detection_tpu.ops.nms import suppress_and_select

    REG_MAX = 16
    rng = jax.random.PRNGKey(0)
    model = build_model("yolov8n", nc=20, dtype=jnp.bfloat16)
    img = jax.random.uniform(rng, (BATCH, 640, 640, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames="train")(rng, img[:1], train=False)

    def nhwc_pipe(v, x, i):
        """Per-level NHWC decode; gather only narrow tensors."""
        x = x + i.astype(jnp.float32) * 1e-9
        out = model.apply(v, x, train=False)
        raw = out[0]
        b = raw[0].shape[0]
        strides = (8, 16, 32)
        confs, clss, boxes = [], [], []
        for f, s in zip(raw, strides):
            cl = f[..., 4 * REG_MAX:].astype(jnp.float32)
            confs.append(cl.max(axis=-1).reshape(b, -1))
            clss.append(cl.argmax(axis=-1).astype(jnp.int32).reshape(b, -1))
            boxes.append(nhwc_dfl_boxes(f, s).reshape(b, -1, 4))
        conf_all = jax.nn.sigmoid(jnp.concatenate(confs, axis=1))
        cls_all = jnp.concatenate(clss, axis=1)
        box_all = jnp.concatenate(boxes, axis=1)
        masked = jnp.where(conf_all > 0.25, conf_all, -1.0)
        top_conf, top_idx = lax.top_k(masked, 512)
        top_boxes = jnp.take_along_axis(box_all, top_idx[..., None], axis=1)
        top_cls = jnp.take_along_axis(cls_all, top_idx, axis=1)

        def single(tb, tc, tcl, ti):
            return suppress_and_select(tb, tc, tcl, ti, jnp.float32(0.25),
                                       0.45, 300, False)

        det, sel = jax.vmap(single)(top_boxes, top_conf, top_cls, top_idx)
        return det.conf.sum()

    def nhwc_pipe_msp(v, x, i):
        """+ logits gather for the final max_det rows + msp."""
        x = x + i.astype(jnp.float32) * 1e-9
        out = model.apply(v, x, train=False)
        raw = out[0]
        b = raw[0].shape[0]
        strides = (8, 16, 32)
        confs, clss, boxes, logits = [], [], [], []
        for f, s in zip(raw, strides):
            cl = f[..., 4 * REG_MAX:].astype(jnp.float32)
            confs.append(cl.max(axis=-1).reshape(b, -1))
            clss.append(cl.argmax(axis=-1).astype(jnp.int32).reshape(b, -1))
            boxes.append(nhwc_dfl_boxes(f, s).reshape(b, -1, 4))
            logits.append(cl.reshape(b, -1, cl.shape[-1]))
        conf_all = jax.nn.sigmoid(jnp.concatenate(confs, axis=1))
        cls_all = jnp.concatenate(clss, axis=1)
        box_all = jnp.concatenate(boxes, axis=1)
        log_all = jnp.concatenate(logits, axis=1)
        masked = jnp.where(conf_all > 0.25, conf_all, -1.0)
        top_conf, top_idx = lax.top_k(masked, 512)
        top_boxes = jnp.take_along_axis(box_all, top_idx[..., None], axis=1)
        top_cls = jnp.take_along_axis(cls_all, top_idx, axis=1)

        def single(tb, tc, tcl, ti):
            return suppress_and_select(tb, tc, tcl, ti, jnp.float32(0.25),
                                       0.45, 300, False)

        det, sel = jax.vmap(single)(top_boxes, top_conf, top_cls, top_idx)
        dl = jnp.take_along_axis(log_all, det.anchor_idx[..., None], axis=1)
        scores = msp_score(dl, det.cls)
        return det.conf.sum() + scores.sum()

    timed("nhwc decode + narrow gathers + nms", nhwc_pipe, variables, img)
    timed("nhwc decode + nms + logits gather + msp", nhwc_pipe_msp, variables, img)


if __name__ == "__main__":
    main()

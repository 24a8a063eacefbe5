"""Quick TPU A/B: full-decode pipeline vs lazy top-k fused detect, f32 vs u8."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 128
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
    print(f"{name:44s} {ms:8.3f} ms   {BATCH/ms*1000:9.1f} img/s")
    return ms


def main():
    from ood_in_object_detection_tpu.models import build_model, model_forward
    from ood_in_object_detection_tpu.ops import batched_nms, fused_detect
    from ood_in_object_detection_tpu.ood.scores import msp_score

    rng = jax.random.PRNGKey(0)
    model = build_model("yolov8n", nc=20, dtype=jnp.bfloat16)
    img = jax.random.uniform(rng, (BATCH, 640, 640, 3), jnp.float32)
    img_u8 = (img * 255).astype(jnp.uint8)
    variables = jax.jit(model.init, static_argnames="train")(rng, img[:1], train=False)
    thresholds = jnp.full((20,), 0.5, jnp.float32)

    def old_pipe(v, x, i):
        x = x + i.astype(jnp.float32) * 1e-9
        out = model_forward(model, v, x)
        det = batched_nms(out["boxes_xywh"], out["cls_logits"],
                          conf_thres=0.25, iou_thres=0.45, max_det=300, pre_nms_k=512)
        logits = jnp.take_along_axis(out["cls_logits"], det.anchor_idx[..., None], axis=1)
        scores = msp_score(logits, det.cls)
        ood = jnp.where(det.valid, (scores >= thresholds[det.cls]).astype(jnp.int32), 0)
        return det.conf.sum() + scores.sum() + ood.sum()

    def fused_pipe(v, x, i):
        x = x + i.astype(jnp.float32) * 1e-9
        out = model.apply(v, x, train=False)
        det, logits = fused_detect(out[0], 20, 0.25, iou_thres=0.45,
                                   max_det=300, pre_nms_k=512)
        scores = msp_score(logits, det.cls)
        ood = jnp.where(det.valid, (scores >= thresholds[det.cls]).astype(jnp.int32), 0)
        return det.conf.sum() + scores.sum() + ood.sum()

    def fused_pipe_u8(v, x, i):
        x = (x + i.astype(jnp.uint8)).astype(jnp.float32) * (1.0 / 255.0)
        out = model.apply(v, x, train=False)
        det, logits = fused_detect(out[0], 20, 0.25, iou_thres=0.45,
                                   max_det=300, pre_nms_k=512)
        scores = msp_score(logits, det.cls)
        ood = jnp.where(det.valid, (scores >= thresholds[det.cls]).astype(jnp.int32), 0)
        return det.conf.sum() + scores.sum() + ood.sum()

    def fused_nonms(v, x, i):
        x = x + i.astype(jnp.float32) * 1e-9
        out = model.apply(v, x, train=False)
        det, logits = fused_detect(out[0], 20, 0.25, iou_thres=0.45,
                                   max_det=300, pre_nms_k=512)
        return det.conf.sum()

    import numpy as np
    from jax import lax as jlax
    from ood_in_object_detection_tpu.models.head import (REG_MAX, dfl_expectation,
                                                         make_anchors)

    def raw_only(v, x, i):
        x = x + i.astype(jnp.float32) * 1e-9
        out = model.apply(v, x, train=False)
        return sum(jnp.sum(r.astype(jnp.float32)) for r in out[0])

    def to_conf_topk(v, x, i):
        x = x + i.astype(jnp.float32) * 1e-9
        out = model.apply(v, x, train=False)
        raw = out[0]
        b = raw[0].shape[0]
        conf_all = jnp.concatenate(
            [f[..., 4 * REG_MAX:].astype(jnp.float32).max(axis=-1).reshape(b, -1)
             for f in raw], axis=1)
        conf_all = jax.nn.sigmoid(conf_all)
        masked = jnp.where(conf_all > 0.25, conf_all, -1.0)
        top_conf, top_idx = jlax.top_k(masked, 512)
        return top_conf.sum() + top_idx.sum()

    def to_cand_decode(v, x, i):
        x = x + i.astype(jnp.float32) * 1e-9
        out = model.apply(v, x, train=False)
        raw = out[0]
        b = raw[0].shape[0]
        cpl = raw[0].shape[-1]
        hw = [(f.shape[1], f.shape[2]) for f in raw]
        anchors, anchor_strides = make_anchors(hw)
        a_l = [h * w for h, w in hw]
        offs = np.concatenate([[0], np.cumsum(a_l)[:-1]])
        conf_all = jnp.concatenate(
            [f[..., 4 * REG_MAX:].astype(jnp.float32).max(axis=-1).reshape(b, -1)
             for f in raw], axis=1)
        conf_all = jax.nn.sigmoid(conf_all)
        masked = jnp.where(conf_all > 0.25, conf_all, -1.0)
        top_conf, top_idx = jlax.top_k(masked, 512)
        cand = jnp.zeros((b, 512, cpl), raw[0].dtype)
        for off, al, f in zip(offs, a_l, raw):
            flat = f.reshape(b, al, cpl)
            loc = top_idx - off
            inb = (loc >= 0) & (loc < al)
            g = jnp.take_along_axis(flat, jnp.clip(loc, 0, al - 1)[..., None], axis=1)
            cand = jnp.where(inb[..., None], g, cand)
        cand = cand.astype(jnp.float32)
        dist = dfl_expectation(cand[..., : 4 * REG_MAX].reshape(b, 512, 4, REG_MAX))
        return dist.sum() + top_conf.sum()

    def _prefix(v, x, i):
        x = x + i.astype(jnp.float32) * 1e-9
        out = model.apply(v, x, train=False)
        raw = out[0]
        b = raw[0].shape[0]
        conf_all = jnp.concatenate(
            [f[..., 4 * REG_MAX:].astype(jnp.float32).max(axis=-1).reshape(b, -1)
             for f in raw], axis=1)
        conf_all = jax.nn.sigmoid(conf_all)
        masked = jnp.where(conf_all > 0.25, conf_all, -1.0)
        top_conf, top_idx = jlax.top_k(masked, 512)
        return raw, top_conf, top_idx

    def g_one_level(v, x, i):
        raw, top_conf, top_idx = _prefix(v, x, i)
        f = raw[0]
        b, al, cpl = f.shape[0], f.shape[1] * f.shape[2], f.shape[-1]
        flat = f.reshape(b, al, cpl)
        g = jnp.take_along_axis(flat, jnp.clip(top_idx, 0, al - 1)[..., None], axis=1)
        return jnp.sum(g.astype(jnp.float32)) + top_conf.sum()

    def g_three_flat2d(v, x, i):
        raw, top_conf, top_idx = _prefix(v, x, i)
        b = raw[0].shape[0]
        cpl = raw[0].shape[-1]
        a_l = [f.shape[1] * f.shape[2] for f in raw]
        offs = np.concatenate([[0], np.cumsum(a_l)[:-1]])
        cand = jnp.zeros((b, 512, cpl), raw[0].dtype)
        for off, al, f in zip(offs, a_l, raw):
            flat = f.reshape(b * al, cpl)
            loc = top_idx - off
            inb = (loc >= 0) & (loc < al)
            gi = (jnp.clip(loc, 0, al - 1) + jnp.arange(b)[:, None] * al).reshape(-1)
            g = jnp.take(flat, gi, axis=0).reshape(b, 512, cpl)
            cand = jnp.where(inb[..., None], g, cand)
        return jnp.sum(cand.astype(jnp.float32)) + top_conf.sum()

    def g_concat_gather(v, x, i):
        raw, top_conf, top_idx = _prefix(v, x, i)
        b = raw[0].shape[0]
        cpl = raw[0].shape[-1]
        allr = jnp.concatenate([f.reshape(b, -1, cpl) for f in raw], axis=1)
        g = jnp.take_along_axis(allr, top_idx[..., None], axis=1)
        return jnp.sum(g.astype(jnp.float32)) + top_conf.sum()

    which = sys.argv[2] if len(sys.argv) > 2 else "ab"
    if which == "ab":
        timed("fused v2: nhwc decode + nms + msp (f32)", fused_pipe, variables, img)
        timed("fused v2 u8 input", fused_pipe_u8, variables, img_u8)
    elif which == "all":
        timed("old: full decode + nms + msp (f32)", old_pipe, variables, img)
        timed("fused: topk decode + nms + msp (f32)", fused_pipe, variables, img)
        timed("fused u8 input", fused_pipe_u8, variables, img_u8)
        timed("raw fwd only", raw_only, variables, img)
        timed("raw fwd + conf + topk", to_conf_topk, variables, img)
        timed("raw fwd + conf + topk + cand decode", to_cand_decode, variables, img)
        timed("prefix + gather level0 only", g_one_level, variables, img)
        timed("prefix + 3-level flat-2D take", g_three_flat2d, variables, img)
        timed("prefix + concat + single gather", g_concat_gather, variables, img)


if __name__ == "__main__":
    main()

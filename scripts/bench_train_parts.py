"""Train-step segment ladder: where do the honest 85.5 ms/step (v8n b128) go?

Each rung adds one stage, all honest (state or activations carried so
nothing is DCE-able):
  fwd_eval   forward only, train=False (inference-mode BN)
  fwd_train  forward only, train=True + batch_stats mutation
  loss       fwd_train + TAL/CIoU/DFL/BCE loss
  grad       value_and_grad (loss + full backward), grads summed
  step       full train_step (SGD 3-group + EMA + state carry)

All device data is passed as jit ARGUMENTS — a closure-captured (128,640,
640,3) batch becomes a 630 MB HLO literal that wedges the tunnel compile.

Run from /root/repo: python scripts/bench_train_parts.py [model] [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

from ood_in_object_detection_tpu.models import build_model
from ood_in_object_detection_tpu.train import TrainConfig, init_state, train_step
from ood_in_object_detection_tpu.train.loss import detection_loss

MODEL = sys.argv[1] if len(sys.argv) > 1 else "yolov8n"
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 128
IMG, NC, M, ITERS = 640, 20, 16, 16

model = build_model(MODEL, nc=NC, dtype=jnp.bfloat16)
cfg = TrainConfig(epochs=10, steps_per_epoch=100)
rng = jax.random.PRNGKey(0)
images = jax.random.uniform(rng, (BATCH, IMG, IMG, 3), jnp.float32)
state0 = init_state(model, cfg, rng, images[:1])
batch_d = {
    "images": images,
    "gt_labels": jnp.zeros((BATCH, M), jnp.int32),
    "gt_bboxes": jnp.tile(jnp.asarray([[32.0, 32.0, 256.0, 256.0]]),
                          (BATCH, M, 1)),
    "gt_mask": jnp.ones((BATCH, M), bool).at[:, 4:].set(False),
}
variables = {"params": state0.params, "batch_stats": state0.batch_stats}


def timed(fn, *args):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    return time.perf_counter() - t0


def loop_ms(pipeline):
    """pipeline(variables, batch, i) -> f32 scalar; accumulator loop."""

    @jax.jit
    def loop(variables, batch, iters):
        def body(i, acc):
            return acc + pipeline(variables, batch, i)
        return lax.fori_loop(0, iters, body, jnp.float32(0.0))

    _ = float(loop(variables, batch_d, 2))
    dt = min(timed(loop, variables, batch_d, ITERS) for _ in range(3))
    ov = min(timed(loop, variables, batch_d, 1) for _ in range(3))
    return max(dt - max(ov - dt / ITERS, 0.0), 1e-9) / ITERS * 1000.0


def fwd_eval(variables, batch, i):
    x = batch["images"] + i.astype(jnp.float32) * 1e-9
    out = model.apply(variables, x, train=False)
    return sum(jnp.sum(r.astype(jnp.float32)) for r in out[0])


def fwd_train(variables, batch, i):
    x = batch["images"] + i.astype(jnp.float32) * 1e-9
    out, _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    return sum(jnp.sum(r.astype(jnp.float32)) for r in out[0])


def loss_only(variables, batch, i):
    x = batch["images"] + i.astype(jnp.float32) * 1e-9
    out, _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    lb = detection_loss(out[0], batch["gt_labels"], batch["gt_bboxes"],
                        batch["gt_mask"], NC)
    return lb.total.astype(jnp.float32)


def grad_rung(variables, batch, i):
    x = batch["images"] + i.astype(jnp.float32) * 1e-9

    def lf(params):
        out, _ = model.apply({"params": params,
                              "batch_stats": variables["batch_stats"]},
                             x, train=True, mutable=["batch_stats"])
        lb = detection_loss(out[0], batch["gt_labels"], batch["gt_bboxes"],
                            batch["gt_mask"], NC)
        return lb.total

    loss, grads = jax.value_and_grad(lf)(variables["params"])
    gsum = sum(jnp.sum(g.astype(jnp.float32))
               for g in jax.tree_util.tree_leaves(grads))
    return loss.astype(jnp.float32) + gsum


def step_ms():
    @jax.jit
    def loop(state, batch, iters):
        def body(i, st):
            b = dict(batch)
            b["images"] = batch["images"] + i.astype(jnp.float32) * 1e-9
            st2, _ = train_step(model, cfg, st, b)
            return st2
        final = lax.fori_loop(0, iters, body, state)
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(final.params))

    _ = float(loop(state0, batch_d, 2))
    dt = min(timed(loop, state0, batch_d, ITERS) for _ in range(3))
    ov = min(timed(loop, state0, batch_d, 1) for _ in range(3))
    return max(dt - max(ov - dt / ITERS, 0.0), 1e-9) / ITERS * 1000.0


rungs = [
    ("fwd_eval", lambda: loop_ms(fwd_eval)),
    ("fwd_train", lambda: loop_ms(fwd_train)),
    ("loss", lambda: loop_ms(loss_only)),
    ("grad", lambda: loop_ms(grad_rung)),
    ("step", step_ms),
]
prev = 0.0
for name, f in rungs:
    ms = f()
    print(f"{name:10s} {ms:8.2f} ms/step  (+{ms - prev:7.2f})  "
          f"{BATCH / ms * 1000:8.1f} img/s", flush=True)
    prev = ms

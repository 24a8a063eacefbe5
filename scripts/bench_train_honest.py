"""Quantify DCE inflation in the train-step bench probe.

The committed bench_train_step() loop body recomputes train_step on the SAME
input state each iteration and observes only `leaves[:8]` of the updated
params — which tree-flatten order makes the DETECT-HEAD leaves ("detect" <
"l0_"). Gradients of head params need only head backprop, so XLA can DCE the
entire backbone backward inside the fori_loop -> inflated img/s.

Honest variant: carry the full TrainState through the loop. Every param and
opt-state leaf feeds the next iteration's forward, so no backward can be
eliminated (except final-iteration partials, ~1/iters of one backward).

Run from /root/repo: python scripts/bench_train_honest.py [model] [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

from ood_in_object_detection_tpu.models import build_model
from ood_in_object_detection_tpu.train import TrainConfig, init_state, train_step

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


def timed(fn, *args):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    return time.perf_counter() - t0


def probe_loop_ms():
    """The committed (DCE-prone) probe loop."""

    def pipeline(state, b0, i):
        b = dict(b0)
        b["images"] = b0["images"] + i.astype(jnp.float32) * 1e-9
        new_state, lb = train_step(model, cfg, state, b)
        leaves = jax.tree_util.tree_leaves(new_state.params)
        probe = sum(jnp.sum(l[..., :1].astype(jnp.float32)) for l in leaves[:8])
        return lb.total.astype(jnp.float32) + probe * 1e-12

    @jax.jit
    def loop(args, iters):
        def body(i, acc):
            return acc + pipeline(*args, i)
        return lax.fori_loop(0, iters, body, jnp.float32(0.0))

    args = (state0, batch_d)
    _ = float(loop(args, 2))
    dt = min(timed(loop, args, ITERS) for _ in range(3))
    ov = min(timed(loop, args, 1) for _ in range(3))
    return max(dt - max(ov - dt / ITERS, 0.0), 1e-9) / ITERS * 1000.0


def carry_loop_ms():
    """Honest: the TrainState is the loop carry — nothing can be DCE'd."""

    @jax.jit
    def loop(state, b0, iters):
        def body(i, st):
            b = dict(b0)
            b["images"] = b0["images"] + i.astype(jnp.float32) * 1e-9
            st2, _ = train_step(model, cfg, st, b)
            return st2
        final = lax.fori_loop(0, iters, body, state)
        leaves = jax.tree_util.tree_leaves(final.params)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    _ = float(loop(state0, batch_d, 2))
    dt = min(timed(loop, state0, batch_d, ITERS) for _ in range(3))
    ov = min(timed(loop, state0, batch_d, 1) for _ in range(3))
    return max(dt - max(ov - dt / ITERS, 0.0), 1e-9) / ITERS * 1000.0


probe_ms = probe_loop_ms()
carry_ms = carry_loop_ms()
print(f"{MODEL} b{BATCH}: probe-loop {probe_ms:8.2f} ms/step "
      f"({BATCH / probe_ms * 1000:7.1f} img/s)")
print(f"{MODEL} b{BATCH}: carry-loop {carry_ms:8.2f} ms/step "
      f"({BATCH / carry_ms * 1000:7.1f} img/s)")
print(f"inflation: {carry_ms / probe_ms:.3f}x")

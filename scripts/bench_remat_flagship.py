"""Flagship (v8l) TRAIN-step memory/throughput sweep: remat on/off.

Question: does TrainConfig.remat (jax.checkpoint with save_only_these_names
over the per-layer boundary tags, models/yolo.py) extend the max train batch
on a 16 GB v5e chip for the paper's model scale (v8l @ 640), and at what
throughput cost? The reference trains v8l on A100-80GB (replicate/train.sh);
a 16 GB chip needs the remat lever or a small batch.

Each (batch, remat) point runs in a SUBPROCESS: an OOM while allocating
poisons the client's live buffers, so isolation keeps later points honest.

Run from /root/repo (axon registration): python scripts/bench_remat_flagship.py
"""

import json
import os
import subprocess
import sys

CHILD = r"""
import json, sys, time
import jax, jax.numpy as jnp
from jax import lax

batch, remat = int(sys.argv[1]), sys.argv[2] == "1"
IMG, NC, M, ITERS = 640, 20, 16, 6
sys.path.insert(0, "/root/repo")

from ood_in_object_detection_tpu.models import build_model
from ood_in_object_detection_tpu.train import TrainConfig, init_state, train_step

model = build_model("yolov8l", nc=NC, dtype=jnp.bfloat16)
cfg = TrainConfig(epochs=10, steps_per_epoch=100, remat=remat)
rng = jax.random.PRNGKey(0)
images = jax.random.uniform(rng, (batch, IMG, IMG, 3), jnp.float32)
state = init_state(model, cfg, rng, images[:1])
batch_d = {
    "images": images,
    "gt_labels": jnp.zeros((batch, M), jnp.int32),
    "gt_bboxes": jnp.tile(jnp.asarray([[32.0, 32.0, 256.0, 256.0]]),
                          (batch, M, 1)),
    "gt_mask": jnp.ones((batch, M), bool).at[:, 4:].set(False),
}

# TrainState is the loop CARRY: every param/opt leaf feeds the next
# iteration, so none of the backward can be dead-code-eliminated (the
# earlier leaves[:8] probe let XLA drop the whole backbone backward).
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

_ = float(loop(state, batch_d, 2))
def timed(n):
    t0 = time.perf_counter(); _ = float(loop(state, batch_d, n))
    return time.perf_counter() - t0
dt = min(timed(ITERS) for _ in range(3))
ov = min(timed(1) for _ in range(3))
ms = max(dt - max(ov - dt / ITERS, 0.0), 1e-9) / ITERS * 1000.0
print(json.dumps({"batch": batch, "remat": remat,
                  "ms_per_step": round(ms, 2),
                  "img_per_s": round(batch / ms * 1000.0, 1)}))
"""


def main():
    results = []
    for remat in ("0", "1"):
        for batch in (16, 32, 48, 64, 96, 128):
            r = subprocess.run(
                [sys.executable, "-c", CHILD, str(batch), remat],
                capture_output=True, text=True, cwd="/root/repo",
                timeout=1800)
            line = (r.stdout.strip().splitlines() or [""])[-1]
            if r.returncode == 0 and line.startswith("{"):
                rec = json.loads(line)
            else:
                err = r.stderr
                kind = ("OOM" if "RESOURCE_EXHAUSTED" in err or
                        "out of memory" in err.lower() else "ERROR")
                rec = {"batch": batch, "remat": remat == "1", "fail": kind}
                if kind == "ERROR":
                    rec["tail"] = err.strip().splitlines()[-3:]
            print(json.dumps(rec), flush=True)
            results.append(rec)
    return results


if __name__ == "__main__":
    main()

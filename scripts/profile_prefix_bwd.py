"""Marginal per-layer cost of the v8n INPUT-GRADIENT chain (prefix deltas).

For each prefix (layers 0..K) times grad_x of sum(prefix(x)) with train-mode
BN — forward + dL/dx backprop, no weight grads (the weight-grad cost was
measured separately: +25 ms at b128; the input-grad chain alone is 60.9 ms
vs 15.4 ms forward, scripts/bench_train_parts.py). The marginal difference
between consecutive prefixes is layer K's fwd+bwdx cost in context;
subtracting the forward profiler's marginal (profile_prefix.py) isolates
the backward share.

Usage: python scripts/profile_prefix_bwd.py [batch] [model]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 128
NAME = sys.argv[2] if len(sys.argv) > 2 else "yolov8n"
ITERS = 16


def timed(fn, *args):
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
    return compute / ITERS * 1000.0


def main():
    from ood_in_object_detection_tpu.models import build_model

    rng = jax.random.PRNGKey(0)
    img = jax.random.uniform(rng, (BATCH, 640, 640, 3), jnp.float32)
    model = build_model(NAME, nc=20, dtype=jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames="train")(rng, img[:1], train=True)

    spec = model.spec
    prev = 0.0
    first = 2 if model.folded_stem else 1
    for k in range(first, len(spec) - 1):
        m = model.clone(stop_after=k)

        def f(v, x, i):
            def s(xx):
                out, _ = m.apply(v, xx, train=True, mutable=["batch_stats"])
                return sum(jnp.sum(o.astype(jnp.float32))
                           for o in jax.tree_util.tree_leaves(out))

            g = jax.grad(s)(x + i.astype(jnp.float32) * 1e-9)
            return jnp.sum(g.astype(jnp.float32))

        ms = timed(f, variables, img)
        frm, rep, mod, args = spec[k]
        print(f"l{k:<3d} {mod:14s} {str(args):24s} cum {ms:8.3f} ms   "
              f"marginal {ms - prev:7.3f} ms", flush=True)
        prev = ms


if __name__ == "__main__":
    main()

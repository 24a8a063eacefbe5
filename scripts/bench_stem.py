"""TPU: pallas_stem correctness vs phase_folded_stem + throughput A/B."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
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
    from ood_in_object_detection_tpu.models.folded_stem import (
        phase_folded_stem, space_to_depth4)
    from ood_in_object_detection_tpu.ops.pallas.stem import pallas_stem

    rng = np.random.default_rng(0)
    c1, c2 = 16, 32
    w1 = jnp.asarray(rng.normal(size=(3, 3, 3, c1)) * 0.5, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, c1, c2)) * 0.2, jnp.float32)

    def bn(c):
        return {"scale": jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32),
                "bias": jnp.asarray(rng.normal(size=c) * 0.1, jnp.float32),
                "mean": jnp.asarray(rng.normal(size=c) * 0.1, jnp.float32),
                "var": jnp.asarray(rng.uniform(0.5, 2.0, c), jnp.float32)}

    bn1, bn2 = bn(c1), bn(c2)

    # correctness on-device (bf16 both paths, compare against f32 CPU-exactish)
    xs = jnp.asarray(rng.uniform(0, 1, (2, 640, 640, 3)), jnp.float32)
    ref = jax.jit(lambda x: phase_folded_stem(x, w1, bn1, w2, bn2,
                                              dtype=jnp.float32))(xs)
    got_bf = jax.jit(lambda x: pallas_stem(space_to_depth4(x), w1, bn1, w2, bn2,
                                           dtype=jnp.bfloat16))(xs)
    fol_bf = jax.jit(lambda x: phase_folded_stem(x, w1, bn1, w2, bn2,
                                                 dtype=jnp.bfloat16))(xs)
    e_pal = float(jnp.abs(got_bf.astype(jnp.float32) - ref).max())
    e_fol = float(jnp.abs(fol_bf.astype(jnp.float32) - ref).max())
    print(f"max|err| vs f32: pallas={e_pal:.5f}  xla-folded={e_fol:.5f}")

    img = jax.random.uniform(jax.random.PRNGKey(0), (BATCH, 640, 640, 3), jnp.float32)

    def folded(x, i):
        y = phase_folded_stem(x + i * 1e-9, w1, bn1, w2, bn2, dtype=jnp.bfloat16)
        return jnp.sum(y.astype(jnp.float32))

    def pallas(x, i):
        z = space_to_depth4((x + i * 1e-9).astype(jnp.bfloat16))
        y = pallas_stem(z, w1, bn1, w2, bn2, dtype=jnp.bfloat16)
        return jnp.sum(y.astype(jnp.float32))

    timed("xla phase-folded stem", folded, img)
    timed("pallas fused stem (incl s2d)", pallas, img)


if __name__ == "__main__":
    main()

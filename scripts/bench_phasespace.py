"""Validate phase-space (s2d-folded) execution of low-channel blocks.

Structural analogs with random weights: compares HBM-bound standard-layout
blocks against their folded equivalents (half resolution, 4x channels, k3/s1
-> k2/s1, 1x1 -> dense block-diagonal). Correctness is established separately;
this measures the layout effect only.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = 16
DT = jnp.bfloat16


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
    print(f"{name:52s} {ms:8.3f} ms")
    return ms


def conv(x, k, stride=1, pad="SAME"):
    if pad == "TL":  # k2/s1 with top/left zero pad
        padding = ((1, 0), (1, 0))
    else:
        padding = pad
    return lax.conv_general_dilated(
        x, k, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def bn_silu(x, scale, shift):
    return jax.nn.silu(x * scale + shift)


def c2f_standard(c, n, hw):
    """C2f(c, n) standard layout at hw px."""
    rng = jax.random.PRNGKey(1)
    h = c // 2
    ks = {
        "cv1": jax.random.normal(rng, (1, 1, c, c), DT) * 0.1,
        "cv2": jax.random.normal(rng, (1, 1, (2 + n) * h, c), DT) * 0.1,
    }
    for i in range(n):
        ks[f"b{i}a"] = jax.random.normal(rng, (3, 3, h, h), DT) * 0.1
        ks[f"b{i}b"] = jax.random.normal(rng, (3, 3, h, h), DT) * 0.1
    sc = jnp.float32(1.0).astype(DT)
    sh = jnp.float32(0.01).astype(DT)

    def fn(ks, x, i):
        x = x + i.astype(DT) * jnp.bfloat16(1e-9)
        y = bn_silu(conv(x, ks["cv1"]), sc, sh)
        a, b = jnp.split(y, 2, axis=-1)
        outs = [a, b]
        cur = b
        for j in range(n):
            t = bn_silu(conv(cur, ks[f"b{j}a"]), sc, sh)
            t = bn_silu(conv(t, ks[f"b{j}b"]), sc, sh)
            cur = cur + t
            outs.append(cur)
        y = bn_silu(conv(jnp.concatenate(outs, -1), ks["cv2"]), sc, sh)
        return jnp.sum(y.astype(jnp.float32))

    x = jax.random.normal(rng, (BATCH, hw, hw, c), DT)
    return fn, ks, x


def c2f_folded(c, n, hw):
    """Same block folded: hw/2 px, 4c channels; 1x1 -> (4c,4c') dense,
    3x3 -> k2/s1 (2,2,4h,4h)."""
    rng = jax.random.PRNGKey(1)
    h = c // 2
    ks = {
        "cv1": jax.random.normal(rng, (1, 1, 4 * c, 4 * c), DT) * 0.1,
        "cv2": jax.random.normal(rng, (1, 1, 4 * (2 + n) * h, 4 * c), DT) * 0.1,
    }
    for i in range(n):
        ks[f"b{i}a"] = jax.random.normal(rng, (2, 2, 4 * h, 4 * h), DT) * 0.1
        ks[f"b{i}b"] = jax.random.normal(rng, (2, 2, 4 * h, 4 * h), DT) * 0.1
    sc = jnp.float32(1.0).astype(DT)
    sh = jnp.float32(0.01).astype(DT)

    def fn(ks, x, i):
        x = x + i.astype(DT) * jnp.bfloat16(1e-9)
        y = bn_silu(conv(x, ks["cv1"]), sc, sh)
        a, b = jnp.split(y, 2, axis=-1)
        outs = [a, b]
        cur = b
        for j in range(n):
            t = bn_silu(conv(cur, ks[f"b{j}a"], pad="TL"), sc, sh)
            t = bn_silu(conv(t, ks[f"b{j}b"], pad="TL"), sc, sh)
            cur = cur + t
            outs.append(cur)
        y = bn_silu(conv(jnp.concatenate(outs, -1), ks["cv2"]), sc, sh)
        return jnp.sum(y.astype(jnp.float32))

    x = jax.random.normal(rng, (BATCH, hw // 2, hw // 2, 4 * c), DT)
    return fn, ks, x


def stem_folded80():
    """l0+l1 folded to the 80px domain: z8 (B,80,80,192) -> k2/s1 conv to
    256 (l0 phases) -> silu -> k2/s1 conv to 128 (l1 phases) -> silu."""
    rng = jax.random.PRNGKey(1)
    k1 = jax.random.normal(rng, (2, 2, 192, 256), DT) * 0.1
    k2 = jax.random.normal(rng, (2, 2, 256, 128), DT) * 0.1
    sc = jnp.float32(1.0).astype(DT)
    sh = jnp.float32(0.01).astype(DT)

    def fn(k1, k2, x, i):
        x = x + i.astype(jnp.float32) * 1e-9
        b, hh, ww, cc = x.shape
        z = x.astype(DT).reshape(b, 80, 8, 80, 8, 3).transpose(0, 1, 3, 2, 4, 5)
        z = z.reshape(b, 80, 80, 192)
        h1 = bn_silu(conv(z, k1, pad="TL"), sc, sh)
        h2 = bn_silu(conv(h1, k2, pad="TL"), sc, sh)
        return jnp.sum(h2.astype(jnp.float32))

    x = jax.random.uniform(rng, (BATCH, 640, 640, 3), jnp.float32)
    return fn, k1, k2, x


def l3_folded():
    """l3 Conv(64,3,2)@160->80 folded: input (80,80,128) -> k2/s1 -> (80,80,64)."""
    rng = jax.random.PRNGKey(1)
    k = jax.random.normal(rng, (2, 2, 128, 64), DT) * 0.1
    sc = jnp.float32(1.0).astype(DT)
    sh = jnp.float32(0.01).astype(DT)

    def fn(k, x, i):
        x = x + i.astype(DT) * jnp.bfloat16(1e-9)
        return jnp.sum(bn_silu(conv(x, k, pad="TL"), sc, sh).astype(jnp.float32))

    x = jax.random.normal(rng, (BATCH, 80, 80, 128), DT)
    return fn, k


def main():
    fn, ks, x = c2f_standard(64, 2, 80)
    timed("l4 C2f(64,n2)@80 standard", fn, ks, x)
    fn, ks, x = c2f_folded(64, 2, 80)
    timed("l4 C2f folded @40/256ch", fn, ks, x)
    fn, ks, x = c2f_standard(32, 1, 160)
    timed("l2 C2f(32,n1)@160 standard", fn, ks, x)
    fn, ks, x = c2f_folded(32, 1, 160)
    timed("l2 C2f folded @80/128ch", fn, ks, x)
    fn, k1, k2, x = stem_folded80()
    timed("stem l0+l1 folded @80 (192->256->128)", fn, k1, k2, x)
    fn, k = l3_folded()
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (BATCH, 80, 80, 128), DT)
    timed("l3 folded: k2/s1 128->64 @80", fn, k, x)


if __name__ == "__main__":
    main()

"""Measure: packed 128-lane v8n head tower vs the two separate 64-ch towers.

Hypothesis (PERF.md fact 2 — lane padding is a physical-layout tax): at
n-scale the decoupled head's cv2 (c2=64) and cv3 (c3=64 at nc<=64) towers
each store every intermediate in 128 HBM lanes, wasting half of every pass.
Concatenating the two towers into one 128-channel tower (conv1 = kernel
concat, conv2 = block-diagonal kernel, conv3 = block 1x1 emitting the
84-channel raw level directly) keeps the math bit-identical (the zero blocks
add exact zeros to f32 accumulators) while halving the physical HBM traffic
and removing the final concat pass.

Run on the real chip: python scripts/bench_head_pack.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = 16
NC = 20
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
    ms = max(dt - max(ov - dt / ITERS, 0.0), 1e-9) / ITERS * 1000.0
    print(f"{name:44s} {ms:8.3f} ms/iter")
    return ms


def conv(x, k, b=None, act=True):
    y = lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), [(1, 1), (1, 1)] if k.shape[0] == 3 else [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        y = y + b.astype(y.dtype)
    return jax.nn.silu(y) if act else y


def main():
    rng = np.random.default_rng(0)

    def mk(*shape):
        return jnp.asarray(rng.normal(size=shape, scale=0.05), DT)

    levels = [(80, 64), (40, 128), (20, 256)]  # v8n neck: (H=W, Cin)
    c2 = c3 = 64  # v8n, nc=20
    params = []
    for _, cin in levels:
        params.append(dict(
            k20=mk(3, 3, cin, c2), b20=mk(c2), k21=mk(3, 3, c2, c2), b21=mk(c2),
            k22=mk(1, 1, c2, 64), b22=mk(64),
            k30=mk(3, 3, cin, c3), b30=mk(c3), k31=mk(3, 3, c3, c3), b31=mk(c3),
            k32=mk(1, 1, c3, NC), b32=mk(NC),
        ))
    feats = [mk(BATCH, h, h, cin) for h, cin in levels]

    def separate(params, feats, i):
        out = 0.0
        for p, x in zip(params, feats):
            x = x + i.astype(DT) * jnp.bfloat16(1e-9)
            b = conv(conv(x, p["k20"], p["b20"]), p["k21"], p["b21"])
            b = conv(b, p["k22"], p["b22"], act=False)
            c = conv(conv(x, p["k30"], p["b30"]), p["k31"], p["b31"])
            c = conv(c, p["k32"], p["b32"], act=False)
            raw = jnp.concatenate([b, c], axis=-1)
            out += jnp.sum(raw.astype(jnp.float32))
        return out

    def packed(params, feats, i):
        out = 0.0
        for p, x in zip(params, feats):
            x = x + i.astype(DT) * jnp.bfloat16(1e-9)
            k1 = jnp.concatenate([p["k20"], p["k30"]], axis=-1)
            b1 = jnp.concatenate([p["b20"], p["b30"]])
            k2 = jnp.zeros((3, 3, c2 + c3, c2 + c3), DT)
            k2 = k2.at[:, :, :c2, :c2].set(p["k21"]).at[:, :, c2:, c2:].set(p["k31"])
            b2 = jnp.concatenate([p["b21"], p["b31"]])
            k3 = jnp.zeros((1, 1, c2 + c3, 64 + NC), DT)
            k3 = k3.at[:, :, :c2, :64].set(p["k22"]).at[:, :, c2:, 64:].set(p["k32"])
            b3 = jnp.concatenate([p["b22"], p["b32"]])
            raw = conv(conv(conv(x, k1, b1), k2, b2), k3, b3, act=False)
            out += jnp.sum(raw.astype(jnp.float32))
        return out

    # numeric agreement first (bit-level modulo bf16 conv reduction order)
    s = jax.jit(separate)(params, feats, jnp.int32(0))
    q = jax.jit(packed)(params, feats, jnp.int32(0))
    print(f"agreement: separate={float(s):.6e} packed={float(q):.6e} "
          f"rel={abs(float(s) - float(q)) / max(abs(float(s)), 1e-9):.2e}")

    t_sep = timed("separate towers (shipped head layout)", separate, params, feats)
    t_pack = timed("packed 128-lane tower (block-diag)", packed, params, feats)
    print(f"delta: {t_sep - t_pack:+.3f} ms/batch  "
          f"({(t_sep / t_pack - 1) * 100:+.1f}% head-region speed)")


if __name__ == "__main__":
    main()

"""Bisect pallas_stem cost: ladder of kernels from pure-IO to full compute."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W = 128, 160, 160
TH = 20
R = TH + 2
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
    print(f"{name:46s} {compute/ITERS*1000:8.3f} ms")


def call(kern, z, *ws):
    specs = [pl.BlockSpec((pl.Element(1), pl.Element(R), pl.Element(W),
                           pl.Element(48)),
                          lambda bi, t: (bi, t * TH, 0, 0),
                          memory_space=pltpu.VMEM)]
    for wt in ws:
        specs.append(pl.BlockSpec(wt.shape, lambda bi, t: (0,) * wt.ndim,
                                  memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kern,
        grid=(B, H // TH),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, TH, W, 32), lambda bi, t: (bi, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, 32), jnp.bfloat16),
    )(z, *ws)


def main():
    rng = jax.random.PRNGKey(0)
    z = jax.random.normal(rng, (B, H + 2, W, 48), jnp.bfloat16)
    w1 = jax.random.normal(rng, (128, 64), jnp.bfloat16)
    w2 = jax.random.normal(rng, (192, 32), jnp.bfloat16)
    w48 = jax.random.normal(rng, (48, 64), jnp.bfloat16)
    w64 = jax.random.normal(rng, (64, 32), jnp.bfloat16)

    def k_io(z_ref, o_ref):
        zz = z_ref[0, 2:, :, :32]
        o_ref[0] = zz

    def k_mm(z_ref, w48_ref, w64_ref, o_ref):
        zf = z_ref[0].reshape(R * W, 48)
        h1 = jnp.dot(zf[2 * W:], w48_ref[:],
                     preferred_element_type=jnp.float32)
        h1 = jax.nn.silu(h1).astype(jnp.bfloat16)
        h2 = jnp.dot(h1, w64_ref[:], preferred_element_type=jnp.float32)
        o_ref[0] = jax.nn.silu(h2).reshape(TH, W, 32).astype(jnp.bfloat16)

    def k_mm_shift(z_ref, w48_ref, w64_ref, o_ref):
        zf = z_ref[0].reshape(R * W, 48)
        col = lax.broadcasted_iota(jnp.int32, (R * W, 1), 0) % W
        zx = jnp.where(col == 0, jnp.zeros_like(zf),
                       jnp.concatenate([jnp.zeros((1, 48), zf.dtype), zf[:-1]], 0))
        h1 = jnp.dot((zf + zx)[2 * W:], w48_ref[:],
                     preferred_element_type=jnp.float32)
        h1 = jax.nn.silu(h1).astype(jnp.bfloat16)
        h2 = jnp.dot(h1, w64_ref[:], preferred_element_type=jnp.float32)
        o_ref[0] = jax.nn.silu(h2).reshape(TH, W, 32).astype(jnp.bfloat16)

    def k_mm_concat(z_ref, w1_ref, w64_ref, o_ref):
        zf = z_ref[0].reshape(R * W, 48)
        u = jnp.concatenate([zf[W:], zf[W:], zf[: (R - 1) * W, 36:48],
                             zf[: (R - 1) * W, 36:48],
                             jnp.zeros(((R - 1) * W, 8), zf.dtype)], -1)
        h1 = jnp.dot(u[W:], w1_ref[:], preferred_element_type=jnp.float32)
        h1 = jax.nn.silu(h1).astype(jnp.bfloat16)
        h2 = jnp.dot(h1, w64_ref[:], preferred_element_type=jnp.float32)
        o_ref[0] = jax.nn.silu(h2).reshape(TH, W, 32).astype(jnp.bfloat16)

    def k_mm_accum(z_ref, w48_ref, w64_ref, o_ref):
        zf = z_ref[0].reshape(R * W, 48)
        col = lax.broadcasted_iota(jnp.int32, (R * W, 1), 0) % W
        zx = jnp.where(col == 0, jnp.zeros_like(zf),
                       jnp.concatenate([jnp.zeros((1, 48), zf.dtype), zf[:-1]], 0))
        h1 = (jnp.dot(zf[2 * W:], w48_ref[:], preferred_element_type=jnp.float32)
              + jnp.dot(zx[2 * W:], w48_ref[:], preferred_element_type=jnp.float32)
              + jnp.dot(zf[:TH * W], w48_ref[:], preferred_element_type=jnp.float32)
              + jnp.dot(zx[:TH * W], w48_ref[:], preferred_element_type=jnp.float32))
        h1 = jax.nn.silu(h1).astype(jnp.bfloat16)
        h2 = jnp.dot(h1, w64_ref[:], preferred_element_type=jnp.float32)
        o_ref[0] = jax.nn.silu(h2).reshape(TH, W, 32).astype(jnp.bfloat16)

    for name, kern, ws in [
        ("io only (window in, slice out)", k_io, []),
        ("2 matmuls, no shifts/concat", k_mm, [w48, w64]),
        ("2 matmuls + sublane shift", k_mm_shift, [w48, w64]),
        ("2 matmuls + lane concat(48/48/12/12/8)", k_mm_concat, [w1, w64]),
        ("4-accum matmuls + shift", k_mm_accum, [w48, w64]),
    ]:
        def run(z, *ws_, _k=kern):
            def f(z, *a):
                return call(_k, z, *a[:-1]) if False else None
            return None
        def fn(z, *a, _k=kern):
            i = a[-1]
            zz = z + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-9)
            out = call(_k, zz, *a[:-1])
            return jnp.sum(out[:, ::40, ::40].astype(jnp.float32))
        timed(name, fn, z, *ws)


if __name__ == "__main__":
    main()

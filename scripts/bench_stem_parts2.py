"""Round 2 bisect: Element vs Blocked(pre-tiled) IO, tile sizes, shift impls."""

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
    print(f"{name:52s} {compute/ITERS*1000:8.3f} ms")


def element_io(th):
    r = th + 2

    def kern(z_ref, o_ref):
        o_ref[0] = z_ref[0, 2:, :, :32]

    def fn(z, i):
        zz = z + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-9)
        out = pl.pallas_call(
            kern,
            grid=(B, H // th),
            in_specs=[pl.BlockSpec(
                (pl.Element(1), pl.Element(r), pl.Element(W), pl.Element(48)),
                lambda bi, t: (bi, t * th, 0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, th, W, 32), lambda bi, t: (bi, t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, W, 32), jnp.bfloat16),
        )(zz)
        return jnp.sum(out[:, ::40, ::40].astype(jnp.float32))

    return fn


def tiled_io(th):
    r = th + 2
    nt = H // th

    def kern(z_ref, o_ref):
        o_ref[0] = z_ref[0, 2:, :, :32]

    def fn(z, i):
        zz = z + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-9)
        zt = jnp.stack([zz[:, k * th:k * th + r] for k in range(nt)], 1)
        zt = zt.reshape(B * nt, r, W, 48)
        out = pl.pallas_call(
            kern,
            grid=(B * nt,),
            in_specs=[pl.BlockSpec((1, r, W, 48), lambda s: (s, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, th, W, 32), lambda s: (s, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * nt, th, W, 32), jnp.bfloat16),
        )(zt)
        return jnp.sum(out[:, ::10, ::40].astype(jnp.float32))

    return fn


def shift_bench(mode):
    th = 20
    r = th + 2
    nt = H // th

    def kern(z_ref, o_ref):
        zf = z_ref[0].reshape(r * W, 48)
        if mode == "concat":
            zx = jnp.concatenate([jnp.zeros((1, 48), zf.dtype), zf[:-1]], 0)
        elif mode == "bitcast_roll":
            zi = pltpu.bitcast(zf, jnp.int32)        # (r*W, 24)
            zx = pltpu.bitcast(pltpu.roll(zi, 1, axis=0), jnp.bfloat16)
        elif mode == "f32_roll":
            zx = pltpu.roll(zf.astype(jnp.float32), 1, axis=0).astype(jnp.bfloat16)
        col = lax.broadcasted_iota(jnp.int32, (r * W, 1), 0) % W
        zx = jnp.where(col == 0, jnp.zeros_like(zx), zx)
        o_ref[0] = (zf + zx)[2 * W:, :32].reshape(th, W, 32)

    def fn(z, i):
        zz = z + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-9)
        zt = jnp.stack([zz[:, k * th:k * th + r] for k in range(nt)], 1)
        zt = zt.reshape(B * nt, r, W, 48)
        out = pl.pallas_call(
            kern,
            grid=(B * nt,),
            in_specs=[pl.BlockSpec((1, r, W, 48), lambda s: (s, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, th, W, 32), lambda s: (s, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * nt, th, W, 32), jnp.bfloat16),
        )(zt)
        return jnp.sum(out[:, ::10, ::40].astype(jnp.float32))

    return fn


def main():
    rng = jax.random.PRNGKey(0)
    z = jax.random.normal(rng, (B, H + 2, W, 48), jnp.bfloat16)
    timed("element io th=20", element_io(20), z)
    timed("element io th=40", element_io(40), z)
    timed("element io th=80", element_io(80), z)
    timed("pre-tiled blocked io th=20", tiled_io(20), z)
    timed("pre-tiled blocked io th=40", tiled_io(40), z)
    timed("tiled + shift concat", shift_bench("concat"), z)
    timed("tiled + shift bitcast_roll", shift_bench("bitcast_roll"), z)
    timed("tiled + shift f32_roll", shift_bench("f32_roll"), z)


if __name__ == "__main__":
    main()

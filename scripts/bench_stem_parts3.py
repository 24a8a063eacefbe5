"""Isolate Pallas pipeline IO rate vs XLA copy on the stem's layouts."""

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


def timed(name, fn, *args, mb=None):
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
    bw = f"  {mb / ms:7.1f} GB/s(dense)" if mb else ""
    print(f"{name:52s} {ms:8.3f} ms{bw}")


def xla_copy(z, i):
    zz = z + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-9)
    out = zz[:, 2:, :, :32] * jnp.bfloat16(1.0000001)
    return jnp.sum(out[:, ::10, ::40].astype(jnp.float32))


def blocked4d(th, sem):
    def kern(z_ref, o_ref):
        o_ref[0] = z_ref[0, :, :, :32]

    def fn(z, i):
        zz = z + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-9)
        out = pl.pallas_call(
            kern,
            grid=(B, H // th),
            in_specs=[pl.BlockSpec((1, th, W, 48), lambda bi, t: (bi, t, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, th, W, 32), lambda bi, t: (bi, t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, W, 32), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(sem, sem)),
        )(zz[:, 2:])
        return jnp.sum(out[:, ::10, ::40].astype(jnp.float32))

    return fn


def blocked2d(rows, sem):
    n = B * H * W

    def kern(z_ref, o_ref):
        o_ref[...] = z_ref[:, :32]

    def fn(z, i):
        zz = z + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-9)
        z2 = zz[:, 2:].reshape(n, 48)
        out = pl.pallas_call(
            kern,
            grid=(n // rows,),
            in_specs=[pl.BlockSpec((rows, 48), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, 32), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, 32), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(sem,)),
        )(z2)
        return jnp.sum(out[::1600].astype(jnp.float32))

    return fn


def dense128(rows):
    n = B * H * W // 4

    def kern(z_ref, o_ref):
        o_ref[...] = z_ref[...] * jnp.bfloat16(1.0000001)

    def fn(z, i):
        zz = z + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-9)
        z2 = zz[:, 2:].reshape(n, 192)[:, :128]
        out = pl.pallas_call(
            kern,
            grid=(n // rows,),
            in_specs=[pl.BlockSpec((rows, 128), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, 128), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, 128), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(z2)
        return jnp.sum(out[::1600].astype(jnp.float32))

    return fn


def main():
    rng = jax.random.PRNGKey(0)
    z = jax.random.normal(rng, (B, H + 2, W, 48), jnp.bfloat16)
    # dense MB moved: in 48ch + out 32ch
    mb_in = B * H * W * 48 * 2 / 1e6
    mb_out = B * H * W * 32 * 2 / 1e6
    mb = (mb_in + mb_out) / 1e3 * 1000  # MB
    timed("xla copy+scale (:, :32) slice", xla_copy, z, mb=mb)
    timed("pallas blocked4d th=20 parallel", blocked4d(20, "parallel"), z, mb=mb)
    timed("pallas blocked4d th=20 arbitrary", blocked4d(20, "arbitrary"), z, mb=mb)
    timed("pallas blocked4d th=40 arbitrary", blocked4d(40, "arbitrary"), z, mb=mb)
    timed("pallas blocked2d rows=3200 arbitrary", blocked2d(3200, "arbitrary"), z, mb=mb)
    timed("pallas blocked2d rows=12800 arbitrary", blocked2d(12800, "arbitrary"), z, mb=mb)
    mbd = 2 * (B * H * W // 4) * 128 * 2 / 1e6
    timed("pallas dense128 rows=3200", dense128(3200), z, mb=mbd)
    timed("pallas dense128 rows=12800", dense128(12800), z, mb=mbd)


if __name__ == "__main__":
    main()

"""Bisect the blocked-IO stem kernel's in-kernel cost on TPU.

Ladder: io-only -> matmuls on aligned operands -> +shift -> +misaligned
concats (full union-tap build) to find where the ~10 ms over IO goes.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W = 128, 160, 160
C1, C2 = 16, 32
TH = 20
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
    print(f"{name:52s} {compute/ITERS*1000:8.3f} ms", flush=True)


def make(mode):
    r = TH + 2

    def kern(halo_ref, z_ref, w1_ref, w2_ref, o_ref):
        halo = jnp.where(pl.program_id(1) == 0,
                         jnp.zeros_like(halo_ref[0]), halo_ref[0])
        zwin = jnp.concatenate([halo, z_ref[0]], axis=0)      # (r, W, 48)
        if mode == "io":
            o_ref[0] = zwin[2:, :, :32]
            return
        z = zwin.reshape(r * W, 48)
        if mode == "reshape_io":
            o_ref[0] = z[2 * W:, :32].reshape(TH, W, 32)
            return
        if mode == "mm_pad":
            # aligned operand: zero-pad lanes 48->128 (single aligned piece)
            u = jnp.pad(z[W:], ((0, 0), (0, 80)))
        elif mode in ("mm_concat", "full_noshift", "full"):
            if mode == "full":
                col = lax.broadcasted_iota(jnp.int32, (r * W, 1), 0) % W
                zx = jnp.where(col == 0, jnp.zeros_like(z),
                               jnp.concatenate([jnp.zeros((1, 48), z.dtype),
                                                z[:-1]], 0))
            else:
                zx = z
            u = jnp.concatenate(
                [z[W:], zx[W:], z[: (r - 1) * W, 36:48],
                 zx[: (r - 1) * W, 36:48],
                 jnp.zeros(((r - 1) * W, 8), z.dtype)], axis=-1)
        h1 = jnp.dot(u, w1_ref[:], preferred_element_type=jnp.float32)
        h1 = jax.nn.silu(h1).astype(z.dtype)
        if mode == "mm_pad" or mode == "mm_concat":
            o_ref[0] = h1[W:, :32].reshape(TH, W, 32)
            return
        h1x = h1
        v = jnp.concatenate(
            [h1[W:], h1x[W:], h1[: TH * W, 2 * C1: 4 * C1],
             h1x[: TH * W, 2 * C1: 4 * C1]], axis=-1)
        h2 = jnp.dot(v, w2_ref[:], preferred_element_type=jnp.float32)
        o_ref[0] = jax.nn.silu(h2).reshape(TH, W, C2).astype(o_ref.dtype)

    def fn(z, w1, w2, i):
        zz = z + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-9)
        return jnp.sum(pl.pallas_call(
            kern,
            grid=(B, H // TH),
            in_specs=[
                pl.BlockSpec((1, 2, W, 48),
                             lambda bi, t: (bi, jnp.maximum(t * TH - 2, 0) // 2, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TH, W, 48), lambda bi, t: (bi, t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 64), lambda bi, t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((192, 32), lambda bi, t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TH, W, 32), lambda bi, t: (bi, t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, W, 32), jnp.bfloat16),
        )(zz, zz, w1, w2)[:, ::40, ::40].astype(jnp.float32))

    return fn


def main():
    rng = jax.random.PRNGKey(0)
    z = jax.random.normal(rng, (B, H, W, 48), jnp.bfloat16)
    w1 = jax.random.normal(rng, (128, 64), jnp.bfloat16) * 0.1
    w2 = jax.random.normal(rng, (192, 32), jnp.bfloat16) * 0.1
    for mode in ("io", "reshape_io", "mm_pad", "mm_concat", "full_noshift", "full"):
        timed(f"stem kernel [{mode}]", make(mode), z, w1, w2)


if __name__ == "__main__":
    main()

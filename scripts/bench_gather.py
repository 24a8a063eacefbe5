"""Microbench: row-gather formulations on TPU (batch 128, 512 of 6400 rows x 84ch)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

B, A, K, C = 128, 6400, 512, 84
ITERS = 32


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
    print(f"{name:44s} {compute/ITERS*1000:8.3f} ms")


def main():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, A, C), jnp.bfloat16)
    idx = jax.random.randint(rng, (B, K), 0, A)

    def taa(x, idx, i):
        ix = (idx + i) % A
        g = jnp.take_along_axis(x, ix[..., None], axis=1)
        return jnp.sum(g.astype(jnp.float32))

    def flat2d(x, idx, i):
        ix = (idx + i) % A
        x2 = x.reshape(B * A, C)
        gi = (ix + jnp.arange(B)[:, None] * A).reshape(-1)
        g = jnp.take(x2, gi, axis=0)
        return jnp.sum(g.astype(jnp.float32))

    def vmap_take(x, idx, i):
        ix = (idx + i) % A
        g = jax.vmap(lambda xi, ii: jnp.take(xi, ii, axis=0))(x, ix)
        return jnp.sum(g.astype(jnp.float32))

    def onehot_mm(x, idx, i):
        ix = (idx + i) % A
        oh = jax.nn.one_hot(ix, A, dtype=jnp.bfloat16)          # (B,K,A)
        g = jnp.einsum("bka,bac->bkc", oh, x)
        return jnp.sum(g.astype(jnp.float32))

    def sort_based(x, idx, i):
        # scatter a rank into a (B, A) map, sort rows of x by it, slice K
        ix = (idx + i) % A
        rank = jnp.full((B, A), A, jnp.int32)
        rank = jax.vmap(lambda r, ii: r.at[ii].set(jnp.arange(K)))(rank, ix)
        _, g = lax.sort_key_val(rank, x.astype(jnp.float32).sum(-1))
        return jnp.sum(g[:, :K])

    timed("take_along_axis (batched)", taa, x, idx)
    timed("flat 2D jnp.take", flat2d, x, idx)
    timed("vmap(jnp.take)", vmap_take, x, idx)
    timed("one-hot matmul", onehot_mm, x, idx)
    timed("sort-based (sum payload only)", sort_based, x, idx)


if __name__ == "__main__":
    main()

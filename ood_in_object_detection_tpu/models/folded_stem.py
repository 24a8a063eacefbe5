"""Phase-folded stem: the first two k3/s2 convs recomputed as k2/s1 convs at
1/4 resolution with phase-expanded channels — mathematically exact.

Motivation (measured on v5e, CLAUDE.md perf notes): low-channel 640/320-px
tensors are lane-padded 8x and SiLU/BN epilogues don't fuse into TPU convs,
so the stem costs more HBM traffic than the rest of the network. Folding both
strided convs into the 160-px domain shrinks every elementwise pass 4x:

    x  (B, 4H, 4W, C)                 # input image
    z = space_to_depth_4(x)           # (B, H, W, 16C), channels (qy, qx, c)
    h = conv_k2_s1(z, fold_w1(W1))    # == phases (py, px, o1) of conv1 output
    h = silu(bn1_tiled(h))
    y = conv_k2_s1(h, fold_w2(W2))    # == original conv2 output at (B, H, W, o2)
    y = silu(bn2(y))

Derivation: conv1out[2y+py, 2x+px] needs image rows 4y+2py+dy-1, which live
in s4d phase q=(2py+dy-1) mod 4 at phase-row y-1+ky, ky=1+floor((2py+dy-1)/4);
conv2out[y, x] needs conv1out rows 2y+dy-1 = phase (dy+1)%2 at row y-1+ky,
(ky,py) in {(0,1)->dy0, (1,0)->dy1, (1,1)->dy2}. Taps that fall outside map
to zero weights; boundary zero-padding coincides exactly with the original
convs' padding (only the in-range phases of padded rows carry weight).

Inference-only (BN uses running stats; training uses the unfolded path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def space_to_depth4(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    z = x.reshape(b, h // 4, 4, w // 4, 4, c)
    z = z.transpose(0, 1, 3, 2, 4, 5)
    return z.reshape(b, h // 4, w // 4, 16 * c)


def fold_w1(w1: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, O) k3/s2 kernel -> (2, 2, 16C, 4O) k2/s1 kernel over s4d
    input; in-channels ordered (qy, qx, c), out-channels (py, px, o)."""
    k3, _, c, o = w1.shape
    assert k3 == 3
    out = jnp.zeros((2, 2, 16 * c, 4 * o), w1.dtype)
    for py in range(2):
        for dy in range(3):
            t = 2 * py + dy - 1
            qy, ky = t % 4, 1 + (t // 4 if t >= 0 else -1)
            for px in range(2):
                for dx in range(3):
                    s = 2 * px + dx - 1
                    qx, kx = s % 4, 1 + (s // 4 if s >= 0 else -1)
                    ci = (qy * 4 + qx) * c
                    oi = (py * 2 + px) * o
                    out = out.at[ky, kx, ci : ci + c, oi : oi + o].set(w1[dy, dx])
    return out


def fold_w2(w2: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C1, C2) k3/s2 kernel -> (2, 2, 4*C1, C2) k2/s1 kernel over the
    phase tensor; in-channels ordered (py, px, c1)."""
    k3, _, c1, c2 = w2.shape
    assert k3 == 3
    out = jnp.zeros((2, 2, 4 * c1, c2), w2.dtype)
    dy_of = {(0, 1): 0, (1, 0): 1, (1, 1): 2}
    for (ky, py), dy in dy_of.items():
        for (kx, px), dx in dy_of.items():
            ci = (py * 2 + px) * c1
            out = out.at[ky, kx, ci : ci + c1, :].set(w2[dy, dx])
    return out


def _conv_k2_s1_tl(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """k2/s1 conv with top/left zero padding (window rows y-1..y)."""
    return lax.conv_general_dilated(
        x, k, (1, 1), ((1, 0), (1, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn_inference(x, scale, bias, mean, var, eps=1e-3):
    """Single fused multiply-add in x's dtype (the (C,) coefficient math stays
    f32; flax BatchNorm with dtype=bf16 behaves the same)."""
    inv = (scale * lax.rsqrt(var + eps))
    shift = bias - mean * inv
    return x * inv.astype(x.dtype) + shift.astype(x.dtype)


def phase_folded_stem(
    x: jnp.ndarray,
    w1: jnp.ndarray, bn1: dict,   # bn dicts: scale/bias/mean/var, shape (O,)
    w2: jnp.ndarray, bn2: dict,
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Exact inference-mode replacement for
    silu(bn2(conv2(silu(bn1(conv1(x)))))) with both convs k3/s2."""
    z = space_to_depth4(x.astype(dtype))
    h = _conv_k2_s1_tl(z, fold_w1(w1).astype(dtype))
    tiled = {k: jnp.tile(v, 4) for k, v in bn1.items()}  # (py,px,o) channel order
    h = jax.nn.silu(_bn_inference(h, **tiled))
    y = _conv_k2_s1_tl(h, fold_w2(w2).astype(dtype))
    return jax.nn.silu(_bn_inference(y, **bn2))

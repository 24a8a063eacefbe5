"""Layer zoo for the YOLO model family, as Flax linen modules (NHWC, TPU-first).

Re-provides the capabilities of the reference layer zoo
(reference: ultralytics/nn/modules/{conv,block}.py) with TPU-idiomatic choices:

- NHWC layout so XLA tiles convs directly onto the MXU,
- explicit symmetric padding ``k // 2`` matching the reference's conv padding
  convention so ported weights are spatially aligned,
- BatchNorm with ``eps=1e-3, momentum=0.03`` (reference: ultralytics
  nn/modules/conv.py Conv.bn),
- a ``dtype`` knob for bf16 compute with f32 params.

Only the modules actually used by the detect-task model family are provided
(Conv, DWConv, Bottleneck, C2f, C3, C3k2, SPPF, SCDown, C2fCIB, PSA/C2PSA,
Attention, A2C2f/ABlock, RepNCSPELAN4/ADown for v9), mirroring the reference's
model YAMLs (ultralytics/cfg/models/{v8,v9,v10,11,12}).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch Conv2d default init: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))
conv_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def _pair(k) -> tuple:
    """Normalize an int or (kh, kw) kernel spec to a tuple."""
    return (k, k) if isinstance(k, int) else tuple(k)


def autopad(k: int, d: int = 1) -> int:
    """Symmetric padding that keeps spatial dims under stride 1 (torch p=k//2)."""
    if d > 1:
        k = d * (k - 1) + 1
    return k // 2


class Conv(nn.Module):
    """Conv2d + BatchNorm + SiLU (reference: ultralytics nn/modules/conv.py Conv)."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    d: int = 1
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kh, kw = _pair(self.k)
        ph, pw = autopad(kh, self.d), autopad(kw, self.d)
        x = nn.Conv(
            features=self.c2,
            kernel_size=(kh, kw),
            strides=(self.s, self.s),
            padding=((ph, ph), (pw, pw)),
            feature_group_count=self.g,
            kernel_dilation=(self.d, self.d),
            use_bias=False,
            dtype=self.dtype,
            kernel_init=conv_kernel_init,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.97,
            epsilon=1e-3,
            dtype=self.dtype,
            name="bn",
        )(x)
        if self.act:
            x = nn.silu(x)
        return x


class _KernelHolder(nn.Module):
    """Owns a bare conv kernel param under the same path nn.Conv would use,
    so StemConv's parameter tree is byte-compatible with Conv's."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", conv_kernel_init, self.shape)


class _BNParams(nn.Module):
    """Declares BatchNorm params/stats under the exact paths nn.BatchNorm
    uses, without applying it (for folded computations that consume the
    params directly)."""

    c: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones_init(), (self.c,))
        bias = self.param("bias", nn.initializers.zeros_init(), (self.c,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.c,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.c,), jnp.float32))
        return dict(scale=scale, bias=bias, mean=mean.value, var=var.value)


class ConvBNParams(nn.Module):
    """Parameter tree byte-compatible with Conv (conv/kernel + bn/*), exposed
    as raw arrays for folded/fused computations (models/folded_stem.py)."""

    cin: int
    cout: int
    k: int = 3

    @nn.compact
    def __call__(self):
        kernel = _KernelHolder((self.k, self.k, self.cin, self.cout), name="conv")()
        bn = _BNParams(self.cout, name="bn")()
        return kernel, bn


class StemConv(nn.Module):
    """Space-to-depth rewrite of the stem Conv(c2, k=3, s=2).

    A k3/s2 conv on (H, W, 3) starves the MXU/VPU: 3 input channels are
    padded to the 128-lane tile and the 640x640 grid pays full bandwidth.
    This module computes the *mathematically identical* convolution as a
    k2/s1 conv over the 2x2 space-to-depth transform of the input
    ((H/2, W/2, 12)): kernel tap (ky, kx, py, px) maps to the original tap
    (2ky+py-1, 2kx+px-1), out-of-range taps are zero. Parameters (and their
    tree paths) are identical to Conv, so checkpoints and the torch weight
    importer are unaffected.
    """

    c2: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        k3 = _KernelHolder((3, 3, cin, self.c2), name="conv")()
        k3 = k3.astype(self.dtype)
        # scatter (3,3,cin,c2) -> (2,2,2,2,cin,c2) [ky,kx,py,px,ci,o]
        k2 = jnp.zeros((2, 2, 2, 2, cin, self.c2), self.dtype)
        for ky in range(2):
            for py in range(2):
                dy = 2 * ky + py - 1
                if not 0 <= dy < 3:
                    continue
                for kx in range(2):
                    for px in range(2):
                        dx = 2 * kx + px - 1
                        if 0 <= dx < 3:
                            k2 = k2.at[ky, kx, py, px].set(k3[dy, dx])
        # reorder to [ky,kx, (py,px,ci), o] matching the s2d channel layout
        k2 = k2.reshape(2, 2, 4 * cin, self.c2)

        b, h, w, c = x.shape
        xs = x.astype(self.dtype).reshape(b, h // 2, 2, w // 2, 2, c)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        y = jax.lax.conv_general_dilated(
            xs, k2, window_strides=(1, 1), padding=((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=self.dtype, name="bn")(y)
        return nn.silu(y)


class DWConv(nn.Module):
    """Depthwise Conv + BN + SiLU (groups == channels)."""

    c2: int
    k: int = 1
    s: int = 1
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        import math

        g = math.gcd(x.shape[-1], self.c2)
        return Conv(self.c2, self.k, self.s, g=g, act=self.act, dtype=self.dtype, name="dw")(x, train)


class Conv2dRaw(nn.Module):
    """Bare Conv2d with bias (no BN/act), used by head output layers."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    bias_init_value: float | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = autopad(self.k)
        bias_init = (
            nn.initializers.constant(self.bias_init_value)
            if self.bias_init_value is not None
            else nn.initializers.zeros_init()
        )
        return nn.Conv(
            features=self.c2,
            kernel_size=(self.k, self.k),
            strides=(self.s, self.s),
            padding=((p, p), (p, p)),
            feature_group_count=self.g,
            use_bias=True,
            dtype=self.dtype,
            kernel_init=conv_kernel_init,
            bias_init=bias_init,
            name="conv",
        )(x)


class Bottleneck(nn.Module):
    """Standard bottleneck (reference: ultralytics nn/modules/block.py Bottleneck)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    k: tuple = (3, 3)
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = Conv(c_, self.k[0], 1, dtype=self.dtype, name="cv1")(x, train)
        y = Conv(self.c2, self.k[1], 1, g=self.g, dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.c2:
            y = x + y
        return y


class C2f(nn.Module):
    """CSP bottleneck with 2 convs, fast (reference: block.py C2f)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(
                Bottleneck(c, self.shortcut, self.g, k=(3, 3), e=1.0, dtype=self.dtype, name=f"m{i}")(
                    ys[-1], train
                )
            )
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, axis=-1), train)


class C3(nn.Module):
    """CSP bottleneck with 3 convs (reference: block.py C3)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    k: tuple = ((1, 1), (3, 3))
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            a = Bottleneck(c_, self.shortcut, self.g, k=self.k, e=1.0, dtype=self.dtype, name=f"m{i}")(a, train)
        b = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([a, b], axis=-1), train)


class C3k(nn.Module):
    """C3 with custom kernel size (reference: block.py C3k, used by yolo11)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    k: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return C3(
            self.c2, self.n, self.shortcut, self.g, self.e, k=((self.k, self.k), (self.k, self.k)),
            dtype=self.dtype, name="c3",
        )(x, train)


class C3k2(nn.Module):
    """Faster CSP with optional C3k blocks (reference: block.py C3k2, yolo11)."""

    c2: int
    n: int = 1
    c3k: bool = False
    e: float = 0.5
    g: int = 1
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            if self.c3k:
                ys.append(C3k(c, 2, self.shortcut, self.g, dtype=self.dtype, name=f"m{i}")(ys[-1], train))
            else:
                ys.append(
                    Bottleneck(c, self.shortcut, self.g, k=(3, 3), e=0.5, dtype=self.dtype, name=f"m{i}")(
                        ys[-1], train
                    )
                )
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, axis=-1), train)


def max_pool_same(x, k: int):
    """MaxPool2d(k, stride=1, padding=k//2) in NHWC."""
    p = k // 2
    return nn.max_pool(x, (k, k), strides=(1, 1), padding=((p, p), (p, p)))


class SPPF(nn.Module):
    """Spatial pyramid pooling, fast (reference: block.py SPPF)."""

    c2: int
    k: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        y = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y]
        for _ in range(3):
            ys.append(max_pool_same(ys[-1], self.k))
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, axis=-1), train)


def upsample2x(x):
    """Nearest-neighbour 2x upsample (reference: nn.Upsample scale_factor=2)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


# ---------------------------------------------------------------------------
# v10/v11/v12 modules
# ---------------------------------------------------------------------------


class SCDown(nn.Module):
    """Separable downsampling conv (reference: block.py SCDown, yolov10)."""

    c2: int
    k: int = 3
    s: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(self.c2, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y = Conv(self.c2, self.k, self.s, g=self.c2, act=False, dtype=self.dtype, name="cv2")(y, train)
        return y


class RepVGGDW(nn.Module):
    """Depthwise 7x7 + 3x3 rep branch (reference: block.py RepVGGDW; train form)."""

    c2: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = Conv(self.c2, 7, 1, g=self.c2, act=False, dtype=self.dtype, name="conv")(x, train)
        b = Conv(self.c2, 3, 1, g=self.c2, act=False, dtype=self.dtype, name="conv1")(x, train)
        return nn.silu(a + b)


class CIB(nn.Module):
    """Conditional identity block (reference: block.py CIB, yolov10)."""

    c2: int
    shortcut: bool = True
    e: float = 0.5
    lk: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = Conv(c1, 3, g=c1, dtype=self.dtype, name="cv1_0")(x, train)
        y = Conv(2 * c_, 1, dtype=self.dtype, name="cv1_1")(y, train)
        if self.lk:
            y = RepVGGDW(2 * c_, dtype=self.dtype, name="cv1_2")(y, train)
        else:
            y = Conv(2 * c_, 3, g=2 * c_, dtype=self.dtype, name="cv1_2")(y, train)
        y = Conv(self.c2, 1, dtype=self.dtype, name="cv1_3")(y, train)
        y = Conv(self.c2, 3, g=self.c2, dtype=self.dtype, name="cv1_4")(y, train)
        if self.shortcut and c1 == self.c2:
            y = x + y
        return y


class C2fCIB(nn.Module):
    """C2f with CIB blocks (reference: block.py C2fCIB, yolov10)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    lk: bool = False
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(CIB(c, self.shortcut, e=1.0, lk=self.lk, dtype=self.dtype, name=f"m{i}")(ys[-1], train))
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, axis=-1), train)


class Attention(nn.Module):
    """Multi-head self-attention over the HxW grid with positional conv
    (reference: block.py Attention, used by PSA/C2PSA/A2C2f)."""

    dim: int
    num_heads: int = 8
    attn_ratio: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        n = h * w
        head_dim = self.dim // self.num_heads
        key_dim = int(head_dim * self.attn_ratio)
        nh_kd = key_dim * self.num_heads
        hdim = self.dim + nh_kd * 2
        qkv = Conv(hdim, 1, act=False, dtype=self.dtype, name="qkv")(x, train)
        qkv = qkv.reshape(b, n, self.num_heads, key_dim * 2 + head_dim)
        q, k, v = jnp.split(qkv, [key_dim, key_dim * 2], axis=-1)
        # (b, heads, n, d)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn * (key_dim**-0.5), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, self.dim)
        vmap = v.transpose(0, 2, 1, 3).reshape(b, h, w, self.num_heads * head_dim)
        out = out + Conv(self.dim, 3, 1, g=self.dim, act=False, dtype=self.dtype, name="pe")(vmap, train)
        return Conv(self.dim, 1, act=False, dtype=self.dtype, name="proj")(out, train)


class PSABlock(nn.Module):
    """Attention + MLP block with residuals (reference: block.py PSABlock)."""

    c: int
    attn_ratio: float = 0.5
    num_heads: int = 4
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Attention(self.c, self.num_heads, self.attn_ratio, dtype=self.dtype, name="attn")(x, train)
        x = x + y if self.shortcut else y
        y = Conv(self.c * 2, 1, dtype=self.dtype, name="ffn0")(x, train)
        y = Conv(self.c, 1, act=False, dtype=self.dtype, name="ffn1")(y, train)
        return x + y if self.shortcut else y


class PSA(nn.Module):
    """Position-sensitive attention (reference: block.py PSA, yolov10)."""

    c2: int
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, dtype=self.dtype, name="cv1")(x, train)
        a, b = y[..., :c], y[..., c:]
        b = PSABlock(c, attn_ratio=0.5, num_heads=c // 64, dtype=self.dtype, name="attn_blk")(b, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate([a, b], axis=-1), train)


class C2PSA(nn.Module):
    """CSP wrapper around n PSABlocks (reference: block.py C2PSA, yolo11)."""

    c2: int
    n: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, dtype=self.dtype, name="cv1")(x, train)
        a, b = y[..., :c], y[..., c:]
        for i in range(self.n):
            b = PSABlock(c, attn_ratio=0.5, num_heads=c // 64, dtype=self.dtype, name=f"m{i}")(b, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate([a, b], axis=-1), train)


class AAttn(nn.Module):
    """Area attention (reference: block.py AAttn, yolo12). ``area`` splits the
    token axis into independent attention groups."""

    dim: int
    num_heads: int
    area: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        n = h * w
        head_dim = self.dim // self.num_heads
        # one fused qkv conv with the reference's per-head [q|k|v] channel
        # layout (block.py:1695,1712-1720), so torch weights import verbatim
        qkv = Conv(self.dim * 3, 1, act=False, dtype=self.dtype, name="qkv")(x, train)
        qkv = qkv.reshape(b, n, self.num_heads, 3, head_dim)
        if self.area > 1:
            qkv = qkv.reshape(b * self.area, n // self.area, self.num_heads, 3, head_dim)
        bb, nn_ = qkv.shape[0], qkv.shape[1]
        q = qkv[:, :, :, 0].transpose(0, 2, 1, 3)   # (bb, heads, n, hd)
        k = qkv[:, :, :, 1].transpose(0, 2, 1, 3)
        vh = qkv[:, :, :, 2].transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn * (head_dim**-0.5), axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(bb, nn_, self.dim)
        vmap = vh.transpose(0, 2, 1, 3).reshape(bb, nn_, self.dim)
        if self.area > 1:
            out = out.reshape(b, n, self.dim)
            vmap = vmap.reshape(b, n, self.dim)
        out = out.reshape(b, h, w, self.dim)
        vmap = vmap.reshape(b, h, w, self.dim)
        out = out + Conv(self.dim, 7, 1, g=self.dim, act=False, dtype=self.dtype, name="pe")(vmap, train)
        return Conv(self.dim, 1, act=False, dtype=self.dtype, name="proj")(out, train)


class ABlock(nn.Module):
    """Area-attention block (reference: block.py ABlock, yolo12)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 1.2
    area: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x + AAttn(self.dim, self.num_heads, self.area, dtype=self.dtype, name="attn")(x, train)
        mlp_hidden = int(self.dim * self.mlp_ratio)
        y = Conv(mlp_hidden, 1, dtype=self.dtype, name="mlp0")(x, train)
        y = Conv(self.dim, 1, act=False, dtype=self.dtype, name="mlp1")(y, train)
        return x + y


class A2C2f(nn.Module):
    """Area-attention C2f (reference: block.py A2C2f, yolo12)."""

    c2: int
    n: int = 1
    a2: bool = True
    area: int = 1
    residual: bool = False
    mlp_ratio: float = 2.0
    e: float = 0.5
    g: int = 1
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y]
        for i in range(self.n):
            if self.a2:
                z = ys[-1]
                z = ABlock(c_, c_ // 32, self.mlp_ratio, self.area, dtype=self.dtype, name=f"m{i}_0")(z, train)
                z = ABlock(c_, c_ // 32, self.mlp_ratio, self.area, dtype=self.dtype, name=f"m{i}_1")(z, train)
                ys.append(z)
            else:
                ys.append(C3k(c_, 2, self.shortcut, self.g, dtype=self.dtype, name=f"m{i}")(ys[-1], train))
        out = Conv(self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, axis=-1), train)
        if self.a2 and self.residual:
            gamma = self.param("gamma", nn.initializers.constant(0.01), (self.c2,), jnp.float32)
            out = x + gamma.astype(out.dtype) * out
        return out


# ---------------------------------------------------------------------------
# v9 modules
# ---------------------------------------------------------------------------


class RepConvDW(nn.Module):
    """RepConv in its train form: 3x3 conv + 1x1 conv branches summed
    (reference: conv.py RepConv)."""

    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = Conv(self.c2, self.k, self.s, g=self.g, act=False, dtype=self.dtype, name="conv1")(x, train)
        b = Conv(self.c2, 1, self.s, g=self.g, act=False, dtype=self.dtype, name="conv2")(x, train)
        return nn.silu(a + b)


class RepBottleneck(nn.Module):
    c2: int
    shortcut: bool = True
    g: int = 1
    k: tuple = (3, 3)
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = RepConvDW(c_, self.k[0], 1, dtype=self.dtype, name="cv1")(x, train)
        y = Conv(self.c2, self.k[1], 1, g=self.g, dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.c2:
            y = x + y
        return y


class RepCSP(nn.Module):
    c2: int
    n: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            a = RepBottleneck(c_, True, e=1.0, dtype=self.dtype, name=f"m{i}")(a, train)
        b = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([a, b], axis=-1), train)


class RepNCSPELAN4(nn.Module):
    """GELAN block (reference: block.py RepNCSPELAN4, yolov9)."""

    c2: int
    c3: int
    c4: int
    n: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.c3 // 2
        y = Conv(self.c3, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y1, y2 = y[..., :c], y[..., c:]
        y3 = RepCSP(self.c4, self.n, dtype=self.dtype, name="cv2_csp")(y2, train)
        y3 = Conv(self.c4, 3, 1, dtype=self.dtype, name="cv2_conv")(y3, train)
        y4 = RepCSP(self.c4, self.n, dtype=self.dtype, name="cv3_csp")(y3, train)
        y4 = Conv(self.c4, 3, 1, dtype=self.dtype, name="cv3_conv")(y4, train)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv4")(
            jnp.concatenate([y1, y2, y3, y4], axis=-1), train
        )


class ADown(nn.Module):
    """v9 downsample: avgpool+conv / maxpool+conv split (reference: block.py ADown)."""

    c2: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.c2 // 2
        x = nn.avg_pool(x, (2, 2), strides=(1, 1), padding="VALID")
        x1, x2 = jnp.split(x, 2, axis=-1)
        x1 = Conv(c, 3, 2, dtype=self.dtype, name="cv1")(x1, train)
        x2 = nn.max_pool(x2, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x2 = Conv(c, 1, 1, dtype=self.dtype, name="cv2")(x2, train)
        return jnp.concatenate([x1, x2], axis=-1)


class ELAN1(nn.Module):
    """Small ELAN block (reference block.py ELAN1, yolov9 t/s)."""

    c2: int
    c3: int
    c4: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.c3 // 2
        y = Conv(self.c3, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y1, y2 = y[..., :c], y[..., c:]
        y3 = Conv(self.c4, 3, 1, dtype=self.dtype, name="cv2")(y2, train)
        y4 = Conv(self.c4, 3, 1, dtype=self.dtype, name="cv3")(y3, train)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv4")(
            jnp.concatenate([y1, y2, y3, y4], axis=-1), train)


class AConv(nn.Module):
    """avgpool(2, s1) + Conv(3, s2) downsample (reference block.py AConv)."""

    c2: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.avg_pool(x, (2, 2), strides=(1, 1), padding="VALID")
        return Conv(self.c2, 3, 2, dtype=self.dtype, name="cv1")(x, train)


class SPPELAN(nn.Module):
    """SPP-ELAN (reference: block.py SPPELAN, yolov9)."""

    c2: int
    c3: int
    k: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = [Conv(self.c3, 1, 1, dtype=self.dtype, name="cv1")(x, train)]
        for i in range(3):
            y.append(max_pool_same(y[-1], self.k))
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv5")(jnp.concatenate(y, axis=-1), train)

"""Phase-folded stem must equal the plain two-conv stem exactly."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ood_in_object_detection_tpu.models.folded_stem import (
    fold_w1, fold_w2, phase_folded_stem, space_to_depth4,
)


def _ref_stem(x, w1, bn1, w2, bn2, eps=1e-3):
    def conv(x, k):
        return lax.conv_general_dilated(x, k, (2, 2), ((1, 1), (1, 1)),
                                        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def bn(x, p):
        inv = p["scale"] * jax.lax.rsqrt(p["var"] + eps)
        return x * inv + (p["bias"] - p["mean"] * inv)

    h = jax.nn.silu(bn(conv(x, w1), bn1))
    return jax.nn.silu(bn(conv(h, w2), bn2))


def test_phase_folded_stem_exact(rng):
    B, H, W = 2, 32, 48
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, 3)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(0, 0.3, (3, 3, 3, 16)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(0, 0.3, (3, 3, 16, 32)).astype(np.float32))
    bn1 = {k: jnp.asarray(rng.uniform(0.5, 1.5, 16).astype(np.float32))
           for k in ("scale", "bias", "mean", "var")}
    bn2 = {k: jnp.asarray(rng.uniform(0.5, 1.5, 32).astype(np.float32))
           for k in ("scale", "bias", "mean", "var")}

    ref = _ref_stem(x, w1, bn1, w2, bn2)
    got = phase_folded_stem(x, w1, bn1, w2, bn2, dtype=jnp.float32)
    assert got.shape == ref.shape == (B, H // 4, W // 4, 32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_space_to_depth4_layout():
    x = jnp.arange(4 * 4 * 1, dtype=jnp.float32).reshape(1, 4, 4, 1)
    z = space_to_depth4(x)
    assert z.shape == (1, 1, 1, 16)
    # channel order (qy, qx, c): row-major pixels
    np.testing.assert_array_equal(np.asarray(z)[0, 0, 0], np.arange(16))

"""Fused Pallas stem kernel vs the XLA phase-folded stem and unfolded convs.

The kernel (ops/pallas/stem.py) must reproduce
silu(bn2(conv2(silu(bn1(conv1(x)))))) for the two k3/s2 stem Convs
(reference nn/modules/conv.py Conv); phase_folded_stem is the proven exact
rewrite, so agreement with it in f32 validates the union-tap weight layout,
the halo/roll boundary handling and the BN folding."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ood_in_object_detection_tpu.models.folded_stem import (
    phase_folded_stem, space_to_depth4)
from ood_in_object_detection_tpu.ops.pallas.stem import (
    pallas_stem, stem_supported)


def _params(rng, c1, c2):
    w1 = jnp.asarray(rng.normal(size=(3, 3, 3, c1)) * 0.5, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, c1, c2)) * 0.2, jnp.float32)

    def bn(c):
        return {
            "scale": jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32),
            "bias": jnp.asarray(rng.normal(size=c) * 0.1, jnp.float32),
            "mean": jnp.asarray(rng.normal(size=c) * 0.1, jnp.float32),
            "var": jnp.asarray(rng.uniform(0.5, 2.0, c), jnp.float32),
        }

    return w1, bn(c1), w2, bn(c2)


@pytest.mark.parametrize("c1,c2,hw", [(16, 32, 64), (32, 64, 64), (16, 32, 128)])
def test_pallas_stem_matches_folded(rng, c1, c2, hw):
    w1, bn1, w2, bn2 = _params(rng, c1, c2)
    x = jnp.asarray(rng.uniform(0, 1, (2, hw, hw, 3)), jnp.float32)
    want = phase_folded_stem(x, w1, bn1, w2, bn2, dtype=jnp.float32)
    z = space_to_depth4(x)
    got = pallas_stem(z, w1, bn1, w2, bn2, dtype=jnp.float32, interpret=True)
    assert got.shape == (2, hw // 4, hw // 4, c2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pallas_stem_boundary_rows_cols(rng):
    """Impulse test: a single bright pixel at the image corner exercises the
    zero-padding paths (top halo rows, x=0 roll mask, fake h1 row)."""
    c1, c2 = 16, 32
    w1, bn1, w2, bn2 = _params(rng, c1, c2)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32).at[0, 0, 0, 0].set(5.0)
    want = phase_folded_stem(x, w1, bn1, w2, bn2, dtype=jnp.float32)
    got = pallas_stem(space_to_depth4(x), w1, bn1, w2, bn2,
                      dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_stem_supported_gate():
    assert stem_supported((1, 640, 640, 3), 16)
    assert stem_supported((1, 640, 640, 3), 32)
    assert not stem_supported((1, 640, 640, 3), 48)   # v8m: 4*C1 > 128 lanes
    assert not stem_supported((1, 96, 96, 3), 16)     # W/4 not 16-aligned
    assert not stem_supported((1, 640, 640, 4), 16)

"""Parity of the combined RoI+exact separable contraction (XLA folded path
and the Pallas VMEM-Q kernel, interpret mode) with the shipped independent
paths (batched_roi_align_1x1 / engine._exact_pos_features), which are
themselves cross-executed against the reference's own torch extractor in
tests/test_reference_pipeline_parity.py."""

import functools

import jax.numpy as jnp
import numpy as np
import pytest

import ood_in_object_detection_tpu.ops.pallas.roi as proi
from ood_in_object_detection_tpu.engine import _exact_pos_features
from ood_in_object_detection_tpu.ops.roi_align import (
    batched_roi_align_1x1,
    roi_and_exact_batched,
)


def _setup(seed=0, b=3, n=17):
    rng = np.random.default_rng(seed)
    fmaps = [
        jnp.asarray(rng.normal(size=(b, 16, 16, 8)), jnp.float32),
        jnp.asarray(rng.normal(size=(b, 8, 8, 12)), jnp.float32),
        jnp.asarray(rng.normal(size=(b, 4, 4, 24)), jnp.float32),
    ]
    xy = rng.uniform(0, 100, size=(b, n, 2))
    wh = rng.uniform(1, 40, size=(b, n, 2))
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)
    level = jnp.asarray(rng.integers(0, 3, size=(b, n)), jnp.int32)
    a_total = sum(f.shape[1] * f.shape[2] for f in fmaps)
    aidx = jnp.asarray(rng.integers(0, a_total, size=(b, n)), jnp.int32)
    return fmaps, boxes, level, aidx


@pytest.mark.parametrize("samples", [4, 0])
def test_combined_matches_independent_paths(samples):
    fmaps, boxes, level, aidx = _setup()
    roi, exact = roi_and_exact_batched(fmaps, boxes, aidx, level, img_w=128,
                                       samples=samples)
    ref_roi = batched_roi_align_1x1(fmaps, boxes, level, img_w=128,
                                    samples=samples)
    ref_exact = _exact_pos_features(fmaps, aidx)
    np.testing.assert_allclose(np.asarray(roi), np.asarray(ref_roi),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(exact), np.asarray(ref_exact),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("variant", ["store", "expand", "twostage"])
def test_kernel_interpret_matches_einsum(variant, monkeypatch):
    rng = np.random.default_rng(3)
    b, n2, h, w, c = 2, 34, 16, 16, 8
    f = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
    wx = jnp.asarray(rng.uniform(size=(b, n2, w)), jnp.float32)
    wy = jnp.asarray(rng.uniform(size=(b, n2, h)), jnp.float32)
    monkeypatch.setattr(proi.pl, "pallas_call",
                        functools.partial(proi.pl.pallas_call, interpret=True))
    got = proi.roi_matmul_level_pallas(f, wx, wy, variant=variant)
    q = (wy[..., :, None] * wx[..., None, :]).reshape(b, n2, h * w)
    ref = jnp.einsum("bnk,bkc->bnc", q, f.reshape(b, h * w, c))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_kernel_interpret_tile_padding(monkeypatch):
    """n2 not a multiple of the tile and W < 128 both pad correctly."""
    rng = np.random.default_rng(4)
    b, n2, h, w, c = 1, 7, 8, 8, 8
    f = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
    wx = jnp.asarray(rng.uniform(size=(b, n2, w)), jnp.float32)
    wy = jnp.asarray(rng.uniform(size=(b, n2, h)), jnp.float32)
    monkeypatch.setattr(proi.pl, "pallas_call",
                        functools.partial(proi.pl.pallas_call, interpret=True))
    got = proi.roi_matmul_level_pallas(f, wx, wy)
    q = (wy[..., :, None] * wx[..., None, :]).reshape(b, n2, h * w)
    ref = jnp.einsum("bnk,bkc->bnc", q, f.reshape(b, h * w, c))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

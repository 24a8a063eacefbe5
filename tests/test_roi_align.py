"""Parity of the batched gather-based RoIAlign / exact-position paths with
their per-image reference implementations."""

import jax
import jax.numpy as jnp
import numpy as np

from ood_in_object_detection_tpu.engine import _exact_pos_features
from ood_in_object_detection_tpu.ops.roi_align import (
    batched_roi_align_1x1,
    roi_align_1x1_multi_level,
)


def _rand_setup(seed=0, b=3, n=17):
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
    return fmaps, boxes, level


def test_batched_matches_per_image_multi_level():
    fmaps, boxes, level = _rand_setup()
    img_w = 128
    for samples in (4, 0):  # fixed grid and torchvision-adaptive
        got = batched_roi_align_1x1(fmaps, boxes, level, img_w=img_w,
                                    samples=samples)
        for b in range(boxes.shape[0]):
            ref = roi_align_1x1_multi_level(
                [f[b] for f in fmaps], boxes[b], level[b], img_w=img_w,
                samples=samples)
            np.testing.assert_allclose(np.asarray(got[b]), np.asarray(ref),
                                       rtol=1e-5, atol=1e-5)


def test_closed_form_adaptive_weights_exact_any_span():
    """_axis_weights_adaptive (arithmetic-series closed form, no sample dim)
    vs the brute-force ceil(span)-sample hat sum, including border-clamped
    sample runs, integer-boundary spans, and spans far beyond the old
    16-sample cap — the property that keeps fit-time and eval-time RoI
    features identical for every box size."""
    from ood_in_object_detection_tpu.ops.roi_align import _axis_weights_adaptive

    def brute(lo, span, size):
        n = max(int(np.ceil(span)), 1)
        u = lo + (np.arange(n) + 0.5) * (span / n)
        u = np.clip(u, 0.0, size - 1.0)
        p = np.arange(size, dtype=np.float64)
        return np.maximum(0.0, 1.0 - np.abs(u[:, None] - p)).sum(0) / n

    rng = np.random.default_rng(0)
    cases = [(float(rng.uniform(-10, 90)), float(rng.uniform(1.0, 100.0)),
              int(rng.integers(3, 81))) for _ in range(40)]
    cases += [(lo, span, 80) for span in (1.0, 2.0, 16.0, 17.0, 80.0)
              for lo in (-3.0, -0.5, 0.0, 0.25, 77.5, 79.0, 81.0)]
    los, spans, sizes = zip(*cases)
    for size in sorted(set(sizes)):  # batch same-size cases into one call
        sel = [i for i, s in enumerate(sizes) if s == size]
        got = np.asarray(_axis_weights_adaptive(
            jnp.asarray([los[i] for i in sel], jnp.float32),
            jnp.asarray([spans[i] for i in sel], jnp.float32), size))
        for row, i in enumerate(sel):
            np.testing.assert_allclose(got[row], brute(los[i], spans[i], size),
                                       rtol=1e-5, atol=2e-6,
                                       err_msg=f"lo={los[i]} span={spans[i]}")


def test_exact_pos_matches_padded_concat():
    fmaps, _, _ = _rand_setup(seed=1)
    b = fmaps[0].shape[0]
    a_total = sum(f.shape[1] * f.shape[2] for f in fmaps)
    rng = np.random.default_rng(2)
    aidx = jnp.asarray(rng.integers(0, a_total, size=(b, 11)), jnp.int32)

    got = _exact_pos_features(fmaps, aidx)

    cmax = max(f.shape[-1] for f in fmaps)
    flats = []
    for f in fmaps:
        bb, h, w, c = f.shape
        fl = f.reshape(bb, h * w, c)
        if c < cmax:
            fl = jnp.pad(fl, ((0, 0), (0, 0), (0, cmax - c)))
        flats.append(fl)
    ref = jnp.take_along_axis(jnp.concatenate(flats, axis=1),
                              aidx[..., None], axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref))


def test_roi_align_np_mirror_matches_jnp():
    """roi_align_1x1_single_level_np (the host-side EUL rank tail) is
    bit-compatible with the jnp fixed-grid path on CPU."""
    import numpy as np

    from ood_in_object_detection_tpu.ops.roi_align import (
        roi_align_1x1_single_level, roi_align_1x1_single_level_np)

    rng = np.random.default_rng(0)
    fmap = rng.normal(size=(40, 40, 17)).astype(np.float32)
    boxes = np.stack([
        rng.uniform(0, 30, 8), rng.uniform(0, 30, 8),
        rng.uniform(31, 40, 8), rng.uniform(31, 40, 8)], axis=1
    ).astype(np.float32)
    a = np.asarray(roi_align_1x1_single_level(fmap, boxes, 0.5, samples=4))
    b = roi_align_1x1_single_level_np(fmap, boxes, 0.5, samples=4)
    np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-6)
    # empty proposal set: (0, C) not an error
    assert roi_align_1x1_single_level_np(fmap, np.zeros((0, 4)), 1.0).shape \
        == (0, 17)


def test_pairwise_distance_np_mirror():
    import numpy as np

    from ood_in_object_detection_tpu.ood.distance import (
        pairwise_distance, pairwise_distance_np)

    rng = np.random.default_rng(1)
    a = rng.normal(size=(5, 12)).astype(np.float32)
    b = rng.normal(size=(3, 12)).astype(np.float32)
    for metric in ("l1", "l2", "cosine"):
        np.testing.assert_allclose(
            pairwise_distance_np(a, b, metric),
            np.asarray(pairwise_distance(a, b, metric)),
            rtol=1e-5, atol=1e-6, err_msg=metric)

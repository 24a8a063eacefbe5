"""Training augmentation stack (data/augment.py vs reference augment.py)."""

import numpy as np
import pytest

from ood_in_object_detection_tpu.data import DetectionDataset
from ood_in_object_detection_tpu.data.augment import (
    AugmentConfig, AugmentedTrainBatcher, augmented_sample, hsv_jitter, mosaic4,
)


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("aug")
    (root / "images").mkdir(); (root / "labels").mkdir()
    rng = np.random.default_rng(0)
    files = []
    for i in range(6):
        img = rng.integers(0, 255, (60, 90, 3), dtype=np.uint8)
        f = root / "images" / f"i{i}.jpg"
        Image.fromarray(img).save(f)
        (root / "labels" / f"i{i}.txt").write_text(f"{i % 3} 0.5 0.5 0.6 0.6\n")
        files.append(str(f))
    return DetectionDataset.from_image_list(files, ["a", "b", "c"])


def test_mosaic4_boxes_in_canvas(ds):
    rng = np.random.default_rng(1)
    canvas, boxes, cls = mosaic4(ds, [0, 1, 2, 3], 64, rng)
    assert canvas.shape == (128, 128, 3)
    assert len(boxes) == len(cls) > 0
    # boxes live on the canvas (may exceed edges slightly before clipping)
    assert (boxes[:, 2] > boxes[:, 0]).all()


def test_augmented_sample_shapes_and_flip(ds):
    rng = np.random.default_rng(2)
    cfg = AugmentConfig(mosaic=1.0, fliplr=1.0)
    img, boxes, cls = augmented_sample(ds, 0, 64, cfg, rng)
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    if len(boxes):
        assert (boxes[:, 0] <= boxes[:, 2]).all()
        assert boxes.min() >= 0 and boxes.max() <= 64


def test_hsv_jitter_preserves_shape_and_range(rng):
    img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    out = hsv_jitter(img, 0.015, 0.7, 0.4, np.random.default_rng(0))
    assert out.shape == img.shape and out.dtype == np.uint8
    # zero gains = identity up to hsv roundtrip error
    same = hsv_jitter(img, 0.0, 0.0, 0.0, np.random.default_rng(0))
    assert np.abs(same.astype(int) - img.astype(int)).max() <= 2


def test_train_batcher_close_mosaic(ds):
    cfg = AugmentConfig(close_mosaic=10)
    b = AugmentedTrainBatcher(ds, batch_size=2, img_size=64, max_gt=16,
                              cfg=cfg, epochs=10)
    batch = next(iter(b))
    assert batch["images"].shape == (2, 64, 64, 3)
    assert batch["gt_mask"].dtype == bool
    # epoch counter advances after a full pass
    for _ in b:
        pass
    assert b.epoch >= 1


class _FixedDraws:
    """rng stub: uniform() pops scripted values; other methods delegate."""

    def __init__(self, draws, base=None):
        self.draws = list(draws)
        self.base = base or np.random.default_rng(0)

    def uniform(self, *a, **k):
        if self.draws:
            return self.draws.pop(0)
        return self.base.uniform(*a, **k)

    def __getattr__(self, name):
        return getattr(self.base, name)


def test_random_perspective_identity():
    from ood_in_object_detection_tpu.data.augment import random_perspective

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    boxes = np.asarray([[8.0, 8.0, 40.0, 48.0]], np.float32)
    cls = np.asarray([1.0])
    cfg = AugmentConfig(degrees=0, translate=0, scale=0, shear=0, perspective=0)
    out, b, c = random_perspective(img, boxes, cls, 64, cfg, rng)
    np.testing.assert_array_equal(out, img)
    np.testing.assert_allclose(b, boxes, atol=1e-4)
    assert list(c) == [1.0]


def test_random_perspective_pure_rotation_90():
    """Scripted 90° rotation: draws = P(0,0), angle=90, scale=1, shear(0,0),
    T(0.5S, 0.5S) — a centred quarter turn. A box offset toward +x must land
    offset toward -y (counter-clockwise in image coords)."""
    from ood_in_object_detection_tpu.data.augment import random_perspective

    S = 64
    img = np.zeros((S, S, 3), np.uint8)
    boxes = np.asarray([[40.0, 28.0, 56.0, 36.0]], np.float32)  # right of centre
    cls = np.asarray([0.0])
    cfg = AugmentConfig(degrees=90, translate=0.0, scale=0, shear=0, perspective=0)
    # draws: P(x,y)=0, angle=90, scale=1, shear(x,y)=0, T fractions=0.5
    rng = _FixedDraws([0.0, 0.0, 90.0, 1.0, 0.0, 0.0, 0.5, 0.5])
    _, b, _ = random_perspective(img, boxes, cls, S, cfg, rng)
    # centre (48, 32) -> rotates to (32, 16); w/h swap
    np.testing.assert_allclose((b[0, 0] + b[0, 2]) / 2, 32, atol=1e-3)
    np.testing.assert_allclose((b[0, 1] + b[0, 3]) / 2, 16, atol=1e-3)
    np.testing.assert_allclose(b[0, 2] - b[0, 0], 8, atol=1e-3)
    np.testing.assert_allclose(b[0, 3] - b[0, 1], 16, atol=1e-3)


def test_random_perspective_shear_and_perspective_filter():
    """Heavy shear/perspective must keep boxes in-bounds and drop degenerate
    ones via box_candidates."""
    from ood_in_object_detection_tpu.data.augment import random_perspective

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    boxes = np.asarray([[2.0, 2.0, 60.0, 60.0], [30.0, 30.0, 32.0, 32.0]], np.float32)
    cls = np.asarray([0.0, 1.0])
    cfg = AugmentConfig(degrees=10, translate=0.1, scale=0.5, shear=10,
                        perspective=0.0005)
    out, b, c = random_perspective(img, boxes, cls, 64, cfg, rng)
    assert out.shape == (64, 64, 3)
    assert len(b) == len(c) <= 2
    if len(b):
        assert b.min() >= 0 and b.max() <= 64
        assert (b[:, 2] > b[:, 0]).all() and (b[:, 3] > b[:, 1]).all()


def test_mixup_blend_concats_and_interpolates():
    from ood_in_object_detection_tpu.data.augment import mixup_blend

    img1 = np.zeros((8, 8, 3), np.uint8)
    img2 = np.full((8, 8, 3), 200, np.uint8)
    b1 = np.asarray([[0.0, 0, 4, 4]], np.float32)
    b2 = np.asarray([[2.0, 2, 6, 6]], np.float32)
    img, b, c = mixup_blend(img1, b1, np.asarray([0.0]), img2, b2,
                            np.asarray([1.0]), np.random.default_rng(0))
    assert len(b) == 2 and len(c) == 2
    assert 0 < img.mean() < 200  # genuinely blended


def test_copy_paste_flip_pastes_mirrored_object():
    from ood_in_object_detection_tpu.data.augment import copy_paste_flip

    img = np.zeros((32, 32, 3), np.uint8)
    img[10:20, 2:10] = 255  # object on the left
    boxes = np.asarray([[2.0, 10, 10, 20]], np.float32)
    img2, b, c = copy_paste_flip(img, boxes, np.asarray([4.0]), 1.0,
                                 np.random.default_rng(0))
    assert len(b) == 2 and c.tolist() == [4.0, 4.0]
    # mirrored copy landed on the right at x in [22, 30)
    assert img2[10:20, 22:30].mean() == 255
    np.testing.assert_allclose(b[1], [22, 10, 30, 20])


def test_box_candidates_filters():
    from ood_in_object_detection_tpu.data.augment import box_candidates

    before = np.asarray([[0, 0, 20, 20], [0, 0, 20, 20], [0, 0, 20, 20]], np.float32)
    after = np.asarray([[0, 0, 20, 20],      # fine
                        [0, 0, 1.5, 20],     # too thin
                        [0, 0, 4, 4]], np.float32)  # lost >90% area
    keep = box_candidates(before, after)
    assert keep.tolist() == [True, False, False]


def test_augmented_sample_mixup_path(ds):
    cfg = AugmentConfig(mosaic=1.0, mixup=1.0, copy_paste=0.3)
    img, boxes, cls = augmented_sample(ds, 0, 64, cfg, np.random.default_rng(5))
    assert img.shape == (64, 64, 3)
    assert len(boxes) == len(cls)


def test_train_batcher_workers_deterministic(ds):
    """Parallel decode (spawned per-sample rng streams) yields bit-identical
    batches to the serial path at the same seed."""
    kw = dict(batch_size=4, img_size=64, max_gt=16,
              cfg=AugmentConfig(close_mosaic=0), epochs=2, seed=3)
    b1 = AugmentedTrainBatcher(ds, workers=1, **kw)
    b4 = AugmentedTrainBatcher(ds, workers=4, **kw)
    for batch1, batch4 in zip(b1, b4):
        for k in batch1:
            np.testing.assert_array_equal(batch1[k], batch4[k])

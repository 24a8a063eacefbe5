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

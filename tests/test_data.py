"""Dataset layer: letterbox math, YAML/COCO-JSON loaders, OWOD filtering."""

import json

import numpy as np
import pytest

from ood_in_object_detection_tpu.data import DetectionDataset
from ood_in_object_detection_tpu.data.letterbox import (
    letterbox_np, letterbox_params, scale_boxes_back,
)


def test_letterbox_params_and_roundtrip():
    r, (uw, uh), (dw, dh) = letterbox_params(480, 640, (640, 640))
    assert r == 1.0 and (uw, uh) == (640, 480) and (dw, dh) == (0.0, 80.0)
    # boxes mapped out and back are identical
    boxes = np.array([[10.0, 20.0, 100.0, 200.0]])
    lb = boxes * r + np.array([dw, dh, dw, dh])
    back = scale_boxes_back(lb, ((r, r), (dw, dh)), (480, 640))
    np.testing.assert_allclose(back, boxes)


def test_letterbox_np_pads_with_114(rng):
    img = rng.integers(0, 255, (100, 50, 3), dtype=np.uint8)
    out, ((r, _), (dw, dh)) = letterbox_np(img, (128, 128))
    assert out.shape == (128, 128, 3)
    assert abs(r - 1.28) < 1e-9
    # left/right bands are padding
    assert (out[:, :int(dw) - 1] == 114).all()


@pytest.fixture
def coco_json_ds(tmp_path, rng):
    from PIL import Image

    imgs = []
    for i in range(2):
        f = tmp_path / f"v_{i:04d}.jpg"
        Image.fromarray(rng.integers(0, 255, (40, 60, 3), dtype=np.uint8)).save(f)
        imgs.append({"id": i + 1, "file_name": f.name, "height": 40, "width": 60})
    anns = [
        {"image_id": 1, "category_id": 7, "bbox": [10, 10, 20, 15]},
        {"image_id": 2, "category_id": 3, "bbox": [0, 0, 30, 30]},
        {"image_id": 99, "category_id": 3, "bbox": [0, 0, 1, 1]},  # missing img
    ]
    j = tmp_path / "tao.json"
    j.write_text(json.dumps({"images": imgs, "annotations": anns}))
    return j, tmp_path


def test_coco_json_dataset_with_remap(coco_json_ds):
    j, root = coco_json_ds
    ds = DetectionDataset.from_coco_json(
        str(j), str(root), names=[f"c{k}" for k in range(10)],
        category_id_to_class={7: 0, 3: 1})
    assert len(ds) == 2
    lb = {l.im_file.split("/")[-1]: l for l in ds.labels}
    assert lb["v_0000.jpg"].cls.tolist() == [0.0]
    # cxcywh normalized: bbox [10,10,20,15] in 60x40 -> cx=(10+10)/60
    np.testing.assert_allclose(lb["v_0000.jpg"].bboxes[0],
                               [20 / 60, 17.5 / 40, 20 / 60, 15 / 40], rtol=1e-6)
    assert lb["v_0001.jpg"].cls.tolist() == [1.0]


def test_unsniffer_mixed_merges_annotations(tmp_path, rng):
    from PIL import Image

    f = tmp_path / "000000000001.jpg"
    Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)).save(f)
    base = {"images": [{"id": 1, "file_name": f.name, "height": 40, "width": 40}]}
    ind = dict(base, annotations=[{"image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10]}])
    ood = dict(base, annotations=[{"image_id": 1, "category_id": 81, "bbox": [20, 20, 10, 10]}])
    p1 = tmp_path / "ind.json"; p1.write_text(json.dumps(ind))
    p2 = tmp_path / "ood.json"; p2.write_text(json.dumps(ood))
    ds = DetectionDataset.from_unsniffer_json(
        [str(p1), str(p2)], str(tmp_path), [f"c{k}" for k in range(20)], "mixed",
        coco_to_owod_mapping={0: 5})
    assert len(ds) == 1
    # category 1 -> coco idx 0 -> owod 5; category 81 -> unknown 80
    assert sorted(ds.labels[0].cls.tolist()) == [5.0, 80.0]


def test_filter_classes_and_task_limiting(tmp_path, rng):
    from PIL import Image

    files = []
    for i, name in enumerate(["aaa", "bbb"]):
        f = tmp_path / "images" / f"{name}.jpg"
        f.parent.mkdir(exist_ok=True)
        Image.fromarray(rng.integers(0, 255, (20, 20, 3), dtype=np.uint8)).save(f)
        (tmp_path / "labels").mkdir(exist_ok=True)
        (tmp_path / "labels" / f"{name}.txt").write_text(f"{i * 5} 0.5 0.5 0.5 0.5\n")
        files.append(str(f))
    ds = DetectionDataset.from_image_list(files, [f"c{k}" for k in range(10)])
    tasks = tmp_path / "tasks"
    tasks.mkdir()
    (tasks / "t1_train.txt").write_text("aaa\n")
    ds.limit_images_by_task("t1", "train", str(tasks))
    assert len(ds) == 1 and ds.labels[0].im_file.endswith("aaa.jpg")
    ds.filter_classes([0, 1, 2])
    assert ds.labels[0].cls.tolist() == [0.0]

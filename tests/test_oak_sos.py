"""OAK converter + SOS segmentation-to-COCO tooling (data/oak_sos.py vs
reference datasets_utils/{oak,sos})."""

import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from ood_in_object_detection_tpu.data import DetectionDataset
from ood_in_object_detection_tpu.data.oak_sos import (
    convert_oak_to_yolo, oak_annotations_to_yolo_lines, segmentation_to_bbox,
    sos_to_coco_json,
)


def test_oak_lines_normalized_and_filtered():
    anns = [
        {"id": 0, "category": "person", "box2d": {"x1": 10, "y1": 20, "x2": 30, "y2": 60}},
        {"id": 5, "category": "rare", "box2d": {"x1": 0, "y1": 0, "x2": 10, "y2": 10}},
    ]
    lines = oak_annotations_to_yolo_lines(anns, n_classes=3, img_w=100, img_h=100)
    assert len(lines) == 1  # class 5 dropped
    c, cx, cy, w, h = lines[0].split()
    assert c == "0" and float(cx) == 0.2 and float(cy) == 0.4
    assert float(w) == 0.2 and float(h) == 0.4


def test_convert_oak_to_yolo_end_to_end(tmp_path):
    src = tmp_path / "OAK"
    for split in ("train", "val"):
        (src / split / "Raw" / "vid1").mkdir(parents=True)
        (src / split / "Labels" / "vid1").mkdir(parents=True)
        img = Image.fromarray(np.zeros((40, 60, 3), np.uint8))
        img.save(src / split / "Raw" / "vid1" / "f0.jpg")
        (src / split / "Labels" / "vid1" / "f0.json").write_text(json.dumps([
            {"id": 1, "category": "bicycle",
             "box2d": {"x1": 6, "y1": 4, "x2": 30, "y2": 20}},
        ]))
    dst = tmp_path / "OAK_yolo"
    yaml_path = convert_oak_to_yolo(str(src), str(dst), {"person": 0, "bicycle": 1})
    assert Path(yaml_path).exists()
    assert (dst / "train.txt").read_text().strip().endswith("f0.jpg")
    lab = (dst / "labels" / "train" / "vid1" / "f0.txt").read_text().split()
    assert lab[0] == "1"
    # loadable by the standard YOLO-txt dataset
    ds = DetectionDataset.from_yaml(yaml_path, split="train")
    assert len(ds) == 1 and ds.labels[0].cls.tolist() == [1.0]
    np.testing.assert_allclose(ds.labels[0].bboxes[0], [0.3, 0.3, 0.4, 0.4])


def test_segmentation_to_bbox():
    seg = np.zeros((20, 20), np.uint8)
    seg[5:10, 3:8] = 7
    assert segmentation_to_bbox(seg, 7) == (3, 5, 7, 9)
    assert segmentation_to_bbox(seg, 9) == (0, 0, 0, 0)


def test_sos_to_coco_json_and_dataset(tmp_path):
    img_dir = tmp_path / "images"
    seg_dir = tmp_path / "segs"
    img_dir.mkdir(); seg_dir.mkdir()
    Image.fromarray(np.zeros((30, 50, 3), np.uint8)).save(img_dir / "a.jpg")
    seg = np.zeros((30, 50), np.uint8)
    seg[4:14, 10:20] = 1   # instance 1
    seg[20:28, 30:45] = 2  # instance 2
    Image.fromarray(seg).save(seg_dir / "a.png")
    out = sos_to_coco_json(str(img_dir), str(seg_dir), str(tmp_path / "sos.json"))
    data = json.loads(Path(out).read_text())
    assert len(data["images"]) == 1 and len(data["annotations"]) == 2
    ds = DetectionDataset.from_coco_json(out, str(img_dir),
                                         names=["bg", "street_obstacle"])
    assert len(ds) == 1 and len(ds.labels[0].cls) == 2

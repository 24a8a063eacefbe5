"""In-process CLI smoke: ood_eval end-to-end on a synthetic dataset."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_yaml(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("clids")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        img = rng.uniform(0, 255, (60, 80, 3)).astype(np.uint8)
        Image.fromarray(img).save(root / "images" / f"img{i}.jpg")
        (root / "labels" / f"img{i}.txt").write_text(f"{i % 2} 0.5 0.5 0.4 0.5\n")
    (root / "train.txt").write_text(
        "\n".join(f"./images/img{i}.jpg" for i in range(4)))
    (root / "val.txt").write_text(
        "\n".join(f"./images/img{i}.jpg" for i in range(2)))
    (root / "data.yaml").write_text(
        "path: .\ntrain: train.txt\nval: val.txt\nnames:\n  0: cat\n  1: dog\n")
    return str(root / "data.yaml")


def test_ood_eval_cli_end_to_end(tiny_yaml, tmp_path, monkeypatch):
    from ood_in_object_detection_tpu import constants as C
    from ood_in_object_detection_tpu.cli import ood_eval

    monkeypatch.setattr(C, "RESULTS_PATH", tmp_path / "results")
    monkeypatch.setattr(C, "STORAGE_PATH", tmp_path / "storage")
    ood_eval.main([
        "--ood_method", "MSP", "--model", "n", "--model_version", "yolov8",
        "--ind_dataset", tiny_yaml, "--ood_datasets", tiny_yaml,
        "--conf_thr_train", "1e-9", "--conf_thr_test", "1e-9",
        "--img_size", "64", "--batch_size", "4", "--name", "smoke",
    ])
    csvs = list((tmp_path / "results").glob("*smoke.csv"))
    assert len(csvs) == 1
    header = csvs[0].read_text().splitlines()[0]
    for col in ("Method", "conf_thr_train", "tpr_thr", "Model", "custom_hyp"):
        assert col in header


def test_cli_parsers_reject_bad_values(tiny_yaml):
    from ood_in_object_detection_tpu.cli.ood_eval import build_parser

    with pytest.raises(SystemExit):
        build_parser().parse_args(["--ood_method", "MSP", "--model", "zz",
                                   "--ind_dataset", "x", "--ood_datasets", "y"])
    with pytest.raises(SystemExit):
        build_parser().parse_args([])  # required args missing

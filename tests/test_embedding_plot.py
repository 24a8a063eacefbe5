"""Embedding CLI (cli/embedding_plot.py vs create_umap_representation.py):
modes, known/unknown split, per-stride + grid-search surfaces."""

import pickle

import numpy as np
import pytest

from ood_in_object_detection_tpu.cli.embedding_plot import main


@pytest.fixture(scope="module")
def acts_file(tmp_path_factory):
    """roi_feats layout: [class][stride] = (N, C) arrays (pipeline format),
    4 classes x 3 strides; classes 0-1 known, 2-3 unknown."""
    rng = np.random.default_rng(0)
    acts = []
    for c in range(4):
        per_stride = []
        for s, ch in enumerate((16, 32, 64)):
            centre = np.zeros(ch)
            centre[c % ch] = 5.0
            per_stride.append((rng.normal(0, 0.3, (80, ch)) + centre).astype(np.float32))
        acts.append(per_stride)
    f = tmp_path_factory.mktemp("emb") / "acts.pkl"
    f.write_bytes(pickle.dumps({"roi_feats": acts}))
    return str(f)


def test_pca_mode_all_strides(acts_file, tmp_path):
    main(["--activations", acts_file, "--mode", "pca",
          "--number_of_known_classes", "2", "--out_dir", str(tmp_path)])
    assert (tmp_path / "pca_all.png").exists()
    assert (tmp_path / "pca_all_known.png").exists()


def test_sdr_mode_one_per_stride(acts_file, tmp_path):
    main(["--activations", acts_file, "--mode", "sdr", "--epochs", "3",
          "--number_of_known_classes", "2", "--one_per_stride",
          "--out_dir", str(tmp_path)])
    for s in range(3):
        assert (tmp_path / f"sdr_s{s}.png").exists()


def test_pca_sdr_single_stride(acts_file, tmp_path):
    main(["--activations", acts_file, "--mode", "pca_sdr", "--epochs", "3",
          "--number_of_known_classes", "2", "--stride", "1",
          "--out_dir", str(tmp_path)])
    assert (tmp_path / "pca_sdr_s1.png").exists()

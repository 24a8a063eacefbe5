"""Benchmark sweep execution evidence (VERDICT r3 missing #3).

Drives `cli.ood_eval --benchmark ...` end-to-end on a tiny on-disk dataset,
asserting the reference's sweep semantics (ood_evaluation.py:847-1342):
one CSV row per grid point, InD-pipeline reuse across test-time-knob
iterations (:1031, :1217), and slim-prediction-cache hits when
BENCHMARK_MODE is on (ood_utils.py:450-482).
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def bench_yaml(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("benchds")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.default_rng(1)
    for i in range(4):
        img = rng.uniform(0, 255, (64, 64, 3)).astype(np.uint8)
        Image.fromarray(img).save(root / "images" / f"img{i}.jpg")
        (root / "labels" / f"img{i}.txt").write_text(f"{i % 2} 0.5 0.5 0.4 0.5\n")
    (root / "train.txt").write_text(
        "\n".join(f"./images/img{i}.jpg" for i in range(4)))
    (root / "val.txt").write_text(
        "\n".join(f"./images/img{i}.jpg" for i in range(4)))
    (root / "data.yaml").write_text(
        "path: .\ntrain: train.txt\nval: val.txt\nnames:\n  0: cat\n  1: dog\n")
    return str(root / "data.yaml")


def _run(args_extra, tmp_path, monkeypatch, grids):
    from ood_in_object_detection_tpu import constants as C
    from ood_in_object_detection_tpu.cli import ood_eval

    monkeypatch.setattr(C, "RESULTS_PATH", tmp_path / "results")
    monkeypatch.setattr(C, "STORAGE_PATH", tmp_path / "storage")
    monkeypatch.setattr(C, "TEMPORAL_STORAGE_PATH", tmp_path / "temp")
    monkeypatch.setattr(C, "BENCHMARKS", {**C.BENCHMARKS, **grids})
    calls = {"configure_ind": 0}
    orig_cfg = ood_eval.configure_ind

    def cfg_spy(*a, **kw):
        calls["configure_ind"] += 1
        return orig_cfg(*a, **kw)

    monkeypatch.setattr(ood_eval, "configure_ind", cfg_spy)
    ood_eval.main(args_extra)
    return calls


def test_benchmark_conf_thr_test_sweep(bench_yaml, tmp_path, monkeypatch):
    """conf_thr_test sweep: the InD pipeline is fitted ONCE and only the eval
    re-runs per grid value (reference ood_evaluation.py:1031 — the fit is
    outside the loop)."""
    grid = [0.01, 1e-6]
    calls = _run([
        "--ood_method", "MSP", "--model", "n", "--model_version", "yolov8",
        "--ind_dataset", bench_yaml, "--ood_datasets", bench_yaml,
        "--conf_thr_train", "1e-9", "--benchmark", "conf_thr_test",
        "--img_size", "64", "--batch_size", "4", "--name", "bconf",
    ], tmp_path, monkeypatch, {"conf_thr_test": grid})

    assert calls["configure_ind"] == 1  # InD fit reused across the grid
    csvs = list((tmp_path / "results").glob("*conf_thr_test_bconf.csv"))
    assert len(csvs) == 1
    lines = [l for l in csvs[0].read_text().splitlines() if l.strip()]
    assert len(lines) == 1 + len(grid)  # header + one row per grid point
    confs = []
    header = lines[0].split(",")
    idx = header.index("conf_thr_test")
    import csv as csvmod
    import io

    for row in csvmod.reader(io.StringIO("\n".join(lines[1:]))):
        confs.append(float(row[idx]))
    assert confs == grid


def test_benchmark_fusion_strategies_sweep(bench_yaml, tmp_path, monkeypatch):
    """fusion_strategies sweep: one InD fit per fusion METHOD, reused across
    the three strategies (reference :1217 — strategy is a test-time knob);
    with BENCHMARK_MODE the second and third strategy evals hit the slim
    prediction cache and never re-run the forward."""
    from ood_in_object_detection_tpu.core.config import CUSTOM_HYP
    from ood_in_object_detection_tpu.ood import pipeline as pl

    monkeypatch.setattr(CUSTOM_HYP, "BENCHMARK_MODE", True)
    strategies = ["and", "or", "score"]
    grids = {"fusion_strategies": [["fusion-MSP-Energy"], strategies]}

    step_runs = {"n": 0}
    orig_step = pl._predict_step

    def counting_step(detector, conf_thres, mesh=None, **kw):
        fn = orig_step(detector, conf_thres, mesh, **kw)

        def wrapped(images):
            step_runs["n"] += 1
            return fn(images)

        # only count the eval-conf step (the fit uses conf_thr_train)
        return wrapped if conf_thres == pytest.approx(1e-3) else fn

    monkeypatch.setattr(pl, "_predict_step", counting_step)

    calls = _run([
        "--ood_method", "fusion-MSP-Energy", "--model", "n",
        "--model_version", "yolov8",
        "--ind_dataset", bench_yaml, "--ood_datasets", bench_yaml,
        "--conf_thr_train", "1e-9", "--conf_thr_test", "1e-3",
        "--benchmark", "fusion_strategies",
        "--img_size", "64", "--batch_size", "4", "--name", "bfus",
    ], tmp_path, monkeypatch, grids)

    assert calls["configure_ind"] == 1  # one fit for the single fusion method
    csvs = list((tmp_path / "results").glob("*fusion_strategies_bfus.csv"))
    assert len(csvs) == 1
    lines = [l for l in csvs[0].read_text().splitlines() if l.strip()]
    assert len(lines) == 1 + len(strategies)
    header = lines[0].split(",")
    idx = header.index("fusion_strat")
    import csv as csvmod
    import io

    strats = [row[idx] for row in csvmod.reader(io.StringIO("\n".join(lines[1:])))]
    assert strats == strategies

    # slim cache: 1 batch x 3 strategy evals, but the forward ran only once —
    # evals 2 and 3 loaded the post-NMS cache (ood/pipeline.py _predict)
    assert step_runs["n"] == 1
    cache_files = list((tmp_path / "temp").glob("*.pkl"))
    assert len(cache_files) == 1  # one batch, one slim cache entry


def _csv_rows(tmp_path, pattern):
    import csv as csvmod
    import io

    csvs = list((tmp_path / "results").glob(pattern))
    assert len(csvs) == 1, csvs
    lines = [l for l in csvs[0].read_text().splitlines() if l.strip()]
    header = lines[0].split(",")
    rows = list(csvmod.reader(io.StringIO("\n".join(lines[1:]))))
    return header, rows


def _col(header, rows, name):
    i = header.index(name)
    return [r[i] for r in rows]


def _count_extractions(monkeypatch):
    """Count real (non-cache-hit) InD activation extractions."""
    from ood_in_object_detection_tpu.cli import ood_eval

    n = {"extract": 0}
    orig = ood_eval.extract_ind_activations

    def spy(*a, **kw):
        n["extract"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(ood_eval, "extract_ind_activations", spy)
    return n


BASE = ["--model", "n", "--model_version", "yolov8",
        "--conf_thr_train", "1e-9", "--conf_thr_test", "1e-3",
        "--img_size", "64", "--batch_size", "4"]


def test_benchmark_used_tpr_sweep(bench_yaml, tmp_path, monkeypatch):
    """used_tpr sweep: the InD activations are extracted ONCE and every later
    tpr point reloads them from the disk cache, refitting only thresholds
    (reference ood_evaluation.py:855-906 — load_ind_activations is forced
    after the first iteration)."""
    n = _count_extractions(monkeypatch)
    grid = [0.95, 0.8]
    calls = _run(["--ood_method", "MSP", "--ind_dataset", bench_yaml,
                  "--ood_datasets", bench_yaml, "--benchmark", "used_tpr",
                  "--name", "btpr"] + BASE,
                 tmp_path, monkeypatch, {"used_tpr": grid})
    assert calls["configure_ind"] == len(grid)  # thresholds refit per point
    assert n["extract"] == 1                    # activations extracted once
    header, rows = _csv_rows(tmp_path, "*used_tpr_btpr.csv")
    assert [float(v) for v in _col(header, rows, "tpr_thr")] == grid


def test_benchmark_conf_thr_train_sweep(bench_yaml, tmp_path, monkeypatch):
    """conf_thr_train sweep: a FULL refit per grid point — the train conf
    changes which predictions feed the fit, so activations re-extract every
    time (reference :919-1009)."""
    n = _count_extractions(monkeypatch)
    grid = [1e-9, 1e-8]
    calls = _run(["--ood_method", "MSP", "--ind_dataset", bench_yaml,
                  "--ood_datasets", bench_yaml, "--benchmark", "conf_thr_train",
                  "--name", "bctr"] + BASE,
                 tmp_path, monkeypatch, {"conf_thr_train": grid})
    assert calls["configure_ind"] == len(grid)
    assert n["extract"] == len(grid)  # no reuse: refit from scratch per point
    header, rows = _csv_rows(tmp_path, "*conf_thr_train_bctr.csv")
    assert [float(v) for v in _col(header, rows, "conf_thr_train")] == grid


def test_benchmark_which_split_sweep(bench_yaml, tmp_path, monkeypatch):
    """which_split sweep: 'train' extracts train only; 'val' and 'train_val'
    ALSO extract the val split (reference obtain_ind_activations is called
    twice when which_split is in ['train_val','val'], ood_evaluation.py:
    484-490); clusters always fit from train, threshold scores from the
    selected split (:521-527, :540-562)."""
    n = _count_extractions(monkeypatch)
    grid = ["train", "val", "train_val"]
    calls = _run(["--ood_method", "MSP", "--ind_dataset", bench_yaml,
                  "--ood_datasets", bench_yaml,
                  "--benchmark", "which_split_for_ind_scores",
                  "--name", "bsplit"] + BASE,
                 tmp_path, monkeypatch, {"which_split_for_ind_scores": grid})
    assert calls["configure_ind"] == len(grid)
    assert n["extract"] == 1 + 2 + 2  # train / train+val / train+val
    header, rows = _csv_rows(tmp_path, "*which_split_for_ind_scores_bsplit.csv")
    assert _col(header, rows, "which_split") == grid


def test_benchmark_cluster_methods_sweep(bench_yaml, tmp_path, monkeypatch):
    """cluster_methods sweep: a fresh method per grid value, full refit each
    (reference :1037-1128)."""
    grid = ["one", "KMeans_3"]
    calls = _run(["--ood_method", "L2_cl_stride", "--ind_dataset", bench_yaml,
                  "--ood_datasets", bench_yaml, "--benchmark", "cluster_methods",
                  "--name", "bclus"] + BASE,
                 tmp_path, monkeypatch, {"cluster_methods": grid})
    assert calls["configure_ind"] == len(grid)
    header, rows = _csv_rows(tmp_path, "*cluster_methods_bclus.csv")
    assert _col(header, rows, "cluster_method") == grid
    # centroid-count fidelity per algorithm is covered by the clustering
    # cross-exec parity suite; this random-init fixture yields no matched
    # preds, so mean_n_clus is 0.0 for every grid point here


def test_benchmark_logits_methods_sweep(bench_yaml, tmp_path, monkeypatch):
    """logits_methods sweep: one row per logits method name (reference
    :1130-1180)."""
    grid = ["MSP", "Energy"]
    calls = _run(["--ood_method", "MSP", "--ind_dataset", bench_yaml,
                  "--ood_datasets", bench_yaml, "--benchmark", "logits_methods",
                  "--name", "blog"] + BASE,
                 tmp_path, monkeypatch, {"logits_methods": grid})
    assert calls["configure_ind"] == len(grid)
    header, rows = _csv_rows(tmp_path, "*logits_methods_blog.csv")
    assert _col(header, rows, "Method") == grid


def test_benchmark_best_methods_sweep(bench_yaml, tmp_path, monkeypatch):
    """best_methods sweep: mixed method kinds, one full run each (reference
    :1182-1215)."""
    grid = ["MSP", "L2_cl_stride"]
    calls = _run(["--ood_method", "MSP", "--ind_dataset", bench_yaml,
                  "--ood_datasets", bench_yaml, "--benchmark", "best_methods",
                  "--name", "bbest"] + BASE,
                 tmp_path, monkeypatch, {"best_methods": grid})
    assert calls["configure_ind"] == len(grid)
    header, rows = _csv_rows(tmp_path, "*best_methods_bbest.csv")
    assert _col(header, rows, "Method") == grid


def test_benchmark_unk_loc_enhancement_sweep(bench_yaml, tmp_path, monkeypatch):
    """unk_loc_enhancement sweep: BENCHMARK_MODE turns on the slim prediction
    cache — the forward runs ONCE for the first combo, every later combo
    re-evaluates the cached post-NMS predictions (+ stride-8 neck map) with
    different CUSTOM_HYP.unk knobs (reference ood_evaluation.py:1283-1342,
    cache at ood_utils.py:475-482). The mode flag is restored afterwards
    (ADVICE r4: the reference leaks it; library callers must not)."""
    import copy

    from ood_in_object_detection_tpu.core.config import CUSTOM_HYP
    from ood_in_object_detection_tpu.ood import pipeline as pl

    # snapshot the knobs the sweep mutates (they leak by reference semantics)
    prior_unk = copy.deepcopy(CUSTOM_HYP.unk)
    assert CUSTOM_HYP.BENCHMARK_MODE is False

    step_runs = {"n": 0}
    orig_step = pl._predict_step

    def counting_step(detector, conf_thres, mesh=None, **kw):
        fn = orig_step(detector, conf_thres, mesh, **kw)

        def wrapped(images):
            step_runs["n"] += 1
            return fn(images)

        return wrapped if conf_thres == pytest.approx(1e-3) else fn

    monkeypatch.setattr(pl, "_predict_step", counting_step)

    grid = {"unk.rank.MAX_NUM_UNK_BOXES_PER_IMAGE": [3, 5],
            "unk.rank.NMS": [0.5]}
    try:
        calls = _run(["--ood_method", "L2_cl_stride",
                      "--which_internal_activations", "ftmaps_and_strides",
                      "--ind_dataset", bench_yaml, "--ood_datasets", bench_yaml,
                      "--benchmark", "unk_loc_enhancement",
                      "--name", "bunk"] + BASE,
                     tmp_path, monkeypatch, {"unk_loc_enhancement": [grid]})
    finally:
        CUSTOM_HYP.unk = prior_unk
    assert calls["configure_ind"] == 1  # fit once, outside the combo loop
    assert CUSTOM_HYP.BENCHMARK_MODE is False  # restored after the sweep
    header, rows = _csv_rows(tmp_path, "*unk_loc_enhancement_bunk.csv")
    assert len(rows) == 2  # one row per combo
    # the forward ran only for combo 1 (1 batch); combo 2 hit the slim cache
    assert step_runs["n"] == 1
    cache_files = list((tmp_path / "temp").glob("*_eul_*.pkl"))
    assert len(cache_files) == 1  # one batch, one cached slim prediction

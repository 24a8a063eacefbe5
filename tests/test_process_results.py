"""The results-aggregation CLI (reference process_results.ipynb capability)."""

import pandas as pd

from ood_in_object_detection_tpu.cli.process_results import main, pareto_front


def _write_csv(path, rows):
    pd.DataFrame(rows).to_csv(path, index=False)


def test_process_results_end_to_end(tmp_path):
    res = tmp_path / "results"
    res.mkdir()
    _write_csv(res / "a.csv", [
        {"Method": "MSP", "conf_thr_test": 0.45,
         "mAP_(VOC_test)": 0.69, "U-F1_(COOD)": 0.20},
        {"Method": "MSP", "conf_thr_test": 0.30,
         "mAP_(VOC_test)": 0.66, "U-F1_(COOD)": 0.22},
    ])
    _write_csv(res / "b.csv", [
        {"Method": "Cosine_cl_stride", "conf_thr_test": 0.50,
         "mAP_(VOC_test)": 0.64, "U-F1_(COOD)": 0.25},
        {"Method": "Energy", "conf_thr_test": 0.45,
         "mAP_(VOC_test)": 0.60, "U-F1_(COOD)": 0.10},  # dominated
    ])

    rc = main(["--results_dir", str(res)])
    assert rc == 0
    out = res / "processed"
    summary = pd.read_csv(out / "summary.csv")
    assert len(summary) == 4 and summary.iloc[0]["U-F1_(COOD)"] == 0.25
    best = pd.read_csv(out / "best_per_method.csv")
    assert set(best["Method"]) == {"MSP", "Cosine_cl_stride", "Energy"}
    # MSP's best by U-F1 is the 0.22 row
    assert float(best[best.Method == "MSP"]["U-F1_(COOD)"].iloc[0]) == 0.22
    front = pd.read_csv(out / "pareto.csv")
    assert "Energy" not in set(front["Method"])  # dominated row excluded
    assert (out / "pareto.png").exists()


def test_pareto_front_logic():
    df = pd.DataFrame({
        "Method": ["a", "b", "c"],
        "x": [1.0, 2.0, 1.5],
        "y": [3.0, 1.0, 2.0],
    })
    front = pareto_front(df, "x", "y")
    assert list(front["Method"]) == ["a", "c", "b"]


def test_fusion_scatter_artifact(tmp_path):
    """--fusion_npz renders the score-fusion member scatter PNG
    (reference score_fusion_plot.ipynb capability, VERDICT r2 missing #5)."""
    import numpy as np

    from ood_in_object_detection_tpu.cli.process_results import main

    rng = np.random.default_rng(0)
    n = 200
    ind = np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n)])
    npz = tmp_path / "fusion.npz"
    np.savez(npz, member_names=np.asarray(["Energy", "L2_cl_stride"]),
             indness=ind.astype(np.float32),
             decision=(ind.min(axis=0) > 0).astype(np.int32),
             cls=rng.integers(0, 3, n), conf=rng.uniform(0.2, 1, n))
    out = tmp_path / "viz" / "scatter.png"
    main(["--fusion_npz", str(npz), "--fusion_out", str(out)])
    assert out.exists() and out.stat().st_size > 10_000

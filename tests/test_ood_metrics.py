"""AUROC / FPR95 / AUPR score metrics (eval/ood_metrics.py)."""

import numpy as np

from ood_in_object_detection_tpu.eval.ood_metrics import (
    auroc, aupr, fpr_at_tpr, ood_score_metrics,
)


def test_auroc_perfect_and_random(rng):
    ind = np.array([3.0, 4.0, 5.0])
    ood = np.array([0.0, 1.0, 2.0])
    assert auroc(ind, ood) == 1.0
    assert auroc(ood, ind) == 0.0
    # identical distributions -> ~0.5
    a = rng.normal(0, 1, 5000)
    b = rng.normal(0, 1, 5000)
    assert abs(auroc(a, b) - 0.5) < 0.03


def test_auroc_ties_count_half():
    ind = np.array([1.0, 1.0])
    ood = np.array([1.0, 1.0])
    assert auroc(ind, ood) == 0.5


def test_fpr_at_tpr():
    ind = np.linspace(0, 1, 101)          # threshold at 5th pct keeps 95%
    ood = np.linspace(-1, 0.2, 100)
    f = fpr_at_tpr(ind, ood, 0.95)
    # OoD scores >= ~0.05 are false positives
    expect = np.mean(ood >= np.percentile(ind, 5, method="lower"))
    assert abs(f - expect) < 1e-9


def test_aupr_perfect_separation():
    assert aupr(np.array([2.0, 3.0]), np.array([0.0, 1.0])) == 1.0


def test_metrics_dict_keys(rng):
    m = ood_score_metrics(rng.normal(1, 1, 100), rng.normal(-1, 1, 100))
    assert set(m) == {"AUROC", "FPR95", "AUPR"}
    assert m["AUROC"] > 0.75
    assert m["FPR95"] < 0.6

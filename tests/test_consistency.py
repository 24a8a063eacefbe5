"""The cross-backend consistency harness itself (utils/consistency.py):
determinism of the tap computation and the comparison logic. The real
TPU-vs-CPU run is `python __graft_entry__.py consistency` on the bench host."""

import numpy as np

from ood_in_object_detection_tpu.utils.consistency import (
    compare,
    compute_outputs,
)


def test_outputs_deterministic_and_compare_passes():
    a = compute_outputs(img=96, batch=1)
    b = compute_outputs(img=96, batch=1)
    assert set(a) == set(b) and "roi_feats" in a and "raw0" in a
    failures = compare(a, b)
    assert failures == []


def test_compare_flags_divergence():
    a = compute_outputs(img=96, batch=1)
    b = {k: v.copy() for k, v in a.items()}
    b["neck0"] = b["neck0"] + 0.5 * max(1e-6, np.abs(b["neck0"]).max())
    failures = compare(a, b)
    assert [k for k, _ in failures] == ["neck0"]

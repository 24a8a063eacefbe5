"""Weight-import converter round trip: every flax param/stat path must map to
a unique torch name, and values must land in the right slots with the right
layout transpose."""

import numpy as np
import jax
import jax.numpy as jnp

from ood_in_object_detection_tpu.models import build_model
from ood_in_object_detection_tpu.utils.weight_import import (
    import_state_dict, torch_name_for_path,
)


def _paths(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return [(tuple(getattr(k, "key", getattr(k, "name", str(k))) for k in kp), leaf)
            for kp, leaf in flat]


def test_round_trip_yolov8n():
    m = build_model("yolov8n", nc=4)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    detect_idx = len(m.spec) - 1  # Detect is the last spec entry (22 for v8)

    rng = np.random.default_rng(0)
    sd = {}
    names = set()
    for path, leaf in _paths(v["params"]) + _paths(v["batch_stats"]):
        name = torch_name_for_path(path, detect_idx)
        assert name not in names, f"duplicate torch name {name} for {path}"
        names.add(name)
        a = rng.normal(0, 1, leaf.shape).astype(np.float32)
        t = a.transpose(3, 2, 0, 1) if a.ndim == 4 else a  # store in torch layout
        sd[name] = t

    new_v, missing = import_state_dict(v, sd, detect_idx, strict=True)
    assert not missing
    # spot-check values land correctly (transpose round-trips)
    for path, leaf in _paths(new_v["params"])[:50]:
        name = torch_name_for_path(path, detect_idx)
        t = sd[name]
        expect = t.transpose(2, 3, 1, 0) if t.ndim == 4 else t
        np.testing.assert_array_equal(np.asarray(leaf), expect)


def test_torch_names_match_ultralytics_conventions():
    """The generated names must follow ultralytics state_dict conventions
    (model.{i}.{module}.conv.weight etc.) for the v8 topology."""
    m = build_model("yolov8n", nc=4)
    v = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0),
                                      jnp.zeros((1, 64, 64, 3)), train=False))
    names = {torch_name_for_path(p, 22) for p, _ in _paths(v["params"])}
    # layer 0 stem conv
    assert "model.0.conv.weight" in names
    # C2f layer 2 bottleneck 0
    assert "model.2.m.0.cv1.conv.weight" in names
    assert "model.2.cv1.bn.weight" in names
    # SPPF layer 9
    assert "model.9.cv2.conv.weight" in names
    # detect head box branch final conv bias
    assert "model.22.cv2.0.2.bias" in names
    assert "model.22.cv3.1.1.conv.weight" in names

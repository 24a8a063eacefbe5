"""Every registered model variant must build (eval_shape, no FLOPs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ood_in_object_detection_tpu.models import build_model
from ood_in_object_detection_tpu.models.yolo import SCALES

ALL_NAMES = sorted(
    f"{fam}{size}" for fam, sizes in SCALES.items() for size in sizes
)


@pytest.mark.parametrize("name", ALL_NAMES)
def test_model_builds(name):
    m = build_model(name, nc=7)
    x = jnp.zeros((1, 64, 64, 3))
    v = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), x, train=False))
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
    assert n > 100_000
    out = jax.eval_shape(lambda: m.init_with_output(jax.random.PRNGKey(0), x,
                                                    train=False)[0])
    raw_levels = out[0]
    assert len(raw_levels) == 3
    assert raw_levels[0].shape[-1] == 64 + 7  # 4*reg_max + nc

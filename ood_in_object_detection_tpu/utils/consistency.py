"""Cross-backend numerical consistency check of the jitted predict step.

The CPU test suite validates semantics; the TPU runs the perf path with bf16
MXU math and different layouts/fusions. This check runs ONE deterministic
batch through the engine's real predict step on the current (bench) backend
and on a CPU subprocess, and compares every tap within bf16 tolerance —
cheap insurance that the perf path computes the numbers the suite validates
(VERDICT r1 weak-item 8).

Determinism: threefry PRNG and flax initializers are backend-independent, so
both processes build bit-identical params/inputs from the same seed.

Usage: ``python -m ood_in_object_detection_tpu.utils.consistency`` (compare
current backend vs CPU) or ``--emit out.npz`` (just dump this backend's
outputs; used by the subprocess).
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

import numpy as np

# bf16 has ~3 decimal digits; conv chains accumulate to a few ULP of the
# activations' dynamic range. Tolerances are relative to each tensor's scale.
REL_TOL = 0.05


def compute_outputs(name: str = "yolov8n", img: int = 320, batch: int = 2,
                    seed: int = 0) -> dict:
    """Deterministic pre-NMS taps of the bf16 perf path.

    NMS keep-sets are tie-degenerate on random-init outputs (all confs nearly
    equal) and may legitimately differ across backends, so the comparison
    covers the raw head maps, the neck taps, and RoI/exact-position features
    on FIXED boxes/anchors — everything numeric upstream of the keep-set."""
    import jax
    import jax.numpy as jnp

    from ..models import build_model
    from ..ops.roi_align import roi_and_exact_batched

    model = build_model(name, nc=8, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(seed)
    images = jax.random.uniform(rng, (batch, img, img, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames="train")(
        rng, images[:1], train=False)

    n = 32
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed + 1), 3)
    xy = jax.random.uniform(k1, (batch, n, 2)) * (img * 0.7)
    wh = jax.random.uniform(k2, (batch, n, 2)) * (img * 0.3) + 2.0
    boxes = jnp.concatenate([xy, xy + wh], axis=-1)
    level = jax.random.randint(k3, (batch, n), 0, 3)

    @jax.jit
    def fwd(variables, images, boxes, level):
        raw_levels, neck = model.apply(variables, images, train=False)[:2]
        a_total = sum(f.shape[1] * f.shape[2] for f in neck)
        aidx = (jnp.arange(batch * n) * 7919 % a_total).reshape(batch, n)
        # the engine's real tap path: Pallas two-stage kernel on TPU for the
        # large levels, XLA folded einsum elsewhere (ops/roi_align.py) — at
        # 320 px P3 (40x40) crosses PALLAS_MIN_HW so the kernel is exercised
        roi, exact = roi_and_exact_batched(neck, boxes, aidx, level, img_w=img)
        return raw_levels, neck, roi, exact

    raw_levels, neck, roi, exact = fwd(variables, images, boxes, level)
    res = {"roi_feats": roi, "exact_feats": exact}
    for i, f in enumerate(raw_levels):
        res[f"raw{i}"] = f
    for i, f in enumerate(neck):
        res[f"neck{i}"] = f
    return {k: np.asarray(v, np.float32) for k, v in res.items()}


def compare(a: dict, b: dict, rel_tol: float = REL_TOL) -> list:
    """Returns a list of (key, rel_err) failures; empty = consistent."""
    failures = []
    for k in sorted(a):
        x, y = a[k], b[k]
        scale = max(np.abs(x).max(), np.abs(y).max(), 1e-12)
        rel = float(np.abs(x - y).max() / scale)
        print(f"  {k:12s} scale={scale:9.3g} max_rel_err={rel:.5f}")
        if rel > rel_tol:
            failures.append((k, rel))
    return failures


def check_vs_cpu(name: str = "yolov8n") -> bool:
    import jax

    here = compute_outputs(name)
    platform = jax.devices()[0].platform
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "cpu.npz")
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        # the axon sitecustomize pins the TPU tunnel; JAX_PLATFORMS=cpu is
        # honoured because the subprocess sets jax.config before backend init
        r = subprocess.run(
            [sys.executable, "-m", "ood_in_object_detection_tpu.utils.consistency",
             "--emit", path, "--model", name],
            env=env, cwd=os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))),
            capture_output=True, text=True, timeout=1800,
        )
        if r.returncode != 0:
            print(r.stdout, r.stderr, file=sys.stderr)
            raise RuntimeError(f"CPU subprocess failed rc={r.returncode}")
        cpu = dict(np.load(path))
    print(f"consistency {platform} vs cpu ({name}):")
    failures = compare(here, cpu)
    if failures:
        print(f"FAILED: {failures}")
        return False
    print("consistency ok")
    return True


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    name = "yolov8n"
    emit = None
    while argv:
        a = argv.pop(0)
        if a == "--emit":
            emit = argv.pop(0)
        elif a == "--model":
            name = argv.pop(0)
    if emit:
        import jax

        if os.environ.get("JAX_PLATFORMS") == "cpu":
            jax.config.update("jax_platforms", "cpu")
        np.savez(emit, **compute_outputs(name))
        return 0
    return 0 if check_vs_cpu(name) else 1


if __name__ == "__main__":
    sys.exit(main())

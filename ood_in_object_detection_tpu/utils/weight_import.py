"""Import ultralytics PyTorch weights into the Flax parameter tree.

The reference ships/consumes ultralytics ``.pt`` checkpoints; this module
maps a flat torch ``state_dict`` (name -> numpy array) onto our parameter /
batch-stats trees for bit-parity inference (SURVEY.md §7.3 weight-porting).

Torch -> Flax conventions:
- Conv2d weight (O, I, kh, kw)  -> Conv kernel (kh, kw, I, O)
- depthwise Conv2d (O, 1, kh, kw) -> flax grouped kernel (kh, kw, I/g, O)
- BatchNorm2d weight/bias -> bn scale/bias; running stats -> batch_stats
- the DFL conv is parameter-free here (fixed arange) and is skipped.

Name translation is generated from OUR tree: every flax path is converted to
its torch name (``torch_name_for_path``), so coverage is checkable — any
unmatched path fails loudly. Use ``state_dict_from_torch_file`` to extract
the flat dict from an ultralytics .pt without importing ultralytics
(weights_only unpickling of the EMA/model state_dict).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _translate_segment(seg: str) -> str:
    """Map one flax module-name segment to its torch counterpart."""
    # l{li}_{Mod} -> {li}
    m = re.match(r"^l(\d+)_[A-Za-z0-9]+$", seg)
    if m:
        return m.group(1)
    if seg == "detect":
        return None  # detect head index is appended by the caller
    # head branches: [one2one_]cv2_{i}_{j}[a|b] -> [one2one_]cv2.{i}.{j}(.0/.1)
    # (v10 end2end one2one copies: reference head.py:66-67,868-885)
    m = re.match(r"^(one2one_)?(cv[23])_(\d)_(\d)([ab]?)$", seg)
    if m:
        base = f"{m.group(1) or ''}{m.group(2)}.{m.group(3)}.{m.group(4)}"
        if m.group(5) == "a":
            return base + ".0"
        if m.group(5) == "b":
            return base + ".1"
        return base
    # repeated blocks m{i} -> m.{i}; yolo12 m{i}_{j} -> m.{i}.{j}
    m = re.match(r"^m(\d+)_(\d+)$", seg)
    if m:
        return f"m.{m.group(1)}.{m.group(2)}"
    m = re.match(r"^m(\d+)$", seg)
    if m:
        return f"m.{m.group(1)}"
    # inline wrappers that add no torch level
    if seg in ("c3", "dw"):
        return ""
    # CIB conv stack cv1_{k} -> cv1.{k}
    m = re.match(r"^cv1_(\d)$", seg)
    if m:
        return f"cv1.{m.group(1)}"
    # RepNCSPELAN4 names cv2_csp/cv2_conv -> cv2.0 / cv2.1 (torch Sequential)
    m = re.match(r"^(cv[23])_(csp|conv)$", seg)
    if m:
        return f"{m.group(1)}.{0 if m.group(2) == 'csp' else 1}"
    # PSA / attention / ffn naming. The PSABlock wrapper named attn_blk inside
    # our PSA adds no torch level: torch PSA holds attn/ffn directly
    # (block.py PSA: self.attn = Attention, self.ffn = Sequential).
    table = {
        "attn_blk": "", "ffn0": "ffn.0", "ffn1": "ffn.1",
        "mlp0": "mlp.0", "mlp1": "mlp.1",
    }
    return table.get(seg, seg)


def torch_name_for_path(path: Tuple[str, ...], detect_layer_idx: int) -> str:
    """Flax param path (module segments, leaf) -> torch state_dict name."""
    segs = list(path[:-1])
    leaf = path[-1]
    out = []
    for s in segs[:-1]:
        t = _translate_segment(s)
        if t is None:
            out.append(str(detect_layer_idx))
        elif t != "":
            out.append(t)
    last = segs[-1]
    if last == "conv":
        # ultralytics Conv wraps a .conv Conv2d; our head output layers
        # (Conv2dRaw, cv{2,3}_{i}_2) correspond to bare torch Conv2d with no
        # extra .conv level
        if not (len(segs) >= 2 and re.match(r"^(one2one_)?cv[23]_\d_2$", segs[-2])):
            out.append("conv")
        name = {"kernel": "weight", "bias": "bias"}[leaf]
    elif last == "bn":
        out.append("bn")
        name = {"scale": "weight", "bias": "bias", "mean": "running_mean",
                "var": "running_var"}[leaf]
    else:
        t = _translate_segment(last)
        if t is None:
            out.append(str(detect_layer_idx))
        elif t != "":
            out.append(t)
        name = leaf
    return "model." + ".".join(out + [name])


def _convert_leaf(torch_arr: np.ndarray, flax_shape: tuple) -> np.ndarray:
    a = np.asarray(torch_arr)
    if a.ndim == 4:  # conv kernel (O, I/g, kh, kw) -> (kh, kw, I/g, O)
        a = a.transpose(2, 3, 1, 0)
    if tuple(a.shape) != tuple(flax_shape):
        raise ValueError(f"shape mismatch: torch {a.shape} vs flax {flax_shape}")
    return a


def import_state_dict(variables, state_dict: Dict[str, np.ndarray],
                      detect_layer_idx: int, strict: bool = True):
    """Return a new variables dict with torch weights loaded."""
    import jax

    flat_p = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    flat_b = jax.tree_util.tree_flatten_with_path(variables["batch_stats"])[0] \
        if "batch_stats" in variables else []

    def keystr(kp):
        return tuple(getattr(k, "key", getattr(k, "name", str(k))) for k in kp)

    new_params = {}
    missing = []
    for kp, leaf in flat_p:
        path = keystr(kp)
        tname = torch_name_for_path(path, detect_layer_idx)
        if tname in state_dict:
            new_params[path] = _convert_leaf(state_dict[tname], leaf.shape)
        else:
            missing.append(tname)
            new_params[path] = np.asarray(leaf)
    new_stats = {}
    for kp, leaf in flat_b:
        path = keystr(kp)
        tname = torch_name_for_path(path, detect_layer_idx)
        if tname in state_dict:
            new_stats[path] = _convert_leaf(state_dict[tname], leaf.shape)
        else:
            missing.append(tname)
            new_stats[path] = np.asarray(leaf)
    if strict and missing:
        raise KeyError(f"{len(missing)} torch keys not found, e.g. {missing[:5]}")

    def rebuild(tree, flat):
        leaves = [flat[keystr(kp)] for kp, _ in
                  jax.tree_util.tree_flatten_with_path(tree)[0]]
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(tree), leaves)

    out = dict(variables)
    out["params"] = rebuild(variables["params"], new_params)
    if flat_b:
        out["batch_stats"] = rebuild(variables["batch_stats"], new_stats)
    return out, missing


def export_state_dict(variables, detect_layer_idx: int,
                      reg_max: int = 16) -> Dict[str, np.ndarray]:
    """Inverse of :func:`import_state_dict`: flatten our params/batch_stats
    into a flat ultralytics-named, torch-layout ``state_dict`` (conv kernels
    transposed back to ``(O, I/g, kh, kw)``), so a model trained HERE can be
    loaded into the reference's torch ``DetectionModel`` (``strict=True``)
    and run inside its pipeline.

    Synthesized torch-only tensors:
    - ``model.<detect>.dfl.conv.weight`` — the reference's DFL conv is a
      frozen ``arange(reg_max)`` (nn/modules/block.py DFL); parameter-free
      on our side (fixed lookup in the decode), reconstructed here.
    - per-BN ``num_batches_tracked`` zeros (torch bookkeeping, inference-inert).
    """
    import jax

    def keystr(kp):
        return tuple(getattr(k, "key", getattr(k, "name", str(k))) for k in kp)

    out: Dict[str, np.ndarray] = {}
    for coll in ("params", "batch_stats"):
        for kp, leaf in jax.tree_util.tree_flatten_with_path(
                variables.get(coll, {}))[0]:
            tname = torch_name_for_path(keystr(kp), detect_layer_idx)
            a = np.asarray(leaf, np.float32)
            if a.ndim == 4:  # (kh, kw, I/g, O) -> (O, I/g, kh, kw)
                a = a.transpose(3, 2, 0, 1)
            out[tname] = a
    for k in [k for k in out if k.endswith(".running_mean")]:
        out[k[: -len("running_mean")] + "num_batches_tracked"] = \
            np.zeros((), np.int64)
    out[f"model.{detect_layer_idx}.dfl.conv.weight"] = \
        np.arange(reg_max, dtype=np.float32).reshape(1, reg_max, 1, 1)
    return out


def state_dict_from_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Extract a flat numpy state_dict from an ultralytics .pt checkpoint
    without importing the ultralytics package (torch weights_only load of the
    raw zipfile tensors)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    model = obj
    if isinstance(obj, dict):
        model = obj.get("ema") or obj.get("model") or obj  # plain sd fallback
    sd = model.state_dict() if hasattr(model, "state_dict") else model
    return {k: v.float().numpy() for k, v in sd.items()}


def graft_classification_backbone(variables, pt_path: str, spec,
                                  max_layer: int = 6):
    """Load an ImageNet-classification checkpoint's backbone (torch layers
    0..max_layer) into a detector's variables, leaving everything else as-is
    (reference custom_training.py:129-133: yolov8{size}-cls ``model[:7]``
    state_dict loaded strict=False — the cls and detect yamls share the
    backbone topology through layer 6).

    -> (new variables, number of grafted tensors).
    """
    sd = state_dict_from_torch_file(pt_path)
    pat = re.compile(r"^model\.(\d+)\.")
    keep = {}
    for k, v in sd.items():
        m = pat.match(k)
        if m and int(m.group(1)) <= max_layer:
            keep[k] = v
    if not keep:
        raise ValueError(f"{pt_path} has no model.0..{max_layer} backbone keys")
    import jax

    n_leaves = len(jax.tree.leaves(variables["params"])) + \
        len(jax.tree.leaves(variables.get("batch_stats", {})))
    new_vars, missing = import_state_dict(
        variables, keep, detect_layer_idx=len(spec) - 1, strict=False)
    grafted = n_leaves - len(missing)
    if grafted == 0:
        raise ValueError(f"no tensors from {pt_path} matched the detector "
                         f"backbone (shape/naming mismatch?)")
    return new_vars, grafted

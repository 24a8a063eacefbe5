"""Cross-framework numerical parity against the vendored torch reference.

For each model family, a real torch DetectionModel (with randomized BN state)
is built from the reference YAML, its state_dict flows through
utils/weight_import.py, and the Flax forward must match the torch forward
layer-for-layer at f32 precision: raw head maps, decoded boxes, pre-sigmoid
logits, and the three version-specific neck taps (nn/tasks.py:179-194).

This is the accuracy-parity contract from re-derived to verified: any layer,
decode, tap-index, or weight-mapping mismatch fails here.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from _reference_bridge import (
    REF_YAML, build_reference_model, numpy_state_dict, reference_available,
    reference_forward,
)
from ood_in_object_detection_tpu.models import build_model, model_forward
from ood_in_object_detection_tpu.utils.weight_import import (
    import_state_dict, torch_name_for_path,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference not present"
)

# EVERY vendored reference YAML, covering the topologically distinct scales:
# the paper benchmarks l-scales, v9e adds the CBLinear/CBFuse reversible
# branch that exists only at e-scale, and v9c/v10l vary block placement.
# n/t scales run at 64 px; larger scales at 128 px (deeper strides need it).
FAMILIES = sorted(REF_YAML)
_PARITY_SIZE = {name: (64 if name[-1] in "nt" else 128) for name in FAMILIES}


def _import_into_flax(name, tm, nc=80):
    sd = numpy_state_dict(tm)
    fm = build_model(name, nc=nc)
    imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = fm.init(jax.random.PRNGKey(0), imgs, train=False)
    variables, missing = import_state_dict(
        variables, sd, detect_layer_idx=len(tm.model) - 1, strict=False)
    return fm, variables, sd, missing


@pytest.mark.parametrize("name", FAMILIES)
def test_forward_parity(name):
    tm = build_reference_model(name)
    fm, variables, sd, missing = _import_into_flax(name, tm)
    assert not missing, f"{len(missing)} flax paths had no torch key: {missing[:5]}"

    # every torch tensor must be consumed (no silently-random submodule)
    used = set()
    for coll in ("params", "batch_stats"):
        for kp, _ in jax.tree_util.tree_flatten_with_path(
                variables.get(coll, {}))[0]:
            path = tuple(getattr(k, "key", str(k)) for k in kp)
            used.add(torch_name_for_path(path, len(tm.model) - 1))
    unused = [k for k in sd
              if k not in used and "num_batches" not in k and ".dfl." not in k]
    assert not unused, f"{len(unused)} torch keys unused: {unused[:5]}"

    size = _PARITY_SIZE[name]
    x = np.random.default_rng(0).uniform(0, 1, (1, 3, size, size)).astype(np.float32)
    t_boxes, t_logits, t_raw, t_taps = reference_forward(tm, x)
    out = model_forward(fm, variables, jnp.asarray(x.transpose(0, 2, 3, 1)))

    for i in range(3):
        ours = np.asarray(out["raw_levels"][i]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(ours, t_raw[i], atol=2e-4,
                                   err_msg=f"raw head level {i}")
    np.testing.assert_allclose(np.asarray(out["boxes_xywh"]), t_boxes,
                               atol=5e-3, err_msg="decoded boxes")
    np.testing.assert_allclose(np.asarray(out["cls_logits"]), t_logits,
                               atol=2e-4, err_msg="pre-sigmoid logits")
    if name == "yolov9e":
        # documented deviation: the reference's hardcoded tap indices
        # [15,18,21] (nn/tasks.py:185-187) fall on stride-2/4/8 BACKBONE
        # layers for the 40+-layer e-scale spec, which would break the
        # stride-routed RoIAlign downstream; we tap the semantic neck
        # P3/P4/P5 — verified here against the torch head's real inputs
        from _reference_bridge import reference_head_inputs

        t_taps = reference_head_inputs(tm, x)
    for i in range(3):
        ours = np.asarray(out["neck_feats"][i]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(ours, t_taps[i], atol=2e-4,
                                   err_msg=f"neck tap {i}")


def test_loss_and_tal_parity():
    """Our detection_loss (TAL assignment + CIoU + DFL + BCE) must reproduce
    the reference v8DetectionLoss (utils/loss.py:165-270, utils/tal.py) on
    identical raw head maps and targets — component-wise to f32 tolerance."""
    import torch
    from types import SimpleNamespace

    from ood_in_object_detection_tpu.train.loss import detection_loss

    tm = build_reference_model("yolov8n", extraction=False)
    tm.args = SimpleNamespace(box=7.5, cls=0.5, dfl=1.5)
    from ultralytics.utils.loss import v8DetectionLoss

    crit = v8DetectionLoss(tm)

    B, nc, imgsz = 2, 80, 64
    rng = np.random.default_rng(1)
    # confident, structured raw maps: random logits plus a boosted class so
    # the assigner finds real foreground on both sides
    raw = []
    for (h, w) in [(8, 8), (4, 4), (2, 2)]:
        r = rng.normal(0, 1, (B, h, w, 64 + nc)).astype(np.float32)
        r[:, : h // 2, : w // 2, 64 + 3] += 6.0
        raw.append(r)

    # two gt boxes per image, xyxy pixels
    gt_b = np.asarray([[[4, 4, 30, 30], [34, 20, 60, 60]],
                       [[10, 12, 50, 44], [2, 2, 20, 20]]], np.float32)
    gt_l = np.asarray([[3, 7], [3, 0]], np.int64)
    gt_m = np.ones((2, 2), bool)

    lb = detection_loss([jnp.asarray(r) for r in raw],
                        jnp.asarray(gt_l.astype(np.int32)),
                        jnp.asarray(gt_b), jnp.asarray(gt_m), nc)

    feats = [torch.from_numpy(r.transpose(0, 3, 1, 2)).contiguous() for r in raw]
    # reference batch dict: flat rows of (batch_idx, cls, xywh normalized)
    cxy = (gt_b[..., :2] + gt_b[..., 2:]) / 2 / imgsz
    wh = (gt_b[..., 2:] - gt_b[..., :2]) / imgsz
    batch = {
        "batch_idx": torch.tensor([0, 0, 1, 1], dtype=torch.float32),
        "cls": torch.from_numpy(gt_l.reshape(-1, 1).astype(np.float32)),
        "bboxes": torch.from_numpy(
            np.concatenate([cxy, wh], -1).reshape(-1, 4)),
    }
    total_t, items_t = crit(feats, batch)
    # items = [box*7.5, cls*0.5, dfl*1.5] pre-batch-scaling; the trainer
    # consumes total_t.sum() (loss.py:268 returns loss * batch_size)
    np.testing.assert_allclose(float(lb.box) * 7.5, float(items_t[0]), rtol=1e-4)
    np.testing.assert_allclose(float(lb.cls) * 0.5, float(items_t[1]), rtol=1e-4)
    np.testing.assert_allclose(float(lb.dfl) * 1.5, float(items_t[2]), rtol=1e-4)
    np.testing.assert_allclose(float(lb.total), float(total_t.sum()), rtol=1e-4)


def test_warmup_schedule_matches_reference():
    """_hyper_at must reproduce the reference's in-loop np.interp warmup
    (trainer.py:375-386): bias lr falls 0.1 -> lr0*lf, rest rises 0 -> lr0*lf,
    momentum rises 0.8 -> 0.937, all over nw = max(round(we*nb), 100) iters."""
    from ood_in_object_detection_tpu.train.trainer import TrainConfig, _hyper_at, _warmup_iters

    cfg = TrainConfig(lr0=0.01, lrf=0.01, epochs=100, steps_per_epoch=50,
                      warmup_epochs=3.0)
    nw = _warmup_iters(cfg)
    assert nw == 150
    for ni in [0, 1, 75, 150, 151, 400]:
        epoch = ni // cfg.steps_per_epoch
        lf = max(1 - epoch / cfg.epochs, 0) * (1 - cfg.lrf) + cfg.lrf
        base = cfg.lr0 * lf
        xi = [0, nw]
        exp_bias = np.interp(min(ni, nw), xi, [0.1, base])
        exp_rest = np.interp(min(ni, nw), xi, [0.0, base])
        exp_mom = np.interp(min(ni, nw), xi, [0.8, 0.937])
        lr_bias, lr_rest, mom = _hyper_at(cfg, ni)
        np.testing.assert_allclose(float(lr_bias), exp_bias, rtol=1e-5)
        np.testing.assert_allclose(float(lr_rest), exp_rest, rtol=1e-5)
        np.testing.assert_allclose(float(mom), exp_mom, rtol=1e-5)


def test_train_step_parity():
    """Five full optimizer steps must track the reference: same init weights,
    same batch, torch autograd on v8DetectionLoss + the reference's SGD groups
    and warmup (trainer.py:796-846 build_optimizer, :375-386 warmup loop) vs
    our train_step — parameter deltas compared tensor-for-tensor."""
    import torch
    import torch.nn as nn
    from types import SimpleNamespace

    from ood_in_object_detection_tpu.train import TrainConfig, init_state, train_step
    from ood_in_object_detection_tpu.train.trainer import TrainState, make_optimizer

    tm = build_reference_model("yolov8n", extraction=False)
    fm, variables, sd, missing = _import_into_flax("yolov8n", tm)
    assert not missing

    # reference param groups (build_optimizer): g2=bias, g1=norm scale, g0=decay
    g = ([], [], [])
    for module_name, module in tm.named_modules():
        for param_name, param in module.named_parameters(recurse=False):
            fullname = f"{module_name}.{param_name}" if module_name else param_name
            if "bias" in fullname:
                g[2].append(param)
            elif isinstance(module, nn.BatchNorm2d):
                g[1].append(param)
            else:
                g[0].append(param)
    # gentler LRs than the defaults: at lr0=0.01/bias 0.1 the trajectory
    # leaves the smooth regime within ~4 steps (discrete TAL assignments flip
    # on tiny f32 differences) and exact multi-step parity becomes chaotic;
    # the groups/warmup/decay semantics under test are LR-independent
    lr0, momentum, wd, wblr = 1e-3, 0.937, 5e-4, 0.01
    opt = torch.optim.SGD(g[2], lr=lr0, momentum=momentum, nesterov=True)
    opt.add_param_group({"params": g[0], "weight_decay": wd})
    opt.add_param_group({"params": g[1], "weight_decay": 0.0})

    tm.train()
    tm.args = SimpleNamespace(box=7.5, cls=0.5, dfl=1.5)
    from ultralytics.utils.loss import v8DetectionLoss

    crit = v8DetectionLoss(tm)

    rng = np.random.default_rng(3)
    imgs = rng.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
    gt_b = np.asarray([[[4, 4, 30, 30], [34, 20, 60, 60]],
                       [[10, 12, 50, 44], [2, 2, 20, 20]]], np.float32)
    gt_l = np.asarray([[3, 7], [3, 0]], np.int64)
    imgsz = 64
    cxy = (gt_b[..., :2] + gt_b[..., 2:]) / 2 / imgsz
    wh = (gt_b[..., 2:] - gt_b[..., :2]) / imgsz
    tbatch = {
        "batch_idx": torch.tensor([0, 0, 1, 1], dtype=torch.float32),
        "cls": torch.from_numpy(gt_l.reshape(-1, 1).astype(np.float32)),
        "bboxes": torch.from_numpy(np.concatenate([cxy, wh], -1).reshape(-1, 4)),
    }
    timgs = torch.from_numpy(imgs)

    steps, spe = 5, 5
    cfg = TrainConfig(lr0=lr0, lrf=0.01, momentum=momentum, weight_decay=wd,
                      warmup_bias_lr=wblr, warmup_epochs=1.0, epochs=10,
                      steps_per_epoch=spe)
    nw = max(round(cfg.warmup_epochs * spe), 100)
    lf = lambda e: max(1 - e / cfg.epochs, 0) * (1 - cfg.lrf) + cfg.lrf

    t0_sd = {k: v.detach().clone() for k, v in tm.state_dict().items()}
    t1step_sd = None
    for ni in range(steps):
        epoch = ni // spe
        if ni <= nw:  # reference warmup loop (trainer.py:375-386)
            xi = [0, nw]
            for j, grp in enumerate(opt.param_groups):
                grp["lr"] = float(np.interp(
                    ni, xi, [wblr if j == 0 else 0.0, lr0 * lf(epoch)]))
                grp["momentum"] = float(np.interp(ni, xi, [0.8, momentum]))
        preds = tm(timgs)
        loss_vec, _ = crit(preds, tbatch)
        opt.zero_grad()
        loss_vec.sum().backward()
        opt.step()
        if ni == 0:
            t1step_sd = {k: v.detach().clone() for k, v in tm.state_dict().items()}

    # ours: identical init (imported weights), same batch, jitted step
    model = fm
    state0 = init_state(model, cfg, jax.random.PRNGKey(0),
                        jnp.zeros((2, 64, 64, 3), jnp.float32))
    tx = make_optimizer(cfg)
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]),
                       ema_params=variables["params"],
                       step=jnp.zeros((), jnp.int32))
    del state0
    batch = {
        "images": jnp.asarray(imgs.transpose(0, 2, 3, 1)),
        "gt_labels": jnp.asarray(gt_l.astype(np.int32)),
        "gt_bboxes": jnp.asarray(gt_b),
        "gt_mask": jnp.ones((2, 2), bool),
    }
    step_fn = jax.jit(lambda s, b: train_step(model, cfg, s, b))
    state1 = None
    for i in range(steps):
        state, lb = step_fn(state, batch)
        if i == 0:
            state1 = state

    from ood_in_object_detection_tpu.utils.weight_import import torch_name_for_path

    def tensor_errs(our_params, torch_sd):
        errs, abs_num, abs_den = {}, 0.0, 0.0
        for kp, ours in jax.tree_util.tree_flatten_with_path(our_params)[0]:
            path = tuple(getattr(k, "key", str(k)) for k in kp)
            tkey = torch_name_for_path(path, len(tm.model) - 1)
            if tkey not in t0_sd:
                continue
            d_t = (torch_sd[tkey] - t0_sd[tkey]).float().numpy()
            if d_t.ndim == 4:  # OIHW -> HWIO
                d_t = d_t.transpose(2, 3, 1, 0)
            node = variables["params"]
            for k in path:
                node = node[k]
            d_ours = np.asarray(ours) - np.asarray(node)
            scale = max(np.abs(d_t).max(), 1e-7)
            errs[tkey] = np.abs(d_ours - d_t).max() / scale
            abs_num += float(np.abs(d_ours - d_t).sum())
            abs_den += float(np.abs(d_t).sum())
        assert len(errs) > 100, f"only {len(errs)} tensors compared"
        return errs, abs_num / max(abs_den, 1e-7)

    # one step: tight tensor-for-tensor agreement (pure semantics, no drift)
    errs1, agg1 = tensor_errs(state1.params, t1step_sd)
    bad1 = {k: v for k, v in errs1.items() if v >= 0.02}
    assert not bad1, f"step1 per-tensor rel delta err: {bad1}"
    # five steps: f32 noise compounds through the discrete TAL assignment —
    # a single assignment flip on the 2x2 P5 grid swings that head tower's
    # small tensors by O(0.1-1) relative (measured: 0.25 on one P5 BN scale)
    # while every other tensor stays tight. Gate on the AGGREGATE error (no
    # systematic drift) plus a 97% tensor fraction inside the tight band,
    # instead of a brittle per-tensor max that any isolated chaotic head
    # tensor can trip.
    errs5, agg5 = tensor_errs(
        state.params, {k: v.detach() for k, v in tm.state_dict().items()})
    assert agg5 < 0.05, f"step5 aggregate rel delta err {agg5:.4f}"
    frac_tight = np.mean([v < 0.10 for v in errs5.values()])
    worst = max(errs5.values())
    assert frac_tight >= 0.97, (
        f"step5: only {frac_tight:.0%} of tensors inside the 0.10 band; "
        f"worst {worst:.3f}")
    assert worst < 1.0, f"step5 worst per-tensor rel delta err {worst:.3f}"


def test_pt_checkpoint_roundtrip(tmp_path):
    """state_dict_from_torch_file must extract a usable flat dict from a real
    ultralytics-style .pt checkpoint (SURVEY §5: ckpt = {model|ema, ...})."""
    import torch

    from ood_in_object_detection_tpu.utils.weight_import import (
        state_dict_from_torch_file,
    )

    tm = build_reference_model("yolov8n", extraction=False)
    p = tmp_path / "ckpt.pt"
    torch.save({"model": tm, "train_args": {"name": "unit"}}, p)
    sd = state_dict_from_torch_file(str(p))
    ref = numpy_state_dict(tm)
    assert set(sd) == set(ref)
    np.testing.assert_array_equal(sd["model.0.conv.weight"],
                                  ref["model.0.conv.weight"])


def test_imagenet_backbone_graft(tmp_path):
    """graft_classification_backbone loads a real yolov8n-cls backbone
    (layers 0-6) into the detector; grafted layers match the source, the
    rest stay at their previous values (custom_training.py:129-133)."""
    import torch

    from _reference_bridge import REFERENCE, install_shim
    from ood_in_object_detection_tpu.utils.weight_import import (
        graft_classification_backbone,
    )

    install_shim()
    from ultralytics.nn.tasks import ClassificationModel

    cm = ClassificationModel(
        str(REFERENCE / "ultralytics/cfg/models/v8/yolov8n-cls.yaml"),
        verbose=False)
    p = tmp_path / "cls.pt"
    torch.save({"model": cm}, p)

    fm = build_model("yolov8n", nc=20)
    imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = fm.init(jax.random.PRNGKey(0), imgs, train=False)
    before = jax.tree.map(np.asarray, variables["params"])

    new_vars, grafted = graft_classification_backbone(variables, str(p), fm.spec)
    assert grafted > 50  # layers 0..6 of v8n: ~60+ tensors incl. BN stats

    csd = {k: v.float().numpy() for k, v in cm.state_dict().items()}
    # spot-check: stem conv kernel equals the cls model's, transposed OIHW->HWIO
    got = np.asarray(jax.tree_util.tree_flatten_with_path(new_vars["params"])[0][0][1])
    k0 = next(np.transpose(v, (2, 3, 1, 0)) for k, v in csd.items()
              if k == "model.0.conv.weight")
    stem = new_vars["params"]["l0_Conv"]["conv"]["kernel"]
    np.testing.assert_array_equal(np.asarray(stem), k0)
    # a head param must be untouched
    np.testing.assert_array_equal(
        np.asarray(new_vars["params"]["detect"]["cv3_0_2"]["conv"]["kernel"]),
        before["detect"]["cv3_0_2"]["conv"]["kernel"])
    del got


@pytest.mark.parametrize("name", ["yolov8n", "yolo11n", "yolov10n"])
def test_export_state_dict_roundtrip(name):
    """Reverse interop: our randomly initialised flax model exports an
    ultralytics-format state_dict (utils/weight_import.py export_state_dict)
    that the reference's torch DetectionModel loads with strict=True, and the
    two forwards then agree — a model trained HERE runs in the reference's
    torch pipeline unchanged."""
    import torch

    fm = build_model(name, nc=80)
    imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
    # randomized init so BN-stat transposition bugs can't hide
    variables = fm.init(jax.random.PRNGKey(3), imgs, train=False)
    variables = jax.tree.map(
        lambda a: (jax.random.uniform(jax.random.PRNGKey(a.size % 997),
                                      a.shape, jnp.float32, 0.5, 1.5)
                   if a.ndim <= 1 else a), variables)

    from ood_in_object_detection_tpu.utils.weight_import import export_state_dict

    tm = build_reference_model(name, randomize=False)
    sd = export_state_dict(variables, detect_layer_idx=len(tm.model) - 1)
    res = tm.load_state_dict({k: torch.from_numpy(np.asarray(v))
                              for k, v in sd.items()}, strict=True)
    assert not res.missing_keys and not res.unexpected_keys

    x = np.random.default_rng(1).uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    t_boxes, t_logits, t_raw, _ = reference_forward(tm, x)
    out = model_forward(fm, variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    for i in range(3):
        ours = np.asarray(out["raw_levels"][i]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(ours, t_raw[i], atol=2e-4,
                                   err_msg=f"raw head level {i}")
    np.testing.assert_allclose(np.asarray(out["boxes_xywh"]), t_boxes, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out["cls_logits"]), t_logits, atol=2e-4)

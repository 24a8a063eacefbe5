"""Training loop: optax SGD + EMA + warmup/linear LR, mesh-sharded train step.

Capability parity with the reference trainer (ultralytics/engine/trainer.py +
utils/torch_utils.py ModelEMA):

- SGD momentum=0.937, nesterov, weight decay 5e-4 on conv/linear weights only,
  in the reference's three parameter groups (trainer.py:796-846
  build_optimizer): biases (no decay, warmup from warmup_bias_lr), norm
  scales (no decay), >=2D kernels (decay)
- per-epoch staircase LR lr0*lf(epoch) with lf linear (or one_cycle cosine)
  (trainer.py:219-225 _setup_scheduler), plus the per-iteration warmup over
  nw = max(round(warmup_epochs*nb), 100) iters (trainer.py:336,375-386):
  bias lr falls warmup_bias_lr -> lr0*lf(epoch), other lrs rise 0 -> same,
  momentum rises warmup_momentum(0.8) -> momentum(0.937)
- (deviation) the reference also ramps gradient accumulation toward
  nbs/batch_size during warmup (trainer.py:380); we step every batch
- EMA decay 0.9999 with ramp d = decay*(1 - exp(-updates/2000))
  (torch_utils.py ModelEMA)
- DDP -> jit over a ("data","model") mesh: gradients are reduced by XLA
  collectives instead of NCCL all-reduce (trainer.py:233-284); BN statistics
  are global-batch by construction.
- bf16 compute with f32 params replaces AMP GradScaler (trainer.py AMP).
"""

from __future__ import annotations

import dataclasses

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.yolo import YOLODetector
from ..parallel import mesh as meshlib
from .loss import detection_loss, LossBreakdown


@dataclasses.dataclass
class TrainConfig:
    lr0: float = 0.01
    lrf: float = 0.01
    momentum: float = 0.937
    weight_decay: float = 5e-4
    warmup_epochs: float = 3.0
    warmup_momentum: float = 0.8
    warmup_bias_lr: float = 0.1
    epochs: int = 100
    steps_per_epoch: int = 100
    box_gain: float = 7.5
    cls_gain: float = 0.5
    dfl_gain: float = 1.5
    ema_decay: float = 0.9999
    ema_tau: float = 2000.0
    cos_lr: bool = False
    # rematerialize the forward in the backward pass (jax.checkpoint with
    # save_only_these_names over the per-layer boundary tags in
    # models/yolo.py): trades ~1 extra forward of FLOPs for dropping every
    # block-internal intermediate from HBM — the TPU lever for training
    # l/x-scale models at batch sizes that otherwise exceed v5e's 16 GB
    remat: bool = False
    # freeze layers whose top-level module name starts with any of these
    # (reference custom_training.py:145-157 freeze-backbone callback;
    # v8 backbone = spec layers 0..9 -> ("l0_", ..., "l9_"))
    freeze_prefixes: tuple = ()


def _warmup_iters(cfg: TrainConfig) -> int:
    """nw = max(round(warmup_epochs * nb), 100) (reference trainer.py:336)."""
    if cfg.warmup_epochs <= 0:
        return -1
    return max(round(cfg.warmup_epochs * cfg.steps_per_epoch), 100)


def _lf(cfg: TrainConfig, epoch):
    """Per-epoch LR fraction (reference _setup_scheduler, trainer.py:219-225):
    linear max(1 - e/epochs, 0)*(1-lrf)+lrf, or one_cycle cosine 1 -> lrf."""
    e = jnp.asarray(epoch, jnp.float32)
    if cfg.cos_lr:
        return ((1 - jnp.cos(e * jnp.pi / cfg.epochs)) / 2) * (cfg.lrf - 1) + 1
    return jnp.maximum(1 - e / cfg.epochs, 0.0) * (1.0 - cfg.lrf) + cfg.lrf


def _hyper_at(cfg: TrainConfig, step):
    """(lr_bias, lr_rest, momentum) at 0-based iteration `step`, replicating
    the reference's in-loop np.interp warmup (trainer.py:375-386) on top of
    the per-epoch staircase base LR."""
    step = jnp.asarray(step, jnp.float32)
    epoch = jnp.floor(step / cfg.steps_per_epoch)
    base = cfg.lr0 * _lf(cfg, epoch)
    nw = _warmup_iters(cfg)
    if nw < 0:
        return base, base, jnp.asarray(cfg.momentum, jnp.float32)
    t = jnp.clip(step / nw, 0.0, 1.0)
    lr_rest = t * base
    lr_bias = cfg.warmup_bias_lr + t * (base - cfg.warmup_bias_lr)
    mom = cfg.warmup_momentum + t * (cfg.momentum - cfg.warmup_momentum)
    return lr_bias, lr_rest, mom


def lr_schedule(cfg: TrainConfig) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Non-bias-group LR at an iteration index (for logging/inspection)."""
    return lambda step: _hyper_at(cfg, step)[1]


def _is_bias(path) -> bool:
    """Reference group g[2]: every param whose full name contains 'bias'
    (build_optimizer, trainer.py:826-835) — conv/head biases and norm biases."""
    name = str(getattr(path[-1], "key", path[-1]))
    return name == "bias"


def reference_sgd(cfg: TrainConfig) -> optax.GradientTransformation:
    """Nesterov SGD with the reference's 3 param groups and warmup schedules:
    decay on >=2D kernels only (g[0]), bias group warms from warmup_bias_lr,
    momentum warms 0.8 -> 0.937 per iteration. Semantics match torch.optim.SGD
    (decayed grad enters the momentum buffer; nesterov update g + mu*buf)."""

    def init_fn(params):
        return (jnp.zeros((), jnp.int32), jax.tree.map(jnp.zeros_like, params))

    def update_fn(grads, state, params):
        count, trace = state
        lr_bias, lr_rest, mom = _hyper_at(cfg, count)

        def decayed(path, g, p):
            if not _is_bias(path) and p.ndim >= 2:
                return g + cfg.weight_decay * p
            return g

        new_trace = jax.tree_util.tree_map_with_path(
            lambda path, g, t, p: mom * t + decayed(path, g, p),
            grads, trace, params)
        updates = jax.tree_util.tree_map_with_path(
            lambda path, g, t, p: -(lr_bias if _is_bias(path) else lr_rest)
            * (decayed(path, g, p) + mom * t),
            grads, new_trace, params)
        return updates, (count + 1, new_trace)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(cfg: TrainConfig):
    tx = reference_sgd(cfg)
    if cfg.freeze_prefixes:
        # Frozen leaves must get a ZERO update, not a pass-through:
        # optax.masked leaves unmasked leaves equal to their raw gradient,
        # which apply_updates would then ADD (unscaled gradient ascent).
        def label_fn(params):
            def per_path(path, _):
                top = str(getattr(path[0], "key", path[0])) if path else ""
                frozen = any(top.startswith(p) for p in cfg.freeze_prefixes)
                return "frozen" if frozen else "train"

            return jax.tree_util.tree_map_with_path(per_path, params)

        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, label_fn
        )
    return tx


def backbone_freeze_prefixes(spec) -> tuple:
    """Top-level module-name prefixes of the backbone (everything before the
    first Upsample, mirroring the reference's freeze of model.model[:10])."""
    out = []
    for li, (_, _, mod, _) in enumerate(spec):
        if mod == "Upsample":
            break
        out.append(f"l{li}_")
    return tuple(out)


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    step: jnp.ndarray


def init_state(model: YOLODetector, cfg: TrainConfig, rng, sample_images) -> TrainState:
    variables = model.init(rng, sample_images, train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(cfg)
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=params,
        step=jnp.zeros((), jnp.int32),
    )


def train_step(model: YOLODetector, cfg: TrainConfig, state: TrainState, batch):
    """One optimization step. batch: dict(images (B,H,W,3) f32 0..1,
    gt_labels (B,M) int32, gt_bboxes (B,M,4) xyxy pixels, gt_mask (B,M) bool)."""
    tx = make_optimizer(cfg)

    def loss_fn(params):
        def fwd(params, images):
            return model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
            )

        if cfg.remat:
            fwd = jax.checkpoint(
                fwd, policy=jax.checkpoint_policies.save_only_these_names(
                    "layer_out"))
        out, mutated = fwd(params, batch["images"])
        gains = dict(box_gain=cfg.box_gain, cls_gain=cfg.cls_gain,
                     dfl_gain=cfg.dfl_gain)
        if getattr(model, "v10_dual", False) and len(out) == 3:
            from .loss import v10_detection_loss

            raw_o2o, _, raw_main = out
            lb = v10_detection_loss(raw_main, raw_o2o, batch["gt_labels"],
                                    batch["gt_bboxes"], batch["gt_mask"],
                                    model.nc, **gains)
        else:
            raw_levels = out[0]
            lb = detection_loss(raw_levels, batch["gt_labels"],
                                batch["gt_bboxes"], batch["gt_mask"],
                                model.nc, **gains)
        return lb.total, (lb, mutated["batch_stats"])

    (loss, (lb, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)

    step = state.step + 1
    d = cfg.ema_decay * (1 - jnp.exp(-step.astype(jnp.float32) / cfg.ema_tau))
    new_ema = jax.tree.map(lambda e, p: e * d + p * (1 - d), state.ema_params, new_params)

    new_state = TrainState(new_params, new_bs, new_opt, new_ema, step)
    return new_state, lb


def shard_state(state: TrainState, mesh) -> TrainState:
    """Place EVERY leaf of the TrainState on the mesh: conv kernels (and the
    optimizer momentum mirroring them) TP-sharded over "model" via
    parallel/mesh.py param_spec, everything else replicated.

    Leaving any leaf unplaced makes jit insert a single-device broadcast into
    the SPMD program, which deadlocks the CPU in-process collectives — every
    input must carry an explicit mesh sharding."""
    from jax.sharding import NamedSharding

    msize = mesh.shape["model"]

    def place(path, leaf):
        sh = NamedSharding(mesh, meshlib.param_spec(path, leaf, msize))
        return jax.device_put(leaf, sh)

    return jax.tree_util.tree_map_with_path(place, state)


def make_sharded_train_step(model: YOLODetector, cfg: TrainConfig, mesh):
    """jit the train step over a ("dcn","data",...,"model") mesh: batch
    sharded over ("dcn","data") (device_put by the caller via
    parallel.mesh.device_put_batch), params TP-sharded over "model"
    (shard_state). XLA emits the gradient all-reduces over ICI within a
    slice and, when dcn>1, hierarchically over DCN across slices."""

    def step_fn(state, batch):
        return train_step(model, cfg, state, batch)

    # NOTE: no donate_argnums — buffer donation re-schedules the XLA:CPU
    # thunk graph in a way that deadlocks the in-process collectives on a
    # virtual-device host mesh (verified empirically); on real TPU meshes
    # callers can wrap with donation themselves.
    return jax.jit(step_fn)

"""Training CLI (reference custom_training.py:13-207): model version/size
selection, class-count override, OWOD task plumbing, freeze-backbone,
val_every gating, DP over the device mesh."""

from __future__ import annotations

import argparse
import logging
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import tb_events

log = logging.getLogger("train")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("train")
    p.add_argument("--model", default="l",
                   choices=["n", "s", "m", "b", "l", "x", "t", "c", "e"])
    p.add_argument("--model_version", default="yolov8",
                   choices=["yolov8", "yolov9", "yolov10", "yolo11", "yolo12",
                            # hub-pretrained families the reference offers via
                            # .pt downloads (custom_training.py:16) — rejected
                            # with an explicit message in main()
                            "yolov5", "yolov6"])
    p.add_argument("--dataset", required=True, help="dataset yaml")
    p.add_argument("--owod_task", default="", choices=["", "t1", "t2", "t3", "t4"])
    p.add_argument("--owod_tasks_dir", default=str(
        Path(__file__).resolve().parents[2] / "datasets_utils" / "owod" / "tasks"))
    p.add_argument("--number_of_classes", type=int, default=0,
                   help="override nc (reference trainer.py:158-161)")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--img_size", type=int, default=640)
    p.add_argument("--lr0", type=float, default=0.01)
    p.add_argument("--lrf", type=float, default=0.01,
                   help="final LR = lr0 * lrf (reference custom_training.py"
                        " lrf)")
    p.add_argument("--cos_lr", action="store_true",
                   help="cosine per-epoch LR instead of the linear staircase"
                        " (reference cos_lr)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize the forward in the backward"
                        " (jax.checkpoint over per-layer boundaries): ~1"
                        " extra forward of FLOPs for much lower activation"
                        " HBM — enables l/x-scale training at batch sizes"
                        " that otherwise OOM a 16 GB chip")
    p.add_argument("--val_every", type=int, default=10)
    p.add_argument("--do_not_val_during_training", action="store_true",
                   help="skip mid-training validation entirely (reference"
                        " custom_training.py flag); checkpoints still save"
                        " on the val_every cadence")
    p.add_argument("--workers", type=int, default=4,
                   help="decode threads for the batcher (reference workers)")
    p.add_argument("--freeze_backbone", action="store_true")
    p.add_argument("--name", default="run")
    p.add_argument("--out_dir", default="runs")
    p.add_argument("--max_gt", type=int, default=128)
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--no_augment", action="store_true",
                   help="disable mosaic/HSV/flip (letterbox-only batches)")
    p.add_argument("--close_mosaic", type=int, default=10)
    p.add_argument("--val_only", action="store_true",
                   help="load --model_path and validate, no training"
                        " (reference custom_training.py val-only mode)")
    p.add_argument("--model_path", default="", help="checkpoint dir for --val_only")
    p.add_argument("--resume", default="",
                   help="checkpoint dir to resume mid-training from: restores "
                        "params/EMA/optimizer/step and continues at the saved "
                        "epoch + 1 (reference engine/trainer.py resume)")
    p.add_argument("--mixup", type=float, default=0.0)
    p.add_argument("--copy_paste", type=float, default=0.0)
    p.add_argument("--degrees", type=float, default=0.0)
    p.add_argument("--shear", type=float, default=0.0)
    p.add_argument("--perspective", type=float, default=0.0)
    p.add_argument("--no_tensorboard", action="store_true",
                   help="skip writing tensorboard event files to the run dir")
    p.add_argument("--prefetch", type=int, default=2,
                   help="sharded batches kept in flight on device so the "
                        "host->device copy overlaps the previous step")
    p.add_argument("--profile", default="",
                   help="directory to write a jax.profiler trace of the "
                        "first training epoch (view with tensorboard)")
    p.add_argument("--pretrained_backbone", default="",
                   help="classification-model .pt whose backbone (layers 0-6) "
                        "is grafted before training "
                        "(reference custom_training.py:129-133)")
    from ..utils.compile_cache import add_compile_cache_flag

    add_compile_cache_flag(p)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    from ..utils.compile_cache import enable_compilation_cache

    enable_compilation_cache(args.compile_cache)

    from ..data import DetectionDataset, PaddedBatcher
    from ..models import build_model
    from ..parallel import make_multislice_mesh, prefetch_to_device
    from ..train import TrainConfig, init_state, make_sharded_train_step, shard_state
    from ..core.checkpoint import save_checkpoint

    if args.model_version in ("yolov5", "yolov6"):
        raise SystemExit(
            f"{args.model_version}: the reference trains these only from "
            "hub-pretrained .pt downloads (custom_training.py:16,31); this "
            "rebuild has no network access and no v5/v6 graph specs — "
            "hub-pretrained models are unavailable (see PARITY.md N/A list).")
    ds = DetectionDataset.from_yaml(args.dataset, split="train",
                                    owod_task=args.owod_task or None,
                                    tasks_dir=args.owod_tasks_dir or None)
    from .factory import resolve_model_name

    nc = args.number_of_classes or ds.number_of_classes
    name = resolve_model_name(args.model_version, args.model)
    model = build_model(name, nc=nc,
                        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32)

    if args.no_augment:
        batcher = PaddedBatcher(ds, args.batch_size, args.img_size,
                                max_gt=args.max_gt, workers=args.workers)
    else:
        from ..data.augment import AugmentConfig, AugmentedTrainBatcher

        batcher = AugmentedTrainBatcher(
            ds, args.batch_size, args.img_size, max_gt=args.max_gt,
            cfg=AugmentConfig(close_mosaic=args.close_mosaic, mixup=args.mixup,
                              copy_paste=args.copy_paste, degrees=args.degrees,
                              shear=args.shear, perspective=args.perspective),
            epochs=args.epochs, workers=args.workers)
    steps_per_epoch = max(len(batcher), 1)
    freeze = ()
    if args.freeze_backbone:
        from ..train.trainer import backbone_freeze_prefixes

        freeze = backbone_freeze_prefixes(model.spec)
    cfg = TrainConfig(lr0=args.lr0, lrf=args.lrf, cos_lr=args.cos_lr,
                      epochs=args.epochs, steps_per_epoch=steps_per_epoch,
                      freeze_prefixes=freeze, remat=args.remat)

    # validation split (reference validates every val_every epochs,
    # engine/trainer.py:441-445)
    try:
        val_ds = DetectionDataset.from_yaml(args.dataset, split="val",
                                            owod_task=args.owod_task or None,
                                            tasks_dir=args.owod_tasks_dir or None)
    except Exception:
        val_ds = None

    if args.val_only:
        from ..core.checkpoint import load_checkpoint

        assert args.model_path, "--val_only requires --model_path"
        assert val_ds is not None and len(val_ds), "no validation split found"
        variables, meta = load_checkpoint(args.model_path)
        import types

        state = types.SimpleNamespace(ema_params=variables["params"],
                                      batch_stats=variables["batch_stats"])
        model = build_model(meta["model_name"],
                            nc=meta.get("train_args", {}).get("nc", nc))
        metrics = validate(model, state, val_ds, args, model.nc)
        log.info("val-only: mAP50=%.4f mAP50-95=%.4f",
                 metrics["mAP50"], metrics["mAP50_95"])
        return

    # slice-topology-aware: on multi-slice deployments the batch shards over
    # ("dcn","data") so gradient reductions ride ICI within a slice and DCN
    # across; degrades to a flat all-data mesh on single-slice/CPU runtimes
    mesh = make_multislice_mesh(model=1)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((args.batch_size, args.img_size, args.img_size, 3), jnp.float32)
    start_epoch = 0
    with mesh:
        if args.resume:
            from ..core.checkpoint import restore_train_state

            state, meta = restore_train_state(args.resume, model, cfg, sample)
            start_epoch = int(meta.get("epoch", -1)) + 1
            log.info("resumed %s at epoch %d (step %d)", args.resume,
                     start_epoch, int(state.step))
        else:
            state = init_state(model, cfg, rng, sample)
            if args.pretrained_backbone:
                from ..utils.weight_import import graft_classification_backbone

                new_vars, grafted = graft_classification_backbone(
                    {"params": state.params, "batch_stats": state.batch_stats},
                    args.pretrained_backbone, model.spec)
                state = state.replace(params=new_vars["params"],
                                      batch_stats=new_vars["batch_stats"],
                                      ema_params=new_vars["params"])
                log.info("grafted %d backbone tensors from %s", grafted,
                         args.pretrained_backbone)
        if hasattr(batcher, "epoch"):
            batcher.epoch = start_epoch  # keep close_mosaic aligned on resume
        state = shard_state(state, mesh)
        step = make_sharded_train_step(model, cfg, mesh)
        from ..train.trainer import lr_schedule

        lr_fn = lr_schedule(cfg)
        run_dir = Path(args.out_dir) / args.name
        run_dir.mkdir(parents=True, exist_ok=True)
        csv_path = run_dir / "results.csv"
        if not csv_path.exists() or start_epoch == 0:
            # per-epoch training curve (reference utils/callbacks writes
            # results.csv + tensorboard scalars; CSV is the durable artifact)
            csv_path.write_text("epoch,time_s,train/box_loss,train/cls_loss,"
                                "train/dfl_loss,train/total_loss,lr,"
                                "metrics/mAP50,metrics/mAP50-95\n")
        # live-observability events next to the CSV (reference
        # callbacks/tensorboard.py:8-97), written without importing tensorboard
        tb = (tb_events.EventWriter(run_dir) if not args.no_tensorboard
              else None)
        try:
            for epoch in range(start_epoch, args.epochs):
                t0 = time.perf_counter()
                losses = []
                import contextlib

                prof_ctx = contextlib.nullcontext()
                if args.profile and epoch == start_epoch:
                    from ..utils.profiling import trace

                    prof_ctx = trace(args.profile)
                host = ({k: batch[k] for k in ("images", "gt_labels",
                                               "gt_bboxes", "gt_mask")}
                        for batch in batcher)
                with prof_ctx:  # stop_trace even if a step raises
                    for placed in prefetch_to_device(host, mesh,
                                                     size=args.prefetch):
                        state, lb = step(state, placed)
                        losses.append(lb)
                    if args.profile and epoch == start_epoch and losses:
                        jax.block_until_ready(losses[-1].total)
                if args.profile and epoch == start_epoch:
                    log.info("profiler trace written to %s", args.profile)
                mean = {k: float(jnp.mean(jnp.stack([getattr(l, k) for l in losses])))
                        for k in ("total", "box", "cls", "dfl")}
                dt = time.perf_counter() - t0
                log.info("epoch %d: loss=%.4f (%.1fs)", epoch, mean["total"], dt)
                map50 = map5095 = float("nan")
                if (epoch + 1) % max(args.val_every, 1) == 0 or epoch == args.epochs - 1:
                    if (val_ds is not None and len(val_ds)
                            and not args.do_not_val_during_training):
                        metrics = validate(model, state, val_ds, args, nc)
                        map50, map5095 = metrics["mAP50"], metrics["mAP50_95"]
                        log.info("epoch %d val: mAP50=%.4f mAP50-95=%.4f", epoch,
                                 map50, map5095)
                    save_checkpoint(
                        run_dir, state,
                        train_args={"name": args.name, "nc": nc, **vars(args)},
                        model_name=name, epoch=epoch)
                lr_now = float(lr_fn(jnp.asarray((epoch + 1) * steps_per_epoch, jnp.float32)))
                with csv_path.open("a") as f:
                    f.write(f"{epoch},{dt:.2f},{mean['box']:.6f},{mean['cls']:.6f},"
                            f"{mean['dfl']:.6f},{mean['total']:.6f},{lr_now:.6g},"
                            f"{map50:.6f},{map5095:.6f}\n")
                if tb is not None:
                    tb.scalars({"train/box_loss": mean["box"],
                                "train/cls_loss": mean["cls"],
                                "train/dfl_loss": mean["dfl"],
                                "train/total_loss": mean["total"],
                                "lr/lr0": lr_now,
                                "metrics/mAP50(B)": map50,
                                "metrics/mAP50-95(B)": map5095}, epoch)
                    tb.flush()
        finally:
            # flush even on mid-training failure (buffered TFRecord bytes
            # since the last per-epoch flush would otherwise be lost)
            if tb is not None:
                tb.close()
    log.info("done")


def validate(model, state, val_ds, args, nc):
    """Standard detection validation with EMA weights (reference validator +
    DetMetrics, eval/det_metrics.py)."""
    from ..data import PaddedBatcher
    from ..engine import Detector
    from ..eval.det_metrics import compute_det_metrics

    variables = {"params": state.ema_params, "batch_stats": state.batch_stats}
    det = Detector(model=model, variables=variables, img_size=args.img_size)
    step = det.predict_fn(conf_thres=0.001)
    preds, targets = [], []
    for batch in PaddedBatcher(val_ds, args.batch_size, args.img_size,
                               max_gt=args.max_gt,
                               workers=getattr(args, "workers", 4)):
        out = step(variables, batch["images"])
        import numpy as np

        boxes = np.asarray(out.det.boxes)
        conf = np.asarray(out.det.conf)
        cls = np.asarray(out.det.cls)
        valid = np.asarray(out.det.valid)
        bmask = batch.get("batch_mask", np.ones(len(boxes), bool))
        for i in range(len(boxes)):
            if not bmask[i]:
                continue
            n = int(valid[i].sum())
            preds.append(dict(img_name=batch["im_names"][i], bboxes=boxes[i, :n],
                              cls=cls[i, :n], conf=conf[i, :n]))
            m = batch["gt_mask"][i]
            targets.append(dict(img_name=batch["im_names"][i],
                                bboxes=batch["gt_bboxes"][i][m],
                                cls=batch["gt_labels"][i][m]))
    return compute_det_metrics(preds, targets, nc)


if __name__ == "__main__":
    main()

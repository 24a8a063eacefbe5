"""Standalone validation CLI — the reference's `yolo val` capability
(engine/validator.py BaseValidator + DetMetrics mAP50/50-95): load a trained
checkpoint, run the jitted predict step over a dataset split with the
validator's conf=0.001, and report/write detection metrics.

The train CLI's ``--val_only`` mode covers the same path inside a training
run directory; this entrypoint matches the reference's separate `val`
surface (model + dataset → metrics, no trainer state needed).
"""

from __future__ import annotations

import argparse
import json
import logging
import types
from pathlib import Path

log = logging.getLogger("val")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("val")
    p.add_argument("--model_path", required=True, help="orbax checkpoint dir")
    p.add_argument("--dataset", required=True, help="dataset yaml")
    p.add_argument("--split", default="val", choices=["train", "val", "test"])
    p.add_argument("--owod_task", default="",
                   choices=["", "t1", "t2", "t3", "t4", "all_task_test"])
    p.add_argument("--owod_tasks_dir", default=str(
        Path(__file__).resolve().parents[2] / "datasets_utils" / "owod" / "tasks"))
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--img_size", type=int, default=640)
    p.add_argument("--max_gt", type=int, default=128)
    p.add_argument("--out", default="", help="optional metrics json path")
    from ..utils.compile_cache import add_compile_cache_flag

    add_compile_cache_flag(p)
    return p


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    from ..utils.compile_cache import enable_compilation_cache

    enable_compilation_cache(args.compile_cache)

    from ..core.checkpoint import load_checkpoint
    from ..data import DetectionDataset
    from ..models import build_model
    from .train import validate

    ds = DetectionDataset.from_yaml(args.dataset, split=args.split,
                                    owod_task=args.owod_task or None,
                                    tasks_dir=args.owod_tasks_dir or None)
    assert len(ds), f"empty {args.split} split in {args.dataset}"
    variables, meta = load_checkpoint(args.model_path)
    nc = int(meta.get("train_args", {}).get("nc", ds.number_of_classes))
    model = build_model(meta["model_name"], nc=nc)
    state = types.SimpleNamespace(ema_params=variables["params"],
                                  batch_stats=variables["batch_stats"])
    metrics = validate(model, state, ds, args, nc)
    log.info("%s %s: mAP50=%.4f mAP50-95=%.4f", meta["model_name"],
             args.split, metrics["mAP50"], metrics["mAP50_95"])
    if args.out:
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(json.dumps(
            {k: float(v) for k, v in metrics.items()
             if isinstance(v, (int, float))}, indent=1))
    return metrics


if __name__ == "__main__":
    main()

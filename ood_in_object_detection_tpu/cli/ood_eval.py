"""OoD evaluation CLI — the flag surface mirrors the reference's
``ood_evaluation.py`` Tap parser (its public API contract,
ood_evaluation.py:33-176), rebuilt on the TPU-native pipeline.

Flow (reference main(), ood_evaluation.py:662-846):
  load model -> build InD/OoD dataloaders -> method factory -> InD
  configuration pipeline (activations -> clusters -> scores -> thresholds,
  cached on disk under storage/) -> evaluate each OoD dataset -> CSV/XLSX.

Benchmark sweeps (reference :847-1342) iterate one knob and re-run the
cheapest necessary part of the pipeline per value.
"""

from __future__ import annotations

import argparse
import logging
import pickle
import time
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from .. import constants as C
from ..core.config import CUSTOM_HYP, set_by_dotted_path
from ..data import DetectionDataset, PaddedBatcher
from ..engine import Detector
from ..eval.results_writer import (
    append_results, fill_dataset_results, finalize_row, method_info_row,
)
from ..ood.pipeline import evaluate_method, extract_ind_activations, fit_ind_pipeline
from .factory import build_ood_method

log = logging.getLogger("ood_eval")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("ood_eval", description=__doc__)
    p.add_argument("--ood_method", required=True,
                   help="method name or fusion-M1-M2[-M3]")
    p.add_argument("--model", default="l",
                   choices=["n", "s", "m", "b", "l", "x", "t", "c", "e"])
    p.add_argument("--model_version", default="yolov8",
                   choices=["yolov8", "yolov9", "yolov10", "yolo11", "yolo12"])
    p.add_argument("--model_path", default="", help="checkpoint dir (orbax)")
    p.add_argument("--device", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--workers", type=int, default=2)
    p.add_argument("--name", default="prueba")
    p.add_argument("--logdir", default="logs")
    p.add_argument("--ind_dataset", required=True, help="dataset yaml path")
    p.add_argument("--ood_datasets", nargs="+", required=True,
                   help="dataset yaml paths")
    p.add_argument("--ind_split", default="train", choices=["train", "val", "test"])
    p.add_argument("--ood_split", default="val", choices=["train", "val", "test"])
    p.add_argument("--owod_task_ind", default="", choices=["", "t1", "t2", "t3", "t4", "all_task_test"])
    p.add_argument("--owod_task_ood", default="", choices=["", "t1", "t2", "t3", "t4", "all_task_test"])
    p.add_argument("--owod_tasks_dir", default=str(
        Path(__file__).resolve().parents[2] / "datasets_utils" / "owod" / "tasks"))
    p.add_argument("--conf_thr_train", type=float, default=0.15)
    p.add_argument("--conf_thr_test", type=float, default=0.15)
    p.add_argument("--tpr_thr", type=float, default=0.95)
    p.add_argument("--which_split", default="train", choices=["train", "val", "train_val"])
    p.add_argument("--cluster_method", default="one")
    p.add_argument("--cluster_optimization_metric", default="silhouette",
                   choices=list(C.AVAILABLE_CLUSTER_OPTIMIZATION_METRICS))
    p.add_argument("--ind_info_creation_option", default="valid_preds_one_stride",
                   choices=C.IND_INFO_CREATION_OPTIONS)
    p.add_argument("--which_internal_activations", default="roi_aligned_ftmaps",
                   choices=C.INTERNAL_ACTIVATIONS_EXTRACTION_OPTIONS,
                   help="activation tap for distance methods (reference"
                        " ood_evaluation.py:63, constants.py:29)")
    p.add_argument("--remove_orphans", action="store_true",
                   help="drop cluster orphans instead of per-orphan clusters"
                        " (reference ood_evaluation.py:168-170 ->"
                        " CUSTOM_HYP.clusters.REMOVE_ORPHANS)")
    p.add_argument("--visualize_clusters", action="store_true",
                   help="save a 2D PCA scatter of the fitted clusters per class"
                        " (reference ood_evaluation.py:164-166)")
    p.add_argument("--use_values_before_sigmoid", action="store_true", default=True)
    p.add_argument("--no_use_values_before_sigmoid", dest="use_values_before_sigmoid",
                   action="store_false",
                   help="score logits methods on post-sigmoid probabilities"
                        " (reference ood_evaluation.py:67 default True)")
    p.add_argument("--fusion_strategy", default="none", choices=["and", "or", "score", "none"])
    p.add_argument("--dump_fusion_scores", default="",
                   help="after fitting a fusion method, save per-box member"
                        " INDness + fused decisions on the first OoD dataset"
                        " to this .npz (consumed by process_results"
                        " --fusion_npz; reference score_fusion_plot.ipynb)")
    p.add_argument("--enhanced_unk_localization", action="store_true")
    p.add_argument("--visualize_oods", action="store_true",
                   help="render first batches with OoD verdicts (reference"
                        " ood_evaluation.py visualize_oods)")
    p.add_argument("--temperature_energy", type=float, default=1.0)
    p.add_argument("--temperature_odin", type=float, default=1000.0)
    p.add_argument("--benchmark", default="", choices=[""] + C.AVAILABLE_BENCHMARKS)
    p.add_argument("--load_ind_activations", action="store_true")
    p.add_argument("--load_clusters", action="store_true")
    p.add_argument("--load_thresholds", action="store_true")
    p.add_argument("--img_size", type=int, default=640)
    p.add_argument("--bf16", action="store_true",
                   help="run the model in bfloat16 (f32 params, bf16 compute"
                        " + taps). TPU-native serving precision: +26%% eval"
                        " throughput at measured zero decision flips and"
                        " <5e-5 threshold delta (PERF.md 'Tap dtype',"
                        " scripts/bench_bf16_taps.py)")
    p.add_argument("--compute_metrics", action="store_true", default=True)
    p.add_argument("--data_parallel", action="store_true",
                   help="shard every predict batch over all local devices"
                        " (one SPMD executable on a ('dcn','data') mesh)."
                        " The reference fans its eval sweeps out as one"
                        " process per GPU (replicate/benchmarks_v8.sh); here"
                        " one process drives the whole mesh")
    p.add_argument("--export_bundle", default="",
                   help="after fitting, write a standalone serving bundle"
                        " (jax.export model + pickled fitted method) to this"
                        " directory — deployable with zero model code"
                        " (utils/export.py load_serving_bundle)")
    p.add_argument("--export_bundle_batch", type=int, default=1,
                   help="compiled batch size of the bundled executable")
    from ..utils.compile_cache import add_compile_cache_flag

    add_compile_cache_flag(p)
    return p


def cache_paths(args, method) -> Dict[str, Path]:
    """Cache keys mirror define_paths_of_activations_thresholds_and_clusters
    (reference ood_evaluation.py:291-336)."""
    ckpt_name = Path(args.model_path).stem if args.model_path else f"{args.model_version}{args.model}"
    internal = "logits" if not method.is_distance_method else "roi_aligned_ftmaps"
    base = f"{internal}_conf{args.conf_thr_train}_{ckpt_name}"
    if method.is_distance_method:
        base += f"_{args.ind_info_creation_option}"
    C.STORAGE_PATH.mkdir(parents=True, exist_ok=True)
    return {
        "activations": C.STORAGE_PATH / f"{base}_activations.pkl",
        "clusters": C.STORAGE_PATH / f"{base}_{getattr(method, 'cluster_method', 'None')}_clusters.pkl",
        "thresholds": C.STORAGE_PATH / f"{base}_tpr{args.tpr_thr}_thresholds.pkl",
    }


# per-task known-class counts (reference select_number_of_classes_owod,
# ultralytics/data/dataset.py:1087-1101)
OWOD_TASK_NC = {"t1": 20, "t2": 40, "t3": 60, "t4": 80, "all_task_test": 80}


def load_detector(args, default_nc: int = 20) -> Detector:
    import jax.numpy as jnp

    nc = OWOD_TASK_NC.get(args.owod_task_ind, 0) or default_nc
    dtype = jnp.bfloat16 if getattr(args, "bf16", False) else jnp.float32
    if args.model_path:
        from ..core.checkpoint import load_checkpoint

        variables, meta = load_checkpoint(args.model_path)
        ckpt_nc = meta.get("nc") or meta.get("train_args", {}).get("nc") or nc
        return Detector.create(meta["model_name"], nc=ckpt_nc,
                               img_size=args.img_size, variables=variables,
                               dtype=dtype)
    from .factory import resolve_model_name

    name = resolve_model_name(args.model_version, args.model)
    return Detector.create(name, nc=nc, img_size=args.img_size, dtype=dtype)


def load_dataset(args, path_or_name: str, split: str, owod_task: str) -> DetectionDataset:
    return DetectionDataset.from_yaml(
        path_or_name, split=split, owod_task=owod_task or None,
        tasks_dir=args.owod_tasks_dir or None)


def _load_or_extract(args, detector, method, batches, cache_file, logger):
    if args.load_ind_activations and cache_file.exists():
        acts = pickle.loads(cache_file.read_bytes())
        logger.info("loaded InD activations from %s", cache_file)
    else:
        t0 = time.perf_counter()
        acts = extract_ind_activations(detector, batches, method, args.conf_thr_train,
                                       mesh=getattr(args, "mesh_obj", None))
        logger.info("extracted InD activations in %.1fs", time.perf_counter() - t0)
        cache_file.write_bytes(pickle.dumps({k: v for k, v in acts.items()}))
    return acts


def _concat_acts(a, b):
    """Per-leaf concat of train+val activations (reference
    concat_arrays_inside_list_of_lists, ood_evaluation.py:599-640)."""
    def cat(x, y):
        if isinstance(x, list):
            return [cat(xi, yi) for xi, yi in zip(x, y)]
        xe, ye = x.shape[0] == 0, y.shape[0] == 0
        if ye:
            return x
        if xe:
            return y
        return np.concatenate([x, y], axis=0)

    return {k: cat(a[k], b[k]) for k in a}


def configure_ind(args, detector, method, batches, logger,
                  val_batches=None) -> None:
    """InD pipeline with disk caching (reference
    execute_pipeline_for_in_distribution_configuration, ood_evaluation.py:398).

    which_split semantics follow the reference exactly: clusters are ALWAYS
    fitted from the train-split activations (ood_evaluation.py:521-527), but
    the scores the thresholds are percentiled from come from the selected
    split — 'val' uses the val activations alone, 'train_val' concatenates
    both (ood_evaluation.py:540-562)."""
    paths = cache_paths(args, method)
    acts = _load_or_extract(args, detector, method, batches,
                            paths["activations"], logger)
    acts_val = None
    if args.which_split in ("val", "train_val"):
        assert val_batches is not None, \
            f"which_split={args.which_split} needs val batches"
        val_file = paths["activations"].with_name(
            paths["activations"].name.replace(".pkl", "_val.pkl"))
        acts_val = _load_or_extract(args, detector, method, val_batches,
                                    val_file, logger)
    # re-key by position (pickle loses object ids across processes)
    from ..ood.methods import DistanceOODMethod
    from ..ood.pipeline import _leaf_methods, assign_fitted_state

    leaves = _leaf_methods(method)
    if set(acts.keys()) != {id(m) for m in leaves}:
        acts = {id(m): v for m, v in zip(leaves, acts.values())}
    if acts_val is not None and set(acts_val.keys()) != {id(m) for m in leaves}:
        acts_val = {id(m): v for m, v in zip(leaves, acts_val.values())}
    if args.which_split == "val":
        score_acts = acts_val
    elif args.which_split == "train_val":
        score_acts = _concat_acts(acts, acts_val)
    else:
        score_acts = acts

    # cached clusters (reference load_clusters, ood_evaluation.py:443-545):
    # restore fitted centroids and skip the grid search
    clusters_loaded = False
    if args.load_clusters and paths["clusters"].exists():
        assign_fitted_state(
            method, clusters=pickle.loads(paths["clusters"].read_bytes()))
        clusters_loaded = True
        logger.info("loaded clusters from %s", paths["clusters"])

    for m in leaves:
        if isinstance(m, DistanceOODMethod) and not (clusters_loaded and m.clusters):
            m.generate_clusters(acts[id(m)])  # clusters: train split always
        scores = m.compute_scores_from_activations(score_acts[id(m)])
        m.generate_thresholds(scores, args.tpr_thr)

    # cached thresholds override the refit values (reference load_thresholds)
    if args.load_thresholds and paths["thresholds"].exists():
        assign_fitted_state(
            method, thresholds=pickle.loads(paths["thresholds"].read_bytes()))
        logger.info("loaded thresholds from %s", paths["thresholds"])

    paths["clusters"].write_bytes(pickle.dumps(
        [getattr(m, "clusters", None) for m in leaves]))
    paths["thresholds"].write_bytes(pickle.dumps(
        [m.thresholds for m in leaves]))
    # fit-time method config sidecar: cli.predict reads this to rebuild the
    # method EXACTLY as fitted (temperatures, sigmoid space, activation tap)
    # instead of trusting its own flag defaults to match
    import json

    paths["thresholds"].with_suffix(".json").write_text(json.dumps({
        k: getattr(args, k) for k in (
            "ood_method", "cluster_method", "cluster_optimization_metric",
            "fusion_strategy", "temperature_energy", "temperature_odin",
            "use_values_before_sigmoid", "which_internal_activations",
            "ind_info_creation_option", "tpr_thr", "conf_thr_train")
        if hasattr(args, k)}))


def build_val_batches(args) -> list:
    """Val-split InD batches for the which_split threshold-score selection
    (reference dataloader_val, ood_evaluation.py:714-720)."""
    val = load_dataset(args, args.ind_dataset, "val", args.owod_task_ind)
    return list(PaddedBatcher(val, args.batch_size, args.img_size))


def run_eval(args, detector, method, logger) -> List[Dict]:
    rows = []
    row = method_info_row(method, args.which_split, args.conf_thr_train,
                          args.conf_thr_test, args.tpr_thr, args.fusion_strategy)
    for ds_path in args.ood_datasets:
        ds = load_dataset(args, ds_path, args.ood_split, args.owod_task_ood)
        batches = PaddedBatcher(ds, args.batch_size, args.img_size)
        # names the dataset in the BENCHMARK_MODE slim-cache key so multiple
        # --ood_datasets never collide (ood/pipeline.py; ADVICE r4 high)
        batches.tag = ds.yaml_name
        known = list(range(ds.number_of_classes))
        names = ds.names[: ds.number_of_classes] + ["unknown"]
        vis_dir = None
        if getattr(args, "visualize_oods", False):
            vis_dir = str(C.RESULTS_PATH / "visualizations" / f"{args.name}_{ds.yaml_name}")
        metrics = evaluate_method(
            detector, batches, method, known, names,
            conf_thr_test=args.conf_thr_test,
            enhanced_unk_localization=args.enhanced_unk_localization,
            logger=logger, visualize_dir=vis_dir,
            mesh=getattr(args, "mesh_obj", None))
        logger.info("%s -> %s", ds.yaml_name, metrics)
        fill_dataset_results(row, _dataset_key(ds.yaml_name), metrics, args.owod_task_ood)
    rows.append(finalize_row(row, f"{args.model_version}{args.model}",
                             {k: v for k, v in vars(args).items()
                              if k != "mesh_obj"}))
    return rows


def _dataset_key(yaml_name: str) -> str:
    for key in ("coco_ood", "coco_mixed", "owod"):
        if key in yaml_name:
            return key
    return "coco_ood"


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    logger = log
    from ..utils.compile_cache import enable_compilation_cache

    enable_compilation_cache(args.compile_cache)
    # hyperparameter switches (reference ood_evaluation.py:163-176)
    if args.remove_orphans:
        CUSTOM_HYP.clusters.REMOVE_ORPHANS = True
    if args.visualize_clusters:
        CUSTOM_HYP.clusters.VISUALIZE = True

    ind = load_dataset(args, args.ind_dataset, args.ind_split, args.owod_task_ind)
    detector = load_detector(args, default_nc=ind.number_of_classes)
    args.mesh_obj = None
    if getattr(args, "data_parallel", False):
        from ..parallel import make_multislice_mesh

        args.mesh_obj = make_multislice_mesh(model=1)
        n = args.mesh_obj.devices.size
        assert args.batch_size % n == 0, \
            f"--batch_size {args.batch_size} must divide over {n} devices"
        logger.info("data-parallel eval over mesh %s", dict(args.mesh_obj.shape))
    method = build_ood_method(
        args.ood_method, args.cluster_method, args.cluster_optimization_metric,
        args.fusion_strategy, args.temperature_energy, args.temperature_odin,
        use_values_before_sigmoid=args.use_values_before_sigmoid)
    from ..ood.methods import DistanceOODMethod
    from ..ood.pipeline import _leaf_methods

    for m in _leaf_methods(method):
        if isinstance(m, DistanceOODMethod):
            m.ind_info_creation_option = args.ind_info_creation_option
            if args.which_internal_activations in C.FTMAPS_RELATED_OPTIONS:
                m.which_internal_activations = args.which_internal_activations

    ind_batches = list(PaddedBatcher(ind, args.batch_size, args.img_size))
    val_batches = build_val_batches(args) \
        if args.which_split in ("val", "train_val") else None

    if args.benchmark:
        from .benchmarks import run_benchmark

        run_benchmark(args, detector, method, ind_batches, logger,
                      val_batches=val_batches)
        return

    configure_ind(args, detector, method, ind_batches, logger,
                  val_batches=val_batches)
    if args.export_bundle:
        from ..utils.export import export_serving_bundle

        export_serving_bundle(detector, method, args.export_bundle,
                              batch=args.export_bundle_batch,
                              conf_thres=args.conf_thr_test)
        logger.info("serving bundle written to %s", args.export_bundle)
    if args.dump_fusion_scores:
        from ..ood.methods import FusionOODMethod
        from ..ood.pipeline import collect_fusion_member_indness

        assert isinstance(method, FusionOODMethod), \
            "--dump_fusion_scores needs a fusion-... method"
        ds = load_dataset(args, args.ood_datasets[0], args.ood_split,
                          args.owod_task_ood)
        data = collect_fusion_member_indness(
            detector, PaddedBatcher(ds, args.batch_size, args.img_size),
            method, conf_thr_test=args.conf_thr_test,
            mesh=getattr(args, "mesh_obj", None))
        Path(args.dump_fusion_scores).parent.mkdir(parents=True, exist_ok=True)
        np.savez(args.dump_fusion_scores, **data)
        logger.info("fusion member scores -> %s", args.dump_fusion_scores)
    rows = run_eval(args, detector, method, logger)
    out = append_results(rows, C.RESULTS_PATH, args.name)
    logger.info("results written to %s", out)


if __name__ == "__main__":
    main()

"""OoD method factory (reference select_ood_detection_method,
ood_evaluation.py:179-289): builds logits / distance / fusion / triple-fusion
methods from the CLI method string, recursively for 'fusion-M1-M2[-M3]'."""

from __future__ import annotations


from ..constants import DISTANCE_METHODS, LOGITS_METHODS
from ..ood.methods import DistanceOODMethod, FusionOODMethod, LogitsOODMethod

# scales reachable per family through the CLI (models/yolo.py SCALES/SPECS).
# v9 l/x remap to c, mirroring the reference's fallthrough for sizes its v9
# repo doesn't ship (custom_training.py:90-127).
FAMILY_SCALES = {
    "yolov8": "nsmlx",
    "yolov9": "tsmce" + "lx",  # l/x remapped to c below
    "yolov10": "nsmblx",
    "yolo11": "nsmlx",
    "yolo12": "nsmlx",
}


def resolve_model_name(model_version: str, scale: str) -> str:
    """Validate the (family, scale) combination up front and return the
    build_model name — a bad combo fails here with the valid scales named,
    not deep inside build_model (ADVICE r4)."""
    valid = FAMILY_SCALES.get(model_version)
    if valid is None:
        raise SystemExit(
            f"unknown model_version '{model_version}'; "
            f"have {sorted(FAMILY_SCALES)}")
    if scale not in valid:
        raise SystemExit(
            f"{model_version} has no '{scale}' scale; valid scales: "
            f"{', '.join(valid.replace('lx', '') if model_version == 'yolov9' else valid)}"
            + (" (l/x map to c)" if model_version == "yolov9" else ""))
    if model_version == "yolov9" and scale in ("l", "x"):
        return "yolov9c"  # v9 has t/s/m/c/e variants only (models/yolo.py)
    return f"{model_version}{scale}"


def build_ood_method(
    name: str,
    cluster_method: str = "one",
    cluster_optimization_metric: str = "silhouette",
    fusion_strategy: str = "none",
    temperature_energy: float = 1.0,
    temperature_odin: float = 1000.0,
    use_values_before_sigmoid: bool = True,
):
    if name.startswith("fusion-"):
        parts = name.split("-")[1:]
        assert len(parts) in (2, 3), f"fusion needs 2 or 3 members: {name}"
        cluster_methods = cluster_method.split("-")
        members = []
        ci = 0
        for p in parts:
            cm = cluster_methods[min(ci, len(cluster_methods) - 1)]
            m = build_ood_method(p, cm, cluster_optimization_metric,
                                 "none", temperature_energy, temperature_odin,
                                 use_values_before_sigmoid)
            if isinstance(m, DistanceOODMethod):
                ci += 1
            members.append(m)
        strategy = fusion_strategy if fusion_strategy != "none" else "and"
        if len(parts) == 3 and strategy not in ("vote",):
            strategy = "vote" if fusion_strategy == "none" else fusion_strategy
        return FusionOODMethod(members, strategy=strategy, name=name)
    if name in LOGITS_METHODS:
        temper = {"Energy": temperature_energy, "ODIN": temperature_odin}.get(name, 1.0)
        return LogitsOODMethod(name, temper=temper,
                               use_values_before_sigmoid=use_values_before_sigmoid)
    if name in DISTANCE_METHODS:
        m = DistanceOODMethod.from_name(
            name, cluster_method=cluster_method,
            cluster_optimization_metric=cluster_optimization_metric)
        if name in ("Umap", "CosineIvis", "L1Ivis", "L2Ivis"):
            from ..ood.sdr import attach_sdr_transform

            attach_sdr_transform(m, kind="umap" if name == "Umap" else "ivis")
        return m
    raise ValueError(f"unknown OoD method {name}")

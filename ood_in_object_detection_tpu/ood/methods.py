"""OoD method framework: fit on host, decide on device, fixed shapes.

Re-designs the reference ``OODMethod`` hierarchy (ood_utils.py:44-3521) as a
pure-function protocol over padded box tensors:

    extract: model outputs + matches      -> per-(class[,stride]) activations
    fit:     activations (+ tpr)          -> state (clusters / thresholds / min-max)
    decide:  batch outputs + packed state -> (B, max_det) InD mask
    indness: batch outputs + packed state -> (B, max_det) score in [-1, 1]

Decision conventions (identical to the reference):
- logits (similarity) methods: score < thr[cls]  => OoD
  (ood_utils.py:1195-1208); missing threshold counts as thr=0-ish: the
  reference indexes a python list that holds 0 for unfit classes, so a
  missing class threshold makes everything InD unless score<0 — we replicate
  by substituting 0.0 for missing logits thresholds.
- distance methods: no cluster => OoD; no threshold => OoD; dist < thr => InD
  (ood_utils.py:2147-2180).
- INDness piecewise-linear mapping for score fusion:
  logits ood_utils.py:1224-1283, distance ood_utils.py:1584-1650, clipped to
  [-1, 1] (CUSTOM_HYP.fusion.CLIP_FUSION_SCORES default True).
- fusion strategies and/or/score (ood_utils.py:2906-2940), triple majority
  voting (ood_utils.py:3282-3301).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .distance import (
    CentroidBank,
    build_centroid_bank,
    l2_normalize_rows,
    min_distance_to_class_centroids,
    NO_CLUSTER_DISTANCE,
)
from .scores import logits_score_fn, table_lookup, LOGITS_METHODS
from .thresholds import (
    generate_thresholds_per_class,
    generate_thresholds_per_class_per_stride,
    pack_thresholds_per_class,
    pack_thresholds_per_class_per_stride,
)

DISTANCE_METHODS = (
    "L1_cl_stride",
    "L2_cl_stride",
    "Cosine_cl_stride",
    "Umap",
    "CosineIvis",
    "L1Ivis",
    "L2Ivis",
)
OOD_METHOD_CHOICES = LOGITS_METHODS + DISTANCE_METHODS

_METRIC_OF = {
    "L1_cl_stride": "l1",
    "L2_cl_stride": "l2",
    "Cosine_cl_stride": "cosine",
    "Umap": "cosine",
    "CosineIvis": "cosine",
    "L1Ivis": "l1",
    "L2Ivis": "l2",
}


# ---------------------------------------------------------------------------
# Logits methods
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class LogitsOODMethod:
    """MSP / Energy / ODIN / Sigmoid / NoMethod with per-class thresholds."""

    name: str
    # None -> the reference CLI defaults: ODIN T=1000, everything else T=1
    # (ood_evaluation.py:70); an explicit value is honored verbatim, so
    # ODIN T=1 is expressible (no magic-value remap)
    temper: Optional[float] = None
    is_distance_method: bool = False
    per_class: bool = True
    per_stride: bool = False
    # False scores on post-sigmoid probabilities instead of raw logits
    # (reference ood_evaluation.py:67 use_values_before_sigmoid, default True)
    use_values_before_sigmoid: bool = True
    # fitted state
    thresholds: Optional[List[Optional[float]]] = None
    min_score: Optional[np.ndarray] = None
    max_score: Optional[np.ndarray] = None

    def __post_init__(self):
        assert self.name in LOGITS_METHODS, self.name
        if self.temper is None:
            self.temper = 1000.0 if self.name == "ODIN" else 1.0
        raw = logits_score_fn(self.name, self.temper)
        if self.name == "Sigmoid" or self.use_values_before_sigmoid:
            # Sigmoid's score IS sigmoid(logit)[cls]: with post-sigmoid
            # activations the reference uses them directly (exactly one
            # sigmoid either way, ood_utils.py:1436-1441) — wrapping would
            # apply it twice
            self._score = raw
        else:
            self._score = lambda lg, cls: raw(jax.nn.sigmoid(lg), cls)

    def __getstate__(self):
        # the score closure is derived state and (in the post-sigmoid
        # variant) unpicklable; rebuilt from name/temper on load
        d = dict(self.__dict__)
        d.pop("_score", None)
        return d

    def __setstate__(self, d):
        self.__dict__.update(d)
        self.__post_init__()

    # -- extraction / fitting (host side, offline) --
    def scores_from_logits(self, logits: np.ndarray, cls: np.ndarray) -> np.ndarray:
        """(N, nc), (N,) -> (N,) scores (vectorized reference compute_scores)."""
        if len(logits) == 0:
            return np.empty(0, np.float32)
        return np.asarray(self._score(jnp.asarray(logits), jnp.asarray(cls)))

    def compute_scores_from_activations(
        self, acts_per_class: Sequence[np.ndarray]
    ) -> List[np.ndarray]:
        """acts_per_class[c] = (N_c, nc) logits of valid preds of class c
        (structure: ood_utils.py:1284-1309). Also records min/max for INDness."""
        nc = len(acts_per_class)
        scores = []
        for c, acts in enumerate(acts_per_class):
            acts = np.asarray(acts)
            if acts.size == 0:
                scores.append(np.empty(0, np.float32))
            else:
                scores.append(self.scores_from_logits(acts, np.full(len(acts), c)))
        self.min_score = np.array([s.min() if s.size else 0.0 for s in scores], np.float32)
        self.max_score = np.array([s.max() if s.size else 0.0 for s in scores], np.float32)
        return scores

    def generate_thresholds(self, ind_scores: Sequence[np.ndarray], tpr: float):
        self.thresholds = generate_thresholds_per_class(ind_scores, tpr, is_distance=False)
        return self.thresholds

    # -- packed state for jitted decision --
    def packed_thresholds(self) -> jnp.ndarray:
        t = pack_thresholds_per_class(self.thresholds)
        # reference stores 0 for unfit classes (ood_utils.py:612 init `[0 ...]`)
        return jnp.asarray(np.nan_to_num(t, nan=0.0))

    def decide(self, logits: jnp.ndarray, cls: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
        """(B,N,nc),(B,N),(B,N) -> (B,N) 1=InD / 0=OoD (invalid boxes: 0)."""
        thr = table_lookup(self.packed_thresholds(), cls)
        s = self._score(logits, cls)
        return jnp.where(valid, (s >= thr).astype(jnp.int32), 0)

    def raw_scores(self, logits: jnp.ndarray, cls: jnp.ndarray) -> jnp.ndarray:
        """Threshold-free raw score per box (higher = more InD); usable
        before fitting (reference compute_scores, ood_utils.py:1394-1443)."""
        return self._score(logits, cls)

    def indness(self, logits: jnp.ndarray, cls: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
        """Piecewise-linear INDness in [-1, 1] (ood_utils.py:1224-1283).

        Clipping follows CUSTOM_HYP.fusion.CLIP_FUSION_SCORES (ref :1256).
        """
        from ..core.config import CUSTOM_HYP

        thr = table_lookup(self.packed_thresholds(), cls)
        mx = table_lookup(jnp.asarray(self.max_score), cls)
        mn = table_lookup(jnp.asarray(self.min_score), cls)
        s = self._score(logits, cls)
        pos = (s - thr) / jnp.maximum(mx - thr, 1e-12)
        neg = (s - thr) / jnp.maximum(thr - mn, 1e-12)
        ind = jnp.where(s > thr, pos, jnp.where(s < thr, neg, 0.0))
        if CUSTOM_HYP.fusion.CLIP_FUSION_SCORES:
            ind = jnp.clip(ind, -1.0, 1.0)
        return jnp.where(valid, ind, 0.0)


# ---------------------------------------------------------------------------
# Distance methods
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class DistanceOODMethod:
    """Centroid-distance methods with per-(class, stride) clusters+thresholds.

    ``transform`` defaults to flatten + L2 row normalization
    (ood_utils.py:2404-2410); dimensionality-reduction variants (SDR) override
    it with a fitted projection (see ood/sdr.py).
    """

    name: str
    metric: str = "cosine"
    cluster_method: str = "one"
    cluster_optimization_metric: str = "silhouette"
    agg: str = "mean"
    is_distance_method: bool = True
    per_class: bool = True
    per_stride: bool = True
    # 'roi_aligned_ftmaps' | 'ftmaps_and_strides' (same tap here) |
    # 'ftmaps_and_strides_exact_pos' (anchor-cell feature vector)
    # (reference constants.py:29, predict.py:155-325)
    which_internal_activations: str = "roi_aligned_ftmaps"
    # InD extraction source (reference constants.py:36-46)
    ind_info_creation_option: str = "valid_preds_one_stride"
    # fitted state
    clusters: Optional[List[List[np.ndarray]]] = None
    thresholds: Optional[List[List[Optional[float]]]] = None
    min_dist: Optional[np.ndarray] = None
    max_dist: Optional[np.ndarray] = None
    _bank: Optional[CentroidBank] = None
    transform_fn: Optional[Callable] = None  # (acts(N,*), cls, stride)->(N,D)

    def __getstate__(self):
        # the centroid bank holds device arrays; rebuilt lazily from the
        # (host) clusters on first use after unpickling. transform_fn (SDR)
        # is a fitted closure — methods carrying one don't pickle, by design.
        d = dict(self.__dict__)
        d["_bank"] = None
        return d

    @staticmethod
    def from_name(name: str, cluster_method: str = "one", **kw) -> "DistanceOODMethod":
        return DistanceOODMethod(name=name, metric=_METRIC_OF[name],
                                 cluster_method=cluster_method, **kw)

    # -- transform --
    def transform(self, acts: np.ndarray, cls_idx: int = 0, stride_idx: int = 0) -> np.ndarray:
        if self.transform_fn is not None:
            return self.transform_fn(acts, cls_idx, stride_idx)
        flat = np.asarray(acts, np.float32).reshape(len(acts), -1)
        return np.asarray(l2_normalize_rows(jnp.asarray(flat)))

    # -- clustering (host side; sklearn grid search in ood/clustering.py) --
    def generate_clusters(self, acts: Sequence[Sequence[np.ndarray]], logger=None,
                          min_samples: Optional[int] = None):
        """acts[class][stride] = (N, ...) activations (ood_utils.py:2263-2330).

        min_samples defaults to CUSTOM_HYP.clusters.MIN_SAMPLES read at call
        time (the reference gates on the live config, ood_utils.py:2303) —
        so dotted-path sweeps over clusters.MIN_SAMPLES take effect here."""
        from ..core.config import CUSTOM_HYP
        from .clustering import fit_cluster_labels

        if min_samples is None:
            min_samples = CUSTOM_HYP.clusters.MIN_SAMPLES

        agg = np.mean if self.agg == "mean" else np.median
        nc = len(acts)
        clusters: List[List[np.ndarray]] = [[np.empty(0) for _ in range(3)] for _ in range(nc)]
        for c in range(nc):
            for s in range(3):
                a = acts[c][s]
                if not isinstance(a, np.ndarray) or a.size == 0 or len(a) <= min_samples:
                    continue
                feats = self.transform(a, c, s)
                if self.cluster_method == "one":
                    clusters[c][s] = agg(feats, axis=0)[None, :]
                else:
                    labels = fit_cluster_labels(
                        feats, self.cluster_method, self.metric,
                        self.cluster_optimization_metric,
                        tag=f"{self.name}_cls{c}_stride{s}",
                    )
                    cents = []
                    for lab in sorted(set(labels.tolist())):
                        if lab == -1 and CUSTOM_HYP.clusters.REMOVE_ORPHANS:
                            # drop noise points instead of aggregating them
                            # into a bogus centroid (ood_utils.py:2362-2366)
                            continue
                        cents.append(agg(feats[labels == lab], axis=0))
                    if cents:
                        clusters[c][s] = np.stack(cents, axis=0)
        self.clusters = clusters
        self._bank = None
        return clusters

    def bank(self) -> CentroidBank:
        if self._bank is None:
            import jax

            dims = [c.shape[-1] for row in self.clusters for c in row
                    if isinstance(c, np.ndarray) and c.ndim == 2]
            # strides can have different feature dims (neck P3/P4/P5 channels);
            # zero-pad to the max — l1/l2/cosine are padding-invariant
            d = max(dims) if dims else 1
            padded = [
                [np.pad(c, ((0, 0), (0, d - c.shape[-1]))) if isinstance(c, np.ndarray)
                 and c.ndim == 2 else c for c in row]
                for row in self.clusters
            ]
            if self.metric == "cosine":
                # the Pallas kernel computes 1 - x·c assuming UNIT centroids;
                # cluster centroids are means of unit vectors (|c| < 1), and
                # the host pairwise_distance re-normalizes both sides — bake
                # the normalization in here so device and host agree
                # (padding-invariant: zero-padded dims don't change the norm)
                # pure NumPy so the build stays concrete under an outer
                # jit trace (jnp ops here would produce tracers)
                padded = [
                    [c / np.maximum(np.linalg.norm(c, axis=-1, keepdims=True),
                                    1e-12)
                     if isinstance(c, np.ndarray) and c.ndim == 2 else c
                     for c in row]
                    for row in padded
                ]
            # the build must stay concrete even when first triggered inside a
            # jit trace (e.g. distances() under an outer jit): without this,
            # the cached bank is a tracer and poisons every later trace
            with jax.ensure_compile_time_eval():
                self._bank = build_centroid_bank(padded, d)
        return self._bank

    # -- scoring --
    def compute_scores_from_activations(
        self, acts: Sequence[Sequence[np.ndarray]]
    ) -> List[List[np.ndarray]]:
        """InD distances per (class, stride) (ood_utils.py:1877-2036)."""
        from .distance import pairwise_distance

        nc = len(acts)
        scores: List[List[np.ndarray]] = [[np.empty(0) for _ in range(3)] for _ in range(nc)]
        for c in range(nc):
            for s in range(3):
                a = acts[c][s]
                cl = self.clusters[c][s]
                if (not isinstance(a, np.ndarray)) or a.size == 0 or \
                   (not isinstance(cl, np.ndarray)) or cl.size == 0:
                    continue
                feats = self.transform(a, c, s)
                d = np.asarray(pairwise_distance(jnp.asarray(cl, jnp.float32),
                                                 jnp.asarray(feats), self.metric))
                scores[c][s] = d.min(axis=0)
        self.min_dist = np.array(
            [[s.min() if s.size else 0.0 for s in row] for row in scores], np.float32)
        self.max_dist = np.array(
            [[s.max() if s.size else 0.0 for s in row] for row in scores], np.float32)
        return scores

    def generate_thresholds(self, ind_scores, tpr: float):
        self.thresholds = generate_thresholds_per_class_per_stride(
            ind_scores, tpr, is_distance=True)
        return self.thresholds

    def generate_unk_prop_thr(self, acts, tpr: float, rank_op: str = "entropy"):
        """Threshold over rank-reduced distances of InD stride-0 activations to
        every class's stride-0 clusters, used to gate EUL unknown proposals
        (reference compute_scores_from_activations_for_unk_proposals +
        generate_unk_prop_thr, ood_utils.py:1917-2023)."""
        from .distance import pairwise_distance
        from .unknown import rank_distances

        all_scores = []
        for c, per_cls in enumerate(acts):
            a = per_cls[0]
            if not isinstance(a, np.ndarray) or a.size == 0:
                continue
            feats = self.transform(a, c, 0)
            rows = []
            for c2 in range(len(self.clusters)):
                cl = self.clusters[c2][0]
                if isinstance(cl, np.ndarray) and cl.ndim == 2 and cl.size:
                    d = np.asarray(pairwise_distance(
                        jnp.asarray(cl, jnp.float32), jnp.asarray(feats), self.metric))
                    rows.append(d.min(axis=0))
            if rows:
                all_scores.append(rank_distances(np.stack(rows), rank_op))
        if not all_scores:
            self.unk_prop_thr = None
            return None
        scores = np.concatenate(all_scores)
        self.unk_prop_thr = float(np.percentile(scores, 100 * tpr, method="lower"))
        return self.unk_prop_thr

    def packed_thresholds(self) -> jnp.ndarray:
        return jnp.asarray(pack_thresholds_per_class_per_stride(self.thresholds))

    def distances(self, feats: jnp.ndarray, cls: jnp.ndarray, stride_idx: jnp.ndarray) -> jnp.ndarray:
        """(N,D) transformed feats -> (N,) min centroid distance.

        Feats and centroids are zero-padded to a common width — padding is
        metric-invariant for l1/l2/cosine."""
        bank = self.bank()
        d_f, d_b = feats.shape[-1], bank.centroids.shape[-1]
        if d_f < d_b:
            feats = jnp.pad(feats, ((0, 0), (0, d_b - d_f)))
        elif d_b < d_f:
            bank = bank._replace(centroids=jnp.pad(
                bank.centroids, ((0, 0), (0, 0), (0, 0), (0, d_f - d_b))))
        if self.metric in ("cosine", "l2", "euclidean"):
            # fused Pallas MXU kernel on TPU (ops/pallas/distance.py):
            # (N, nc*S) group mins, then gather each box's (cls, stride) group
            from ..ops.pallas.distance import min_group_distances

            if self.metric == "cosine":
                # sklearn cosine normalizes BOTH sides; the kernel assumes
                # unit rows (bank centroids are normalized at build).
                # Idempotent for callers that already normalized; required
                # for raw SDR embeddings (pipeline eval path).
                feats = l2_normalize_rows(feats)
            nc, s, kmax, dd = bank.centroids.shape
            groups = bank.centroids.reshape(nc * s, kmax, dd)
            kmask = (jnp.arange(kmax)[None, :] < bank.count.reshape(-1)[:, None])
            dmat = min_group_distances(feats, groups, kmask, self.metric)
            gidx = (cls * s + stride_idx)[:, None]
            sel = gidx == jnp.arange(nc * s, dtype=jnp.int32)
            dmin = jnp.sum(jnp.where(sel, dmat, 0.0), axis=1)
            return jnp.where(jnp.isfinite(dmin), dmin, NO_CLUSTER_DISTANCE)
        return min_distance_to_class_centroids(feats, cls, stride_idx, bank, self.metric)

    def decide_from_distances(self, dist: jnp.ndarray, cls: jnp.ndarray,
                              stride_idx: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
        thr = table_lookup(self.packed_thresholds(), cls, stride_idx)
        ind = (dist < thr) & ~jnp.isnan(thr)
        return jnp.where(valid, ind.astype(jnp.int32), 0)

    def indness_from_distances(self, dist: jnp.ndarray, cls: jnp.ndarray,
                               stride_idx: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
        """Distance INDness (ood_utils.py:1584-1650), all reference modes.

        - DISTANCE_USE_FROM_ZERO_TO_THR (ref :1596-1599): the linear map
          ``a*d + (1-a)`` with ``a = -1/(thr-1)`` — 0 at the threshold,
          assumes distance scales > 1. The reference crashes on unfit
          (empty-list) thresholds here; we return -1 instead.
        - DISTANCE_USE_IN_DISTRIBUTION_TO_DEFINE_LIMITS (default, ref
          :1601-1640): piecewise-linear between min/max InD distance and the
          threshold. The reference's literal code always returns -1 on this
          branch (isinstance check on the per-class list, ref :1600) — set
          CUSTOM_HYP.fusion.DISTANCE_INDNESS_REFERENCE_QUIRK to replicate
          that; the default implements the intended math.
        - Clipping per CLIP_FUSION_SCORES (ref :1642).
        """
        from ..core.config import CUSTOM_HYP

        fus = CUSTOM_HYP.fusion
        thr = table_lookup(self.packed_thresholds(), cls, stride_idx)
        if fus.DISTANCE_USE_FROM_ZERO_TO_THR:
            # thr == 1 is degenerate (the reference raises ZeroDivisionError
            # there); treat it like an unfit threshold -> max OoD
            den = thr - 1.0
            a = -1.0 / jnp.where(jnp.abs(den) < 1e-9, 1.0, den)
            ind = jnp.where(jnp.abs(den) < 1e-9, -1.0,
                            a * dist + (1.0 - a))
        elif fus.DISTANCE_INDNESS_REFERENCE_QUIRK:
            ind = jnp.full_like(dist, -1.0)
        else:
            mx = table_lookup(jnp.asarray(self.max_dist), cls, stride_idx)
            mn = table_lookup(jnp.asarray(self.min_dist), cls, stride_idx)
            above = -(dist - thr) / jnp.maximum(mx - thr, 1e-12)
            below = (thr - dist) / jnp.maximum(thr - mn, 1e-12)
            ind = jnp.where(dist > thr, above, jnp.where(dist < thr, below, 0.0))
        if fus.CLIP_FUSION_SCORES:
            ind = jnp.clip(ind, -1.0, 1.0)
        ind = jnp.where(jnp.isnan(thr), -1.0, ind)  # no thr => max OoD (ref :1640)
        return jnp.where(valid, ind, 0.0)


# ---------------------------------------------------------------------------
# Fusion
# ---------------------------------------------------------------------------


def fuse_decisions(strategy: str, *decisions: jnp.ndarray) -> jnp.ndarray:
    """Fuse 1=InD/0=OoD masks or INDness scores (ood_utils.py:2906-2940;
    majority for 3 methods ood_utils.py:3282-3301)."""
    d = jnp.stack(decisions, axis=0)
    n = d.shape[0]
    if strategy == "and":
        return d.max(axis=0)
    if strategy == "or":
        return d.min(axis=0)
    if strategy == "score":
        return (d.sum(axis=0) > 0).astype(jnp.int32)
    if strategy == "vote":
        return (d.sum(axis=0) >= (n // 2 + 1)).astype(jnp.int32)
    raise ValueError(f"unknown fusion strategy {strategy}")


@dataclasses.dataclass
class FusionOODMethod:
    """Two (or three) methods fused by and/or/score(/vote).

    Unlike the reference, which runs 2-3 full forward passes per batch with
    model mutation in between (ood_utils.py:2971-2997, 3326-3363), the TPU
    pipeline evaluates all member methods from ONE forward pass — every tap
    (logits + features) is already a declared model output.
    """

    methods: Sequence[object]
    strategy: str = "and"
    name: str = "fusion"

    @property
    def is_distance_method(self) -> bool:
        return any(getattr(m, "is_distance_method", False) for m in self.methods)

    def fuse(self, member_outputs: Sequence[jnp.ndarray]) -> jnp.ndarray:
        return fuse_decisions(self.strategy, *member_outputs)

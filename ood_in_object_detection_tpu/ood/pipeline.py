"""End-to-end OoD pipelines: InD extraction -> fit -> evaluate.

Re-provides the reference's data-iteration machinery as thin host loops
around the single jitted predict step:

- ``extract_ind_activations``: reference
  OODMethod.iterate_data_to_extract_ind_activations (ood_utils.py:294-336) —
  per batch: predict at conf_thr_train, Hungarian-match predictions to
  targets (ood_utils.py:233-292), bucket the matched boxes' taps per class
  (logits) or per (class, stride) (RoI features, 'valid_preds_one_stride',
  the CLI default ood_evaluation.py:61).
- ``fit_ind_pipeline``: reference
  execute_pipeline_for_in_distribution_configuration (ood_evaluation.py:398):
  activations -> [clusters] -> scores -> thresholds.
- ``evaluate_method``: reference iterate_data_to_compute_metrics
  (ood_utils.py:428-582): per batch decide InD/OoD, relabel OoD as class 80,
  optionally add EUL unknown proposals (conf 0.150001, ood_utils.py:530),
  accumulate and run the OWOD protocol.
"""

from __future__ import annotations

import logging
import os
import time
from functools import partial
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import CUSTOM_HYP
from ..engine import Detector, PredictOutput
from ..eval.owod_protocol import UNKNOWN_CLASS_INDEX, compute_metrics
from .distance import l2_normalize_rows, pairwise_distance
from .matching import match_predictions_to_targets
from .methods import DistanceOODMethod, FusionOODMethod, LogitsOODMethod
from .unknown import (eul_frontend_dispatch, eul_frontend_finish,
                      unknown_proposals_for_image)

log = logging.getLogger(__name__)

# per-process nonce for the BENCHMARK_MODE slim prediction cache, the analog
# of the reference's run-start NOW timestamp in its cache key
# (ood_utils.py:477) — stale entries from prior runs can never be read.
_CACHE_NONCE = f"{os.getpid():x}-{int(time.time()):x}"

UNK_PROPOSAL_CONF = 0.150001  # reference ood_utils.py:530


def _np(x):
    return np.asarray(x)


def _predict_step(detector: Detector, conf_thres: float, mesh=None, **kw):
    """``images -> PredictOutput`` closure. With a ``mesh``, every batch is
    DP-sharded via ``Detector.predict_sharded`` (weights replicated once,
    batch over the ("dcn","data") axes) — the reference parallelizes its eval
    sweeps by launching one process per GPU (replicate/benchmarks_v8.sh);
    here ONE process drives all chips with the same SPMD executable.
    Extra ``kw`` (iou_thres, max_det, pre_nms_k) reach the jitted step.

    NMS IoU defaults to 0.7: the reference's pipeline calls model.predict
    without an ``iou`` override, so it inherits the ultralytics default
    (cfg/default.yaml:57) — NOT CUSTOM_HYP.IOU_THRESHOLD, which is the
    pred-to-GT *matching* threshold (ood_utils.py:184)."""
    kw.setdefault("iou_thres", 0.7)
    if mesh is None:
        fn = detector.predict_fn(conf_thres=conf_thres, **kw)
        return lambda images: fn(detector.variables, images)
    return lambda images: detector.predict_sharded(images, mesh,
                                                   conf_thres=conf_thres, **kw)


def _leaf_methods(method) -> List[object]:
    if isinstance(method, FusionOODMethod):
        out = []
        for m in method.methods:
            out.extend(_leaf_methods(m))
        return out
    return [method]


def assign_fitted_state(method, thresholds=None, clusters=None) -> List[object]:
    """Restore pickled fit artifacts (the per-leaf lists configure_ind writes)
    onto a freshly built method tree, in factory order. ``None`` entries keep
    the leaf's current state; distance leaves get their lazy centroid bank
    invalidated. Returns the leaf list. Shared by cli.ood_eval's load_*
    cache branches and cli.predict's artifact reload."""
    leaves = _leaf_methods(method)
    if clusters is not None:
        assert len(clusters) == len(leaves), \
            f"{len(clusters)} cluster entries for {len(leaves)} method leaves"
        for m, cl in zip(leaves, clusters):
            if isinstance(m, DistanceOODMethod) and cl is not None:
                m.clusters = cl
                m._bank = None
    if thresholds is not None:
        assert len(thresholds) == len(leaves), \
            f"{len(thresholds)} threshold entries for {len(leaves)} method leaves"
        for m, t in zip(leaves, thresholds):
            if t is not None:
                m.thresholds = t
    return leaves


def extract_ind_activations(
    detector: Detector,
    batches,
    method,
    conf_thr_train: float = 0.15,
    iou_thr_matching: Optional[float] = None,
    mesh=None,
) -> Dict[int, object]:
    """-> {id(leaf_method): activations} for every leaf method in one pass.

    Logits leaves get ``[per-class (N, nc) logits]``; distance leaves get
    ``[class][stride] -> (N, C_stride)`` RoI features.
    """
    iou_thr = CUSTOM_HYP.IOU_THRESHOLD if iou_thr_matching is None else iou_thr_matching
    nc = detector.nc
    neck_ch = detector.neck_channels()
    leaves = _leaf_methods(method)
    acc: Dict[int, object] = {}
    for m in leaves:
        if isinstance(m, LogitsOODMethod):
            acc[id(m)] = [[] for _ in range(nc)]
        else:
            acc[id(m)] = [[[] for _ in range(3)] for _ in range(nc)]

    step = _predict_step(detector, conf_thr_train, mesh)
    img_w = detector.img_size
    for batch in batches:
        out: PredictOutput = step(batch["images"])
        boxes = _np(out.det.boxes)
        cls = _np(out.det.cls)
        valid = _np(out.det.valid)
        logits = _np(out.logits)
        level = _np(out.stride_level)
        roi = _np(out.roi_feats)
        exact = _np(out.exact_feats)
        bmask = batch.get("batch_mask", np.ones(len(boxes), bool))
        # lazily computed per-image all-stride RoI features for target/
        # all-stride options (reference extract_all_strides=True,
        # predict.py:52-60)
        neck = None
        for i in range(len(boxes)):
            if not bmask[i]:
                continue
            n = int(valid[i].sum())
            tgt_m = batch["gt_mask"][i]
            tgt_b = batch["gt_bboxes"][i][tgt_m]
            tgt_c = batch["gt_labels"][i][tgt_m]
            matched = []
            if n > 0:
                matched = match_predictions_to_targets(
                    boxes[i, :n], cls[i, :n].astype(np.float64),
                    tgt_b, tgt_c.astype(np.float64), iou_thr)
            for m in leaves:
                if isinstance(m, LogitsOODMethod):
                    for j in matched:
                        acc[id(m)][int(cls[i, j])].append(logits[i, j])
                    continue
                opt = m.ind_info_creation_option
                exact_pos = m.which_internal_activations == "ftmaps_and_strides_exact_pos"
                if opt in ("valid_preds_one_stride", "all_preds_all_strides",
                           "valid_preds_all_strides"):
                    idxs = matched if opt != "all_preds_all_strides" else range(n)
                    for j in idxs:
                        c = int(cls[i, j])
                        if opt == "valid_preds_one_stride":
                            s = int(level[i, j])
                            feat = (exact if exact_pos else roi)[i, j, : neck_ch[s]]
                            acc[id(m)][c][s].append(feat)
                        else:  # all strides of this box
                            if neck is None:
                                neck = [_np(f) for f in _all_stride_roi(
                                    out, boxes, valid, img_w)]
                            for s in range(3):
                                acc[id(m)][c][s].append(neck[s][i, j, : neck_ch[s]])
                elif opt in ("all_targets_one_stride", "all_targets_all_strides"):
                    if len(tgt_b) == 0:
                        continue
                    tgt_roi = _target_roi_feats(out, tgt_b, img_w, image_index=i)
                    for t in range(len(tgt_b)):
                        c = int(tgt_c[t])
                        if not 0 <= c < nc:
                            continue  # unknown-class GT on an unfiltered set
                        if opt == "all_targets_all_strides":
                            for s in range(3):
                                acc[id(m)][c][s].append(tgt_roi[s][t])
                        else:
                            s = _size_to_level(tgt_b[t], img_w)
                            acc[id(m)][c][s].append(tgt_roi[s][t])
                else:
                    raise ValueError(f"unknown ind_info_creation_option {opt}")

    for m in leaves:
        a = acc[id(m)]
        if isinstance(m, LogitsOODMethod):
            acc[id(m)] = [np.stack(x) if x else np.empty((0, nc), np.float32) for x in a]
        else:
            acc[id(m)] = [
                [np.stack(x) if x else np.empty(0, np.float32) for x in row] for row in a
            ]
    return acc


def _size_to_level(box_xyxy: np.ndarray, img_w: int) -> int:
    """FPN-style stride selection by box size for target-based extraction
    ('all_targets_one_stride', reference constants.py:37 "selected using the
    bbox size"): small boxes -> P3, medium -> P4, large -> P5."""
    side = float(np.sqrt(max(box_xyxy[2] - box_xyxy[0], 0) *
                         max(box_xyxy[3] - box_xyxy[1], 0)))
    if side < img_w / 8:
        return 0
    if side < img_w / 4:
        return 1
    return 2


def _all_stride_roi(out: PredictOutput, boxes, valid, img_w):
    """3 x (B, N, C_s) RoI features of every detected box at every stride
    (reference extract_all_strides=True, predict.py:52-60).

    Uses the same adaptive batched RoIAlign as the engine's roi_feats
    (samples=0, closed-form exact for every span — every box hits the
    stride-8 map here, where large boxes span 40-80 cells), so fit-time
    features match the eval-time features the distance thresholds are
    applied to AND torchvision's exact ceil(span) grid (advisor r2 #2;
    exactness asserted in test_reference_pipeline_parity)."""
    from ..ops.roi_align import roi_align_1x1_batched_level

    feats = []
    bx = out.det.boxes
    for lvl, fmap in enumerate(out.neck):
        scale = fmap.shape[2] / img_w
        feats.append(roi_align_1x1_batched_level(fmap, bx, scale, samples=0))
    return feats


def _target_roi_feats(out: PredictOutput, tgt_boxes_xyxy: np.ndarray, img_w,
                      image_index: Optional[int] = None):
    """3 x (M, C_s) RoI features of ground-truth boxes on one image
    (target-based InD options, reference ood_utils.py:1655-1720). Adaptive
    sampling, matching the engine's eval-time RoI features."""
    from ..ops.roi_align import roi_align_1x1_batched_level

    i = image_index if image_index is not None else 0
    b = jnp.asarray(tgt_boxes_xyxy, jnp.float32)
    outs = []
    for fmap in out.neck:
        scale = fmap.shape[2] / img_w
        outs.append(np.asarray(
            roi_align_1x1_batched_level(fmap[i][None], b[None], scale,
                                         samples=0)[0]))
    return outs


def fit_ind_pipeline(method, activations: Dict[int, object], tpr: float = 0.95,
                     logger=None) -> None:
    """Clusters (distance) -> InD scores -> thresholds for every leaf method
    (reference ood_evaluation.py:398-644)."""
    for m in _leaf_methods(method):
        acts = activations[id(m)]
        if isinstance(m, DistanceOODMethod):
            m.generate_clusters(acts)
        scores = m.compute_scores_from_activations(acts)
        m.generate_thresholds(scores, tpr)
        if isinstance(m, DistanceOODMethod) and CUSTOM_HYP.unk.rank.USE_UNK_PROPOSALS_THR:
            m.generate_unk_prop_thr(acts, tpr, CUSTOM_HYP.unk.rank.RANK_BOXES_OPERATION)


def _decisions_for_method(method, out: PredictOutput, neck_ch,
                          want_scores: bool = False, raw: bool = False):
    """(B, max_det) per-box array for one (possibly fused) method from a
    single PredictOutput.

    - default: boolean OoD decision (needs fitted thresholds)
    - want_scores: threshold-relative INDness in [-1, 1] (needs thresholds
      AND min/max score state; reference compute_indness ood_utils.py:1224)
    - raw: threshold-free raw score, higher = more InD (logits methods: their
      score; distance methods: negated min centroid distance) — usable before
      fit_ind_pipeline, e.g. for AUROC collection.
    """
    det = out.det
    if isinstance(method, FusionOODMethod):
        if raw:
            raise ValueError("raw scores are per-member; fuse INDness instead "
                             "(fit the pipeline and use want_scores=True)")
        if want_scores:
            # continuous score for AUROC collection: member INDness combined
            # with the strategy's continuous analogue, matching
            # fuse_decisions' conventions (and -> max, or -> min over InD
            # decisions; score -> the summed INDness its >0 test binarizes;
            # vote -> mean); the boolean fuse would degenerate to {0,1}
            # "scores"
            member = [_decisions_for_method(m, out, neck_ch, True)
                      for m in method.methods]
            stacked = jnp.stack(member)
            if method.strategy == "and":
                return jnp.max(stacked, axis=0)
            if method.strategy == "or":
                return jnp.min(stacked, axis=0)
            if method.strategy == "score":
                return jnp.sum(stacked, axis=0)
            return jnp.mean(stacked, axis=0)  # vote
        want_member_scores = method.strategy == "score"
        member = [
            _decisions_for_method(m, out, neck_ch, want_member_scores)
            for m in method.methods
        ]
        return method.fuse(member)
    if isinstance(method, LogitsOODMethod):
        if raw:
            return method.raw_scores(out.logits, det.cls)
        fn = method.indness if want_scores else method.decide
        return fn(out.logits, det.cls, det.valid)
    assert isinstance(method, DistanceOODMethod)
    base_feats = (out.exact_feats
                  if method.which_internal_activations == "ftmaps_and_strides_exact_pos"
                  else out.roi_feats)
    cmax = base_feats.shape[-1]
    # per-box features: zero out channels beyond the box's stride channel count
    from .scores import table_lookup

    ch = table_lookup(jnp.asarray(neck_ch), out.stride_level)  # (B, N)
    chmask = jnp.arange(cmax)[None, None, :] < ch[..., None]
    feats = jnp.where(chmask, base_feats, 0.0)
    flat = l2_normalize_rows(feats.reshape(-1, cmax))
    level_flat = out.stride_level.reshape(-1)
    sdr_active = (getattr(method, "sdr_state", None) is not None
                  and method.sdr_state["embedders"] is not None
                  and any(e is not None for e in method.sdr_state["embedders"]))
    if sdr_active:
        # SDR variants: apply the per-stride JAX embedder on device, then
        # route each box to its stride's embedding (all strides share out_dim)
        from .sdr import _mlp_apply

        embs = method.sdr_state["embedders"]
        out_dim = next(e.out_dim for e in embs if e is not None)
        zs = []
        for s in range(3):
            if embs[s] is None:
                zs.append(jnp.zeros((flat.shape[0], out_dim), flat.dtype))
            else:
                f_s = l2_normalize_rows(flat[:, : embs[s].in_dim])
                zs.append(_mlp_apply(embs[s].params, f_s))
        flat = jnp.stack(zs, 0)[level_flat, jnp.arange(flat.shape[0])]
    dist = method.distances(flat, det.cls.reshape(-1), level_flat)
    dist = dist.reshape(det.cls.shape)
    if raw:
        return -dist  # higher = more InD
    fn = (method.indness_from_distances if want_scores else method.decide_from_distances)
    return fn(dist, det.cls, out.stride_level, det.valid)


def evaluate_method(
    detector: Detector,
    batches,
    method,
    known_classes: Sequence[int],
    class_names: Sequence[str],
    conf_thr_test: float = 0.15,
    enhanced_unk_localization: bool = False,
    logger=None,
    visualize_dir: Optional[str] = None,
    visualize_batches: int = 2,
    mesh=None,
    overlap: bool = True,
) -> Dict[str, float]:
    """Full metric loop (reference ood_utils.py:428-582). With
    ``visualize_dir``, the first batches are rendered with OoD verdicts
    (reference iterate_data_to_plot_with_ood_labels, ood_utils.py:349-427).
    ``overlap=False`` disables the one-deep launch/consume pipeline (serial
    per-batch execution) — measurement control for PERF.md.

    HBM note (ADVICE r4): ``overlap=True`` keeps TWO PredictOutputs —
    including all three neck maps — live on device at once, roughly
    doubling the eval loop's activation watermark. At v8n@640 that is
    ~0.5 GB extra (fine on a 16 GB chip); at flagship scales near the
    documented batch ceiling (PERF.md flagship sweep), drop the batch size
    one notch or pass ``overlap=False`` if the allocator reports pressure.
    """
    logger = logger or log
    neck_ch = detector.neck_channels()
    step = _predict_step(detector, conf_thr_test, mesh)
    all_preds, all_targets = [], []
    known_arr = np.asarray(list(known_classes))

    # benchmark mode: per-batch prediction cache on disk, so sweeps that only
    # change post-prediction knobs skip the forward entirely (reference
    # ood_utils.py:450-482 BENCHMARK_MODE temp storage). Only the post-NMS
    # per-box tensors are persisted (+ the stride-8 neck map when EUL needs
    # it) — mirroring the reference's Results-level cache (ood_utils.py:
    # 475-482); the full PredictOutput would be hundreds of MB per batch at
    # 640 px (three neck maps), unusable for the real sweeps (VERDICT r2 #3).
    cache_dir = None
    if CUSTOM_HYP.BENCHMARK_MODE:
        from ..constants import TEMPORAL_STORAGE_PATH

        cache_dir = TEMPORAL_STORAGE_PATH
        cache_dir.mkdir(parents=True, exist_ok=True)
        # key = per-process nonce + dataset tag + test conf, mirroring the
        # reference's f"{NOW}_{dataset_name}_{idx}" (ood_utils.py:477): the
        # nonce keeps re-runs with different checkpoints from reusing stale
        # entries while letting combos WITHIN one sweep process hit; the tag
        # (set to ds.yaml_name by cli/ood_eval.run_eval) keeps multiple
        # --ood_datasets from colliding (ADVICE r4 high).
        cache_tag = (f"{_CACHE_NONCE}_{getattr(batches, 'tag', 'ds')}"
                     f"_conf{conf_thr_test}"
                     + ("_eul" if enhanced_unk_localization else ""))

    def _predict(batch_idx, images):
        if cache_dir is not None:
            import pickle

            p = cache_dir / f"{cache_tag}_{batch_idx}.pkl"
            if p.exists():
                return PredictOutput(*pickle.loads(p.read_bytes()))
            out = step(images)
            slim = PredictOutput(
                out.det, out.logits, out.stride_level, out.anchor_idx,
                out.roi_feats, out.exact_feats,
                (out.neck[0],) if enhanced_unk_localization else ())
            p.write_bytes(pickle.dumps(jax.tree.map(np.asarray, tuple(slim))))
            return out
        return step(images)

    if enhanced_unk_localization:
        dmethods = [m for m in _leaf_methods(method) if isinstance(m, DistanceOODMethod)]
        assert dmethods, "EUL requires a distance method (needs clusters)"
        dm = dmethods[0]
        # device proposal ranking (one small fixed-shape dispatch per image
        # against the P3 map already in HBM) — the host then never fetches a
        # feature map, the EUL loop's dominant wire cost (PERF.md r5 EUL
        # post-mortem). None => host-NumPy rank fn on a fetched P3 (custom
        # transform_fn, no stride-0 clusters, or dim mismatch).
        rank_bank = _stride0_rank_bank(dm, neck_ch[0])

    def _launch(batch_idx, batch):
        """Device dispatch only — nothing here blocks on device results
        (jax dispatch is async), so launching batch i+1 before consuming
        batch i overlaps its forward/decide/EUL-front-end with batch i's
        host CC/postprocess (VERDICT r3 #6; the reference runs everything
        serially on the host, ood_utils.py:641-932)."""
        out: PredictOutput = _predict(batch_idx, batch["images"])
        decisions_dev = _decisions_for_method(method, out, neck_ch,
                                              want_scores=False)
        # batched device saliency+thresholds (one jitted call per batch);
        # None when the configured methods only have host implementations
        eul_disp = (eul_frontend_dispatch(out.p3, batch["ratio_pad"])
                    if enhanced_unk_localization else None)
        return batch_idx, batch, out, decisions_dev, eul_disp

    def _consume(launched):
        batch_idx, batch, out, decisions_dev, eul_disp = launched
        decisions = _np(decisions_dev)
        if visualize_dir and batch_idx < visualize_batches:
            from ..utils.visualization import plot_batch_results

            plot_batch_results(batch, type("O", (), {"det": out.det})(),
                               decisions, list(class_names), visualize_dir,
                               prefix=f"b{batch_idx}_")
        boxes = _np(out.det.boxes)
        confs = _np(out.det.conf)
        cls = _np(out.det.cls)
        valid = _np(out.det.valid)
        eul_fe = eul_frontend_finish(eul_disp) if eul_disp is not None else None
        # Fetch P3 to the host ONLY when something there still needs its
        # DATA: the host summarizer/thresholder (no device front-end) or the
        # host rank fn (no device bank). With both device paths available
        # the ~50 MB/batch map never crosses the wire — through a slow link
        # that fetch dwarfs everything else in the loop (PERF.md r5 EUL
        # post-mortem; the reference hands the full map to the host
        # unconditionally, ood_utils.py:641-898).
        p3 = None
        p3_dev = None
        eul_batch = None
        if enhanced_unk_localization:
            rank_needed = (CUSTOM_HYP.unk.RANK_BOXES
                           and CUSTOM_HYP.unk.USE_HEURISTICS)
            # device rank only when the map is ALREADY device-resident
            # (slim-cache batches hold a host np map — ranking those on
            # device would add a 50 MB H2D upload instead of removing one)
            use_dev_rank = (eul_fe is not None and rank_bank is not None
                            and rank_needed and isinstance(out.p3, jax.Array))
            if eul_fe is None or (rank_needed and not use_dev_rank):
                p3 = _np(out.p3)
            cls_thr = None
            if (CUSTOM_HYP.unk.rank.USE_OOD_THR_TO_REMOVE_PROPS
                    and dm.thresholds is not None):
                from .thresholds import pack_thresholds_per_class_per_stride

                cls_thr = np.nan_to_num(np.asarray(
                    pack_thresholds_per_class_per_stride(dm.thresholds)
                )[:, 0], nan=np.inf)  # stride 0; unfit class = no gate
            if use_dev_rank:
                # host CC for every image FIRST, then ONE batched device
                # rank dispatch for the whole batch (two small transfers
                # per batch instead of two per image — the tunnel/PCIe
                # round-trip latency, not the arithmetic, is the cost)
                bmask0 = batch.get("batch_mask", np.ones(len(boxes), bool))
                pred_by_img = {
                    i: boxes[i, : int(valid[i].sum())].astype(np.float64)
                    for i in range(len(boxes)) if bmask0[i]}
                eul_batch = _eul_proposals_batch(
                    dm, rank_bank, out.p3, tuple(out.p3.shape[1:3]),
                    eul_fe, batch["ratio_pad"], pred_by_img, cls_thr)
        bmask = batch.get("batch_mask", np.ones(len(boxes), bool))
        for i in range(len(boxes)):
            if not bmask[i]:
                continue
            n = int(valid[i].sum())
            b = boxes[i, :n].astype(np.float64)
            c = cls[i, :n].astype(np.float64)
            f = confs[i, :n].astype(np.float64)
            dec = decisions[i, :n]
            c = np.where(dec == 0, float(UNKNOWN_CLASS_INDEX), c)

            if enhanced_unk_localization:
                if eul_batch is not None:
                    props, _, ranks = eul_batch[i]
                else:
                    props, _, ranks = unknown_proposals_for_image(
                        p3[i] if p3 is not None else None,
                        batch["ratio_pad"][i], b,
                        rank_score_fn=(_make_rank_fn(dm, p3[i])
                                       if p3 is not None else None),
                        unk_prop_thr=getattr(dm, "unk_prop_thr", None),
                        class_thresholds=cls_thr,
                        precomputed=eul_fe[i] if eul_fe is not None else None,
                        padded_hw=tuple(out.p3.shape[1:3]),
                    )
                if len(props):
                    b = np.concatenate([b, props.astype(np.float64)])
                    c = np.concatenate([c, np.full(len(props), float(UNKNOWN_CLASS_INDEX))])
                    f = np.concatenate([f, np.full(len(props), UNK_PROPOSAL_CONF)])

            all_preds.append(dict(img_name=batch["im_names"][i], bboxes=b, cls=c, conf=f))
            tgt_m = batch["gt_mask"][i]
            tcls = batch["gt_labels"][i][tgt_m].astype(np.float64)
            tcls = np.where(np.isin(tcls, known_arr), tcls, float(UNKNOWN_CLASS_INDEX))
            all_targets.append(dict(
                img_name=batch["im_names"][i],
                bboxes=batch["gt_bboxes"][i][tgt_m].astype(np.float64),
                cls=tcls,
            ))

    # one-deep software pipeline: batch i+1's device work is in flight while
    # batch i's host postprocess runs (mirror of parallel.prefetch_to_device)
    pending = None
    for batch_idx, batch in enumerate(batches):
        if not overlap:
            _consume(_launch(batch_idx, batch))
            continue
        launched = _launch(batch_idx, batch)
        if pending is not None:
            _consume(pending)
        pending = launched
    if pending is not None:
        _consume(pending)

    return compute_metrics(all_preds, all_targets, list(class_names),
                           list(known_classes), logger)


def _rank_from_matrix(mat: np.ndarray, row_cls: np.ndarray):
    """Shared tail of the host/device rank fns: reduce the (n_valid_classes,
    n_props) min-distance matrix per the configured rank op (reference
    ood_utils.py:1056-1092)."""
    from .unknown import rank_distances

    op = CUSTOM_HYP.unk.rank.RANK_BOXES_OPERATION
    if op == "min" and CUSTOM_HYP.unk.rank.USE_OOD_THR_TO_REMOVE_PROPS:
        # 'min' with the per-closest-class gate: raw min distance (no
        # x100 compensation) + the closest class id
        # (reference ood_utils.py:1064-1070)
        closest = np.asarray(row_cls)[mat.argmin(axis=0)]
        return mat.min(axis=0), closest
    return rank_distances(mat, op)


def _make_rank_fn(dm: DistanceOODMethod, p3_img: np.ndarray):
    """Rank proposals by reduced distance to all class centroids at stride 0
    (reference ood_utils.py:1036-1092). Proposals arrive in padded-ftmap
    coordinates; roi-align them 1x1 against the padded stride-8 map.

    HOST (NumPy) variant, for feature maps already on the host (offline
    extraction, caches, transform_fn methods): a handful of 1x1 bilinear
    taps is microseconds in NumPy. The eval loop prefers the device variant
    (``_make_rank_fn_device``) so the neck map never crosses the wire
    (PERF.md r5 EUL post-mortem)."""
    from ..ops.roi_align import roi_align_1x1_single_level_np
    from .distance import l2_normalize_rows_np, pairwise_distance_np

    p3_host = np.asarray(p3_img, np.float32)

    def fn(props_ftmap: np.ndarray) -> np.ndarray:
        feats = roi_align_1x1_single_level_np(
            p3_host, np.asarray(props_ftmap, np.float32), 1.0)
        rows, row_cls = [], []
        for c in range(len(dm.clusters)):
            cl = dm.clusters[c][0]
            if isinstance(cl, np.ndarray) and cl.ndim == 2 and cl.size:
                if dm.transform_fn is not None:
                    tf = np.asarray(dm.transform(feats, c, 0))
                else:
                    tf = l2_normalize_rows_np(
                        feats.reshape(len(feats), -1))
                d = pairwise_distance_np(
                    np.asarray(cl, np.float32), tf, dm.metric)
                rows.append(d.min(axis=0))
                row_cls.append(c)
        if not rows:
            return np.zeros(len(props_ftmap), np.float32)
        return _rank_from_matrix(np.stack(rows), np.asarray(row_cls))

    return fn


@partial(jax.jit, static_argnames=("metric",))
def _rank_matrix_device_batched(p3_batch, props, cents0, cnt0, *, metric):
    """(B, cap, nc) min-distances for a WHOLE batch of padded proposals in
    one dispatch — the eval loop's EUL rank path: two tunnel/PCIe round
    trips per BATCH (props up, matrix down) instead of two per image.
    vmap of the single-image math; rows beyond each image's real proposal
    count are garbage the host slices off."""
    from ..ops.roi_align import roi_align_1x1_single_level
    from .distance import (CentroidBank,
                           distances_to_all_class_centroids_stride0,
                           l2_normalize_rows)

    bank = CentroidBank(cents0, cnt0)

    def one(p3_img, pr):
        feats = roi_align_1x1_single_level(p3_img, pr, 1.0)
        tf = l2_normalize_rows(feats.reshape(feats.shape[0], -1))
        return distances_to_all_class_centroids_stride0(tf, bank, metric)

    return jax.vmap(one)(p3_batch, props)


# rank ops with a device-side reduction (same formulas as rank_distances /
# _rank_from_matrix; geometric_mean = exp(mean(log)), entropy = scipy's
# normalize-then-Shannon with 0*log0 := 0)
_DEVICE_RANK_OPS = ("min", "mean", "max", "sum", "geometric_mean", "entropy")


@partial(jax.jit, static_argnames=("metric", "op", "gated"))
def _rank_reduce_device_batched(p3_batch, props, cents0, cnt0, rows, *,
                                metric, op, gated):
    """Device-reduced EUL rank for a whole batch: the (B, cap, nc) distance
    matrix never leaves HBM — only the (B, cap) rank scores (plus closest
    class ids on the gated-'min' path) cross the wire. At batch 32 that is
    a 10 MB -> 0.3 MB D2H cut; through a slow host link the matrix fetch
    was the EUL loop's second-largest wire cost (PERF.md r5 EUL e2e
    post-mortem). Reductions mirror ``_rank_from_matrix`` exactly:
    reference ood_utils.py:1056-1092."""
    mats = _rank_matrix_device_batched.__wrapped__(
        p3_batch, props, cents0, cnt0, metric=metric)  # (B, cap, nc)
    sub = mats[:, :, rows]  # (B, cap, n_valid_classes)
    if gated and op == "min":
        # raw min distance (no x100) + closest valid-class id
        # (reference ood_utils.py:1064-1070)
        return sub.min(-1), rows[sub.argmin(-1)]
    if op == "min":
        return sub.min(-1) * 100  # reference compensation (:1078)
    if op == "mean":
        return sub.mean(-1)
    if op == "max":
        return sub.max(-1)
    if op == "sum":
        return sub.sum(-1)
    if op == "geometric_mean":
        return jnp.exp(jnp.mean(jnp.log(sub), -1))
    if op == "entropy":
        p = sub / sub.sum(-1, keepdims=True)
        return -jnp.where(p > 0, p * jnp.log(p), 0.0).sum(-1)
    raise NotImplementedError(op)


@partial(jax.jit, static_argnames=("metric",))
def _rank_matrix_device(p3_batch, img_idx, props, cents0, cnt0, *, metric):
    """(cap, nc) min-distance of each padded proposal's 1x1 RoI feature to
    every class's stride-0 centroids — the device half of the EUL rank fn.
    Same formulas as the host path (roi_align_1x1 + flatten/L2-normalize +
    pairwise distance + min over centroids); inf where a class has no
    stride-0 cluster."""
    from ..ops.roi_align import roi_align_1x1_single_level
    from .distance import (CentroidBank,
                           distances_to_all_class_centroids_stride0,
                           l2_normalize_rows)

    feats = roi_align_1x1_single_level(p3_batch[img_idx], props, 1.0)
    tf = l2_normalize_rows(feats.reshape(feats.shape[0], -1))
    bank = CentroidBank(cents0, cnt0)
    return distances_to_all_class_centroids_stride0(tf, bank, metric)


def _stride0_rank_bank(dm: DistanceOODMethod, p3_channels: int):
    """Padded stride-0 centroid bank + valid-class ids for the device rank
    fn, or None when the method's stride-0 clusters can't feed it (no valid
    clusters, a custom transform_fn, or a feature dim that isn't the raw P3
    channel count)."""
    from .distance import PAIRWISE_METRICS, build_centroid_bank

    if dm.transform_fn is not None or dm.metric not in PAIRWISE_METRICS:
        return None
    rows = [c for c in range(len(dm.clusters))
            if isinstance(dm.clusters[c][0], np.ndarray)
            and dm.clusters[c][0].ndim == 2 and dm.clusters[c][0].size]
    if not rows:
        return None
    d0 = dm.clusters[rows[0]][0].shape[1]
    if d0 != p3_channels or any(dm.clusters[c][0].shape[1] != d0 for c in rows):
        return None
    bank = build_centroid_bank([[dm.clusters[c][0]] for c in range(len(dm.clusters))],
                               d0, num_strides=1)
    return bank, np.asarray(rows)


_RANK_PAD_BUCKETS = (16, 64, 256, 1024)


def _make_rank_fn_device(dm: DistanceOODMethod, p3_batch_dev, img_idx: int,
                         bank_rows):
    """DEVICE variant of ``_make_rank_fn``: ranks proposals against the neck
    map that is ALREADY in device HBM, so the eval loop never fetches a
    feature map to the host (at 640 px that fetch is 1.6 MB/image — the
    dominant wire cost of the EUL loop; r4's e2e bench timed out on exactly
    that D2H, PERF.md r5 EUL post-mortem). One fixed-shape jitted call per
    image: proposals are padded to a small bucket (compile once per bucket),
    the (cap, nc) distance matrix comes back (a few KB), and the rank-op
    reduction runs on the host exactly like the NumPy path."""
    bank, row_cls = bank_rows

    def fn(props_ftmap: np.ndarray):
        n = len(props_ftmap)
        if n == 0:
            return np.zeros(0, np.float32)
        mats = []
        cap_max = _RANK_PAD_BUCKETS[-1]
        for start in range(0, n, cap_max):
            chunk = np.asarray(props_ftmap[start:start + cap_max], np.float32)
            m = len(chunk)
            cap = next(b for b in _RANK_PAD_BUCKETS if b >= m)
            padded = np.zeros((cap, 4), np.float32)
            padded[:m] = chunk
            mat = np.asarray(_rank_matrix_device(
                p3_batch_dev, jnp.int32(img_idx), jnp.asarray(padded),
                bank.centroids, bank.count, metric=dm.metric),
                np.float32)[:m]
            mats.append(mat)
        mat = np.concatenate(mats).T[row_cls]  # (n_valid_classes, n)
        return _rank_from_matrix(mat, row_cls)

    return fn


def _eul_proposals_batch(dm, rank_bank, p3_dev, padded_hw, eul_fe,
                         ratio_pads, pred_boxes_by_img, cls_thr):
    """Batch-level EUL with device ranking: host CC candidates for every
    image, ONE batched rank dispatch against the device-resident P3, then
    per-image selection. Returns {img_idx: (props_img, decisions, ranks)} —
    identical per image to ``unknown_proposals_for_image`` with the
    per-image device rank fn, but with two small transfers per BATCH instead
    of two per image (PERF.md r5 EUL post-mortem: round-trip latency, not
    arithmetic, dominates the loop's tail)."""
    from .unknown import finish_unknown_proposals, unknown_candidates_for_image

    bank, row_cls = rank_bank
    cand = {
        i: unknown_candidates_for_image(None, ratio_pads[i], pb,
                                        precomputed=eul_fe[i],
                                        padded_hw=padded_hw)
        for i, pb in pred_boxes_by_img.items()}
    nmax = max((len(c) for c in cand.values()), default=0)
    rank_results = {}
    if nmax > 0:
        if nmax <= _RANK_PAD_BUCKETS[-1]:
            cap = next(b for b in _RANK_PAD_BUCKETS if b >= nmax)
            props_pad = np.zeros((p3_dev.shape[0], cap, 4), np.float32)
            for i, c in cand.items():
                props_pad[i, : len(c)] = c
            op = CUSTOM_HYP.unk.rank.RANK_BOXES_OPERATION
            gated = bool(CUSTOM_HYP.unk.rank.USE_OOD_THR_TO_REMOVE_PROPS)
            if op in _DEVICE_RANK_OPS:
                # reduce ON DEVICE: only (B, cap) scores come back, not the
                # (B, cap, nc) matrix (~30x less D2H at nc=80)
                red = _rank_reduce_device_batched(
                    p3_dev, jnp.asarray(props_pad), bank.centroids,
                    bank.count, jnp.asarray(row_cls), metric=dm.metric,
                    op=op, gated=gated)
                if gated and op == "min":
                    scores, closest = (np.asarray(red[0], np.float32),
                                       np.asarray(red[1]))
                    for i, c in cand.items():
                        if len(c):
                            rank_results[i] = (scores[i, : len(c)],
                                               closest[i, : len(c)])
                else:
                    scores = np.asarray(red, np.float32)
                    for i, c in cand.items():
                        if len(c):
                            rank_results[i] = scores[i, : len(c)]
            else:
                mats = np.asarray(_rank_matrix_device_batched(
                    p3_dev, jnp.asarray(props_pad), bank.centroids,
                    bank.count, metric=dm.metric), np.float32)
                for i, c in cand.items():
                    if len(c):
                        rank_results[i] = _rank_from_matrix(
                            mats[i, : len(c)].T[row_cls], row_cls)
        else:
            # a >1024-candidate image in the batch: per-image chunked calls
            for i, c in cand.items():
                if len(c):
                    rank_results[i] = _make_rank_fn_device(
                        dm, p3_dev, i, rank_bank)(c)
    return {
        i: finish_unknown_proposals(
            c, rank_results.get(i),
            unk_prop_thr=getattr(dm, "unk_prop_thr", None),
            class_thresholds=cls_thr)
        for i, c in cand.items()}


def collect_fusion_member_indness(
    detector: Detector,
    batches,
    fusion,
    conf_thr_test: float = 0.15,
    mesh=None,
) -> Dict[str, np.ndarray]:
    """Per-box INDness of every fusion member + the fused decision, for the
    score-fusion analysis figure (reference score_fusion_plot.ipynb: member
    scores against each other with the decision boundary). Requires a fitted
    FusionOODMethod. Returns {'member_names', 'indness' (M, N), 'decision'
    (N,), 'cls' (N,), 'conf' (N,)} over all valid boxes."""
    assert isinstance(fusion, FusionOODMethod), "needs a fusion method"
    neck_ch = detector.neck_channels()
    step = _predict_step(detector, conf_thr_test, mesh)
    per_member: List[List[np.ndarray]] = [[] for _ in fusion.methods]
    dec_all, cls_all, conf_all = [], [], []
    for batch in batches:
        out: PredictOutput = step(batch["images"])
        member = [_np(_decisions_for_method(m, out, neck_ch, want_scores=True))
                  for m in fusion.methods]
        fused = _np(_decisions_for_method(fusion, out, neck_ch))
        valid = _np(out.det.valid)
        bmask = batch.get("batch_mask", np.ones(len(valid), bool))
        keep = valid & bmask[:, None]
        for mi, arr in enumerate(member):
            per_member[mi].append(arr[keep])
        dec_all.append(fused[keep])
        cls_all.append(_np(out.det.cls)[keep])
        conf_all.append(_np(out.det.conf)[keep])
    return {
        "member_names": np.asarray([m.name for m in fusion.methods]),
        "indness": np.stack([np.concatenate(x) for x in per_member]),
        "decision": np.concatenate(dec_all),
        "cls": np.concatenate(cls_all),
        "conf": np.concatenate(conf_all),
    }

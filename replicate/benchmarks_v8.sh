#!/usr/bin/env bash
# Paper benchmark sweeps for YOLOv8l OWOD-t1 (reference replicate/benchmarks_v8.sh).
# Datasets: set DATA_DIR to a folder holding owod.yaml / coco_ood.yaml /
# coco_mixed.yaml with the layouts described in the dataset YAML docstrings.
set -euo pipefail
DATA_DIR=${DATA_DIR:-datasets}
CKPT=${CKPT:-runs/owod_t1_yolov8l}
COMMON=(--model l --model_version yolov8 --model_path "$CKPT"
        --ind_dataset "$DATA_DIR/owod.yaml" --owod_task_ind t1
        --ood_datasets "$DATA_DIR/coco_ood.yaml" "$DATA_DIR/coco_mixed.yaml"
        --conf_thr_train 0.15 --tpr_thr 0.95 --which_split train_val)

run() { python -m ood_in_object_detection_tpu.cli.ood_eval "$@"; }

# logits methods sweep at the paper's test threshold
run "${COMMON[@]}" --ood_method MSP    --conf_thr_test 0.45 --benchmark logits_methods --name v8_logits
# feature-map method + cluster sweep
run "${COMMON[@]}" --ood_method Cosine_cl_stride --conf_thr_test 0.50 --benchmark cluster_methods --name v8_fmap_clusters
# fusion strategies
run "${COMMON[@]}" --ood_method fusion-MSP-Energy --conf_thr_test 0.45 --benchmark fusion_strategies --name v8_fusion
# test-threshold sweep
run "${COMMON[@]}" --ood_method MSP --benchmark conf_thr_test --name v8_conf_test
# EUL (unknown localization) grid
run "${COMMON[@]}" --ood_method L1_cl_stride --conf_thr_test 0.45 \
    --enhanced_unk_localization --benchmark unk_loc_enhancement --name v8_eul

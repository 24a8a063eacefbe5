#!/usr/bin/env bash
# Shared sweep blocks for the per-version paper benchmarks
# (reference replicate/benchmarks_v{8,9,10,11,12}.sh all run the same RQ
# blocks per model: distance methods x cluster strategies, SDR variants,
# logits methods, fusion combos, EUL grid — only the checkpoint differs).
# Source this from benchmarks_v*.sh after setting MODEL_VERSION/MODEL_SIZE.
set -euo pipefail

DATA_DIR=${DATA_DIR:-datasets}
CKPT=${CKPT:-runs/owod_t1_${MODEL_VERSION}${MODEL_SIZE}}
TAG=${TAG:-${MODEL_VERSION}${MODEL_SIZE}}

COMMON=(--model "$MODEL_SIZE" --model_version "$MODEL_VERSION" --model_path "$CKPT"
        --ind_dataset "$DATA_DIR/owod.yaml" --owod_task_ind t1 --ind_split train
        --ood_datasets "$DATA_DIR/owod.yaml" "$DATA_DIR/coco_ood.yaml" "$DATA_DIR/coco_mixed.yaml"
        --ood_split val --owod_task_ood t1
        --conf_thr_train 0.15 --conf_thr_test 0.15 --tpr_thr 0.95
        --which_split train_val --ind_info_creation_option valid_preds_one_stride)

run() { python -m ood_in_object_detection_tpu.cli.ood_eval "${COMMON[@]}" "$@"; }

echo "[$(date '+%F %T')] RQ1: distance methods x cluster strategies"
first=1
for method in L1_cl_stride L2_cl_stride Cosine_cl_stride; do
  for cluster in one KMeans KMeans_10 HDBSCAN; do
    extra=()
    [ $first -eq 0 ] && extra=(--load_ind_activations)
    first=0
    run --benchmark conf_thr_test --ood_method "$method" --cluster_method "$cluster" \
        "${extra[@]}" --name "${TAG}_${method}_${cluster}"
  done
done

echo "[$(date '+%F %T')] RQ1b: SDR (supervised dimensionality reduction) variants"
for method in L1Ivis L2Ivis CosineIvis; do
  run --benchmark conf_thr_test --ood_method "$method" --cluster_method one \
      --load_ind_activations --name "${TAG}_${method}"
done

echo "[$(date '+%F %T')] RQ2: logits methods"
for method in NoMethod MSP Energy ODIN Sigmoid; do
  run --benchmark conf_thr_test --ood_method "$method" --cluster_method one \
      --name "${TAG}_${method}"
done

echo "[$(date '+%F %T')] RQ3: fusion strategies"
run --benchmark fusion_strategies --ood_method fusion-MSP-Energy \
    --name "${TAG}_fusion"

echo "[$(date '+%F %T')] RQ4: enhanced unknown localization grid"
run --benchmark unk_loc_enhancement --ood_method L1_cl_stride \
    --enhanced_unk_localization --load_ind_activations --name "${TAG}_eul"

echo "[$(date '+%F %T')] done: results under results/"

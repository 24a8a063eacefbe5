#!/usr/bin/env bash
# From-scratch OWOD task-1 training for every model version (reference
# replicate/train.sh recipes: YOLO{v8,v9,v10,11,12}-l, 300 epochs).
set -euo pipefail
DATA_DIR=${DATA_DIR:-datasets}
for VER in yolov8 yolov9 yolov10 yolo11 yolo12; do
  SIZE=l; [ "$VER" = yolov9 ] && SIZE=c
  python -m ood_in_object_detection_tpu.cli.train \
    --model "$SIZE" --model_version "$VER" \
    --dataset "$DATA_DIR/owod.yaml" --owod_task t1 \
    --epochs 300 --batch_size 16 --img_size 640 --dtype bfloat16 \
    --val_every 10 --name "owod_t1_${VER}${SIZE}_from_scratch"
done

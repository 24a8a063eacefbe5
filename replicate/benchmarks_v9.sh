#!/usr/bin/env bash
# Paper benchmark sweeps for yolov9m OWOD-t1
# (reference replicate/benchmarks_v9.sh: same RQ blocks over the yolov9 ckpt).
MODEL_VERSION=yolov9 MODEL_SIZE=m
source "$(dirname "$0")/benchmarks_common.sh"

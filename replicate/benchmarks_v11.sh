#!/usr/bin/env bash
# Paper benchmark sweeps for yolo11l OWOD-t1
# (reference replicate/benchmarks_v11.sh: same RQ blocks over the yolo11 ckpt).
MODEL_VERSION=yolo11 MODEL_SIZE=l
source "$(dirname "$0")/benchmarks_common.sh"

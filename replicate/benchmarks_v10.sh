#!/usr/bin/env bash
# Paper benchmark sweeps for yolov10l OWOD-t1
# (reference replicate/benchmarks_v10.sh: same RQ blocks over the yolov10 ckpt).
MODEL_VERSION=yolov10 MODEL_SIZE=l
source "$(dirname "$0")/benchmarks_common.sh"

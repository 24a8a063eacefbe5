#!/usr/bin/env bash
# Paper benchmark sweeps for yolo12l OWOD-t1
# (reference replicate/benchmarks_v12.sh: same RQ blocks over the yolo12 ckpt).
MODEL_VERSION=yolo12 MODEL_SIZE=l
source "$(dirname "$0")/benchmarks_common.sh"

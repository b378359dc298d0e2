#!/usr/bin/env bash
# Launch HVPR training (referenced by the upstream README but absent from its
# snapshot). On TPU all local chips are used automatically via the data mesh;
# extra arguments are forwarded to tools/train.py.
set -euo pipefail
cd "$(dirname "$0")/.."
python train.py --cfg_file cfgs/kitti_models/hvpr.yaml "$@"

#!/usr/bin/env bash
# Evaluate HVPR checkpoints (watches the ckpt dir with --eval_all).
set -euo pipefail
cd "$(dirname "$0")/.."
python test.py --cfg_file cfgs/kitti_models/hvpr.yaml --eval_all "$@"

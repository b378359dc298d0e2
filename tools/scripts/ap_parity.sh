#!/usr/bin/env bash
# AP-parity runbook (VERDICT r3 next-round item 9): the moment real KITTI
# data is mounted, this one command validates the end-to-end parity gate —
# Car moderate 3D AP (R40, IoU 0.7) within 0.3 of the PyTorch reference
# checkpoint evaluated on the same val split.
#
# Steps: data-layout check -> create_kitti_infos (if missing) -> torch .pth
# checkpoint import (tools/test.py loads .pth directly via
# hvpr_tpu/utils/torch_ckpt.py) -> val sweep -> AP diff vs the gate.
#
# Usage:
#   tools/scripts/ap_parity.sh --ckpt /path/to/hvpr_reference.pth \
#       [--data /path/to/kitti] [--ref_ap 77.9] [--tol 0.3] [--batch_size N]
#   tools/scripts/ap_parity.sh --dry_run   # synthetic-fixture rehearsal (no data/ckpt needed)
#
# --ref_ap: the reference checkpoint's own Car moderate 3D AP R40 on val
# (obtain by running the reference repo's tools/test.py with the same ckpt).
# Without it the script prints our AP and exits 0 (no gate applied).
set -euo pipefail

REPO="$(cd "$(dirname "$0")/../.." && pwd)"
CKPT="" DATA="$REPO/data/kitti" REF_AP="" TOL="0.3" BATCH="8" DRY_RUN=0
while [[ $# -gt 0 ]]; do
  case "$1" in
    --ckpt) CKPT="$2"; shift 2;;
    --data) DATA="$2"; shift 2;;
    --ref_ap) REF_AP="$2"; shift 2;;
    --tol) TOL="$2"; shift 2;;
    --batch_size) BATCH="$2"; shift 2;;
    --dry_run) DRY_RUN=1; shift;;
    *) echo "unknown arg: $1" >&2; exit 2;;
  esac
done

export PYTHONPATH="$REPO:${PYTHONPATH:-}"

if [[ "$DRY_RUN" == 1 ]]; then
  # Rehearsal on the synthetic KITTI fixture with the mini config: exercises
  # layout check, info creation, eval CLI, and AP parsing + gating with a
  # self-consistent ref_ap (gate must PASS at tol vs our own measured AP).
  WORK="$(mktemp -d)"
  trap 'rm -rf "$WORK"' EXIT
  echo "[ap_parity --dry_run] building synthetic fixture in $WORK"
  DATA="$WORK/kitti"
  python - "$DATA" <<'EOF'
import os, sys
from pathlib import Path
repo = Path(os.environ['PYTHONPATH'].split(':')[0])
sys.path.insert(0, str(repo))
sys.path.insert(0, str(repo / 'tests'))
import jax; jax.config.update('jax_platforms', 'cpu')
from kitti_fixture import build_kitti_root
build_kitti_root(Path(sys.argv[1]), n_scenes=6, with_infos=False)
EOF
  CFG="cfgs/kitti_models/hvpr_mini.yaml"
  BATCH=2
else
  CFG="cfgs/kitti_models/hvpr.yaml"
  [[ -n "$CKPT" ]] || { echo "ERROR: --ckpt <reference.pth> required (or --dry_run)" >&2; exit 2; }
  [[ -f "$CKPT" ]] || { echo "ERROR: checkpoint not found: $CKPT" >&2; exit 2; }
fi

echo "[ap_parity] 1/4 data layout check: $DATA"
fail=0
for d in training/velodyne training/calib training/label_2 ImageSets; do
  [[ -e "$DATA/$d" ]] || { echo "  MISSING: $DATA/$d" >&2; fail=1; }
done
for f in ImageSets/train.txt ImageSets/val.txt; do
  [[ -f "$DATA/$f" ]] || { echo "  MISSING: $DATA/$f" >&2; fail=1; }
done
[[ "$fail" == 0 ]] || { echo "ERROR: KITTI layout incomplete under $DATA" >&2; exit 1; }
echo "  ok ($(wc -l < "$DATA/ImageSets/val.txt") val scans)"

echo "[ap_parity] 2/4 infos"
if [[ ! -f "$DATA/kitti_infos_val.pkl" ]]; then
  python - "$CFG" "$DATA" <<'EOF'
import sys, os
from pathlib import Path
repo = Path(os.environ['PYTHONPATH'].split(':')[0])
sys.path.insert(0, str(repo))
import jax; jax.config.update('jax_platforms', 'cpu')
from hvpr_tpu.config import ConfigDict, cfg_from_yaml_file
from hvpr_tpu.datasets.kitti.kitti_dataset import create_kitti_infos
cfg = ConfigDict(); cfg_from_yaml_file(str(repo / 'tools' / sys.argv[1]), cfg)
data = Path(sys.argv[2])
create_kitti_infos(cfg['DATA_CONFIG'], cfg['CLASS_NAMES'], data, data)
EOF
else
  echo "  kitti_infos_val.pkl present, skipping"
fi

echo "[ap_parity] 3/4 val sweep"
TAG="ap_parity_$(date +%Y%m%d_%H%M%S)"
cd "$REPO/tools"
if [[ "$DRY_RUN" == 1 ]]; then
  # fresh random weights — the rehearsal checks the pipeline, not the AP
  HVPR_ROOT_DIR="$WORK" python test.py --cfg_file "$CFG" --batch_size "$BATCH" \
      --workers 0 --extra_tag "$TAG" \
      --set DATA_CONFIG.DATA_PATH "$DATA"
  OUT_ROOT="$WORK/output"
else
  python test.py --cfg_file "$CFG" --batch_size "$BATCH" --workers 4 \
      --extra_tag "$TAG" --ckpt "$CKPT" \
      --set DATA_CONFIG.DATA_PATH "$DATA"
  OUT_ROOT="${HVPR_ROOT_DIR:-$REPO}/output"
fi

echo "[ap_parity] 4/4 AP gate"
LOG="$(ls -t "$OUT_ROOT"/kitti_models/*/"$TAG"/eval/*/*/*/log_eval_*.txt 2>/dev/null | head -1 || true)"
[[ -z "$LOG" ]] && LOG="$(find "$OUT_ROOT" -name 'log_eval_*.txt' -path "*$TAG*" | head -1)"
[[ -n "$LOG" ]] || { echo "ERROR: no eval log found under $OUT_ROOT" >&2; exit 1; }
python - "$LOG" "${REF_AP:-}" "$TOL" "$DRY_RUN" <<'EOF'
import re, sys
log, ref_ap, tol, dry = sys.argv[1], sys.argv[2], float(sys.argv[3]), sys.argv[4] == '1'
text = open(log).read()
# Car moderate 3D AP R40 @ IoU 0.7: the "3d AP:" line inside the first
# "Car AP_R40@0.70, 0.70, 0.70" block; moderate is the 2nd of 3 values.
m = re.search(r'Car AP_R40@0\.70, 0\.70, 0\.70:\n(?:.*\n)*?3d\s+AP:([\d.]+), ([\d.]+), ([\d.]+)', text)
if m is None:
    sys.exit(f'ERROR: no Car AP_R40@0.70 3d block in {log}')
easy, mod, hard = map(float, m.groups())
print(f'ours: Car 3D AP R40 easy/mod/hard = {easy:.4f} / {mod:.4f} / {hard:.4f}')
if dry and not ref_ap:
    ref_ap = str(mod)   # self-consistent gate: rehearses the comparison path
if not ref_ap:
    print('no --ref_ap given: gate not applied (report-only run)')
    sys.exit(0)
diff = abs(mod - float(ref_ap))
verdict = 'PASS' if diff <= tol else 'FAIL'
print(f'gate: |ours {mod:.4f} - ref {float(ref_ap):.4f}| = {diff:.4f} '
      f'{"<=" if diff <= tol else ">"} {tol} -> {verdict}')
sys.exit(0 if diff <= tol else 1)
EOF

#!/bin/bash
# Staged X30 DTC training — the protocol the reference implies but never
# commits (x30_dtc_config.py:176-178 carries commented resume-from-
# rough_X30 lines; from-scratch x30_dtc verifiably does not take off:
# harsh DTC penalties + torso termination trap a flailing 50 kg robot in
# a terminate-fast attractor).  See PARITY.md "Known deviations".
#
# Stage 1: x30_rough — soft-tracking positives, only_positive_rewards,
#          53-dim DTC obs layout (so weights transfer); walks by ~800 it.
# Stage 2: x30_dtc --resume from the rough run: params+optimizer transfer,
#          env state starts fresh (cross-task tree mismatch handled in
#          runner.load).
#
# Usage: scripts/train_x30_staged.sh [LOG_ROOT] [ROUGH_ITERS] [DTC_ITERS]
# DTC_TASK=x30_dtc_descent switches stage 2 to the descent-clamp variant
# (round-5 intervention for the stairs_down/rough_slope failure frontier;
# same obs/reward semantics, so checkpoints transfer both ways).
set -euo pipefail
cd "$(dirname "$0")/.."

LOG_ROOT="${1:-logs}"
ROUGH_ITERS="${2:-4000}"
DTC_ITERS="${3:-30000}"
NUM_ENVS="${NUM_ENVS:-4096}"
DTC_TASK="${DTC_TASK:-x30_dtc}"

echo "=== stage 1: x30_rough ${ROUGH_ITERS} iters ==="
python scripts/train.py --task x30_rough --num_envs "$NUM_ENVS" \
    --max_iterations "$ROUGH_ITERS" --log_root "$LOG_ROOT"

ROUGH_RUN=$(ls -1t "$LOG_ROOT/rough_X30/" | head -1)
echo "=== stage 1 run: $ROUGH_RUN ==="

mkdir -p "$LOG_ROOT/x30_dtc"
ln -sfn "$(cd "$LOG_ROOT/rough_X30/$ROUGH_RUN" && pwd)" \
    "$LOG_ROOT/x30_dtc/$ROUGH_RUN"

echo "=== stage 2: $DTC_TASK ${DTC_ITERS} iters (resume from rough) ==="
python scripts/train.py --task "$DTC_TASK" --num_envs "$NUM_ENVS" \
    --max_iterations "$DTC_ITERS" --log_root "$LOG_ROOT" \
    --resume --load_run "$ROUGH_RUN"

#!/bin/bash
# Round-5 phase A: evidence items (one TPU process at a time).
set -u
cd "$(dirname "$0")/.."
echo "=== [A1] EnvMove05 headline pooled eval (README evidence) ==="
for s in 7 101; do
  timeout 1800 python tools/eval_policy.py \
    models/EnvMove05-v1_PPO_r4/best_model.npz --env EnvMove05-v1 \
    --episodes 256 --seed $s 2>&1
done | tee runs/move_r5_pooled.log
echo "=== [A2] teacher2 (net2net 256-wide) best checkpoint pooled eval ==="
for s in 101 202; do
  timeout 3600 python tools/eval_policy.py \
    models/Env03-v2_teacher2/best_model.npz --env Env03-v2 \
    --episodes 512 --seed $s 2>&1
done | tee runs/teacher2_r5_pooled.log
echo "=== phase A done ==="

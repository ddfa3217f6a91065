#!/bin/bash
# Round-5 phase C: the last unmeasured algorithm cells (A2C/TD3/DDPG) —
# chip_queue_r5.sh items [1]-[3], run as a chained phase.
set -u
cd "$(dirname "$0")/.."
echo "=== [C1] A2C probe (SB3 defaults: n_steps 5, plain PG) ==="
timeout 2400 python -m balance_robot_tpu.cli -a A2C train -e Env01-v2 \
  --num-envs 1024 --gamma 0.999 --max-wall 1800 --eval-freq 500000 --seed 0 \
  2>&1 | tee runs/a2c_env01v2_r5.log | tail -25
timeout 1200 python tools/eval_policy.py models/Env01-v2_A2C/best_model.npz \
  --env Env01-v2 --episodes 256 --seed 7 2>&1 | tee runs/a2c_r5_eval.log

echo "=== [C2] TD3 probe ==="
timeout 2400 python tools/train_offpolicy.py TD3 Env01-v2 --envs 64 \
  --grad-steps 8 --batch 256 --learning-starts 10000 \
  --max-steps 6000000 --max-wall 1800 --gamma 0.999 \
  --eval-freq 100000 --eval-episodes 16 --seed 0 \
  --run-name Env01-v2_TD3 2>&1 | tee runs/td3_env01v2_r5.log | tail -25
timeout 1200 python tools/eval_policy.py models/Env01-v2_TD3/best_model.npz \
  --env Env01-v2 --episodes 256 --seed 7 2>&1 | tee runs/td3_r5_eval.log

echo "=== [C3] DDPG probe (reference nets [300,200]/[200,150], sigma=0.1) ==="
timeout 2400 python tools/train_offpolicy.py DDPG Env01-v2 --envs 64 \
  --grad-steps 8 --batch 256 --learning-starts 10000 \
  --max-steps 6000000 --max-wall 1800 --gamma 0.999 \
  --eval-freq 100000 --eval-episodes 16 --seed 0 \
  --run-name Env01-v2_DDPG 2>&1 | tee runs/ddpg_env01v2_r5.log | tail -25
timeout 1200 python tools/eval_policy.py models/Env01-v2_DDPG/best_model.npz \
  --env Env01-v2 --episodes 256 --seed 7 2>&1 | tee runs/ddpg_r5_eval.log
echo "=== phase C done ==="

#!/bin/bash
# Round-2 chip queue: waits for the resumed Env03-v2_pallas training
# (PID $1) to exit, then runs, in order: the 256-episode checkpoint sweeps
# (the small training-time eval is too noisy to pick the best policy), the
# pallas-vs-XLA drift probe (calibrates the bench-time bound), and the
# EnvMove05-v1 outer-policy training + eval.  One TPU process at a time.
set -u
PID=${1:?usage: chip_queue_r2.sh PID}
while kill -0 "$PID" 2>/dev/null; do sleep 60; done
sleep 90   # let the chip settle after the worker releases

echo "=== Env03-v2_pallas checkpoint sweep (256 episodes) ==="
timeout 5400 python tools/sweep_checkpoints.py models/Env03-v2_pallas \
  --env Env03-v2 --episodes 256 --every 2 --out runs/sweep_pallas.json

echo "=== Env03-v2_r2a checkpoint sweep ==="
timeout 2700 python tools/sweep_checkpoints.py models/Env03-v2_r2a \
  --env Env03-v2 --episodes 256 --every 4 --out runs/sweep_r2a.json

echo "=== pallas drift probe ==="
timeout 1800 python tools/check_pallas_drift.py --env Env03-v2 --steps 5
timeout 1800 python tools/check_pallas_drift.py --env Env01-v2 --steps 5

echo "=== EnvMove05-v1 outer policy ==="
timeout 4800 python tools/train_run.py EnvMove05-v1 \
  --envs 1024 --steps 32 --mb 1024 \
  --gamma 0.999 --eval-freq 2000000 --eval-episodes 16 \
  --max-steps 500000000 --max-wall 3900 \
  --run-name EnvMove05-v1_PPO --solver fast --physics pallas

echo "=== EnvMove05 eval ==="
for m in models/EnvMove05-v1_PPO/best_model.npz \
         models/EnvMove05-v1_PPO/longest_model.npz; do
  [ -f "$m" ] || continue
  echo "== $m"
  timeout 1800 python tools/eval_policy.py "$m" --env EnvMove05-v1 \
    --episodes 256
done
echo "=== queue done ==="

#!/bin/bash
# Round-2 chip queue: waits for the Env03-v2_r2a training (PID $1) to exit,
# then runs, in order: 256-episode candidate evals, the pallas-vs-XLA drift
# probe (to calibrate the bench-time bound), and the EnvMove05-v1
# outer-policy training + eval.  One TPU process at a time.
set -u
PID=${1:?usage: chip_queue_r2.sh PID}
while kill -0 "$PID" 2>/dev/null; do sleep 60; done
sleep 90   # let the chip settle after the worker releases

echo "=== Env03-v2_r2a candidate eval (256 episodes) ==="
for m in models/Env03-v2_r2a/best_model.npz \
         models/Env03-v2_r2a/longest_model.npz \
         models/Env03-v2_r2a/final_model.npz; do
  [ -f "$m" ] || continue
  echo "== $m"
  timeout 1800 python tools/eval_policy.py "$m" --env Env03-v2 --episodes 256
done

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

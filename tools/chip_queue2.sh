#!/bin/bash
# Chip work queue: waits for the running Env03-v2_pallas training (PID $1)
# to exit, then evaluates its candidates and refines the Env01-v2 flagship
# with the production recipe (gamma 0.999 + warm start — the earlier refine
# attempt ran the default gamma 0.99 and collapsed into the reward exploit;
# see README "A note on gamma").
set -u
PID=${1:?usage: chip_queue2.sh PID}
while kill -0 "$PID" 2>/dev/null; do sleep 30; done
sleep 60   # let the chip settle after the worker releases

echo "=== Env03-v2_pallas candidate eval ==="
for m in models/Env03-v2_pallas/best_model.npz \
         models/Env03-v2_pallas/longest_model.npz \
         models/Env03-v2_pallas/final_model.npz; do
  [ -f "$m" ] || continue
  echo "== $m"
  timeout 1200 python tools/eval_policy.py "$m" --env Env03-v2 --episodes 256
done

echo "=== stage-1 flagship refinement (gamma 0.999) ==="
timeout 3000 python tools/train_run.py Env01-v2 \
  --init models/Env01-v2_PPO/best_model.npz \
  --gamma 0.999 --lr 1e-4 --envs 1024 --steps 32 --mb 1024 \
  --eval-freq 2000000 --eval-episodes 16 \
  --max-steps 300000000 --max-wall 2700 \
  --run-name Env01-v2_refine2 --solver fast --physics pallas

echo "=== refined flagship eval ==="
for m in models/Env01-v2_refine2/best_model.npz \
         models/Env01-v2_refine2/longest_model.npz; do
  [ -f "$m" ] || continue
  echo "== $m"
  timeout 2000 python tools/eval_policy.py "$m" --env Env01-v2 --episodes 256
done
echo "=== queue done ==="

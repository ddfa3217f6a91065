#!/bin/bash
# Round-5 phase B: closed-loop oracle reconciliation (verdict task 1c).
# The open-loop CEM said 99% of fatal launches are population-recoverable;
# the r4 closed-loop expert recovered 13-19% at pop 64 / iters 2.  Escalate
# the closed-loop search ~6x at the same replan cadence: if recoverability
# is budget-bound it should move toward the oracle; if it saturates ~30%,
# the realistic per-launch ceiling caps pooled full-horizon near ~93% and
# the >=95% bar must be re-targeted with this measurement.
set -u
cd "$(dirname "$0")/.."
echo "=== [B1] closed-loop MPC oracle probe, escalated budget ==="
timeout 5400 python tools/mpc_dagger.py \
  models/Env03-v2_PPO/best_model.npz --env Env03-v2 \
  --episodes 1024 --max-fatal 64 --pop 256 --iters 3 \
  --plan-h 25 --exec-k 4 --tail-h 60 --replay-steps 148 \
  --seed 0 --dump runs/dagger_mpc_r5.npz 2>&1 | tee runs/mpc_oracle_r5.log
echo "=== phase B done ==="
